"""Shuffle/write codec + scan-split A/B (VERDICT r4 #8): the full typed
replay (decode -> LWW MERGE -> bucketed parquet write) under alternative
spark confs, interleaved in fresh taskset-pinned JVMs so same-day box
drift hits every variant equally (BENCH/run_scaling.py methodology;
min-of-N per variant is the quotable number).

Variants:
- base            : session defaults (io=zstd shuffle, parquet=snappy)
- io_lz4          : spark.io.compression.codec=lz4
- shuffle_nocomp  : spark.shuffle.compress=false (tmpfs shuffle — bytes
                    are RAM writes; compression is pure CPU)
- parquet_zstd    : spark.sql.parquet.compression.codec=zstd
- split_32m       : spark.sql.files.maxPartitionBytes=32m

Usage: python BENCH/codec_ab.py [--events N] [--cpus N] [--runs N]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from run_scaling import CHILD, PREP  # noqa: E402  (same child runner)

VARIANTS: dict[str, dict[str, str]] = {
    "base": {},
    "io_lz4": {"spark.io.compression.codec": "lz4"},
    "shuffle_nocomp": {"spark.shuffle.compress": "false"},
    "parquet_zstd": {"spark.sql.parquet.compression.codec": "zstd"},
    "split_32m": {"spark.sql.files.maxPartitionBytes": "33554432"},
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=3_200_000)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()
    base = tempfile.mkdtemp(prefix="codec_ab_", dir="/dev/shm")
    land = os.path.join(base, "landing")
    prep = subprocess.run(
        [sys.executable, "-c", PREP.format(repo=REPO), land, str(args.events), "typed"],
        capture_output=True, text=True, timeout=1800,
    )
    if "PREP_DONE" not in prep.stdout:
        raise RuntimeError(prep.stderr[-3000:])
    times: dict[str, list[float]] = {v: [] for v in VARIANTS}
    for r in range(args.runs):
        for name, conf in VARIANTS.items():
            env = dict(
                os.environ,
                SPARK_GRAFT_CPUS=str(args.cpus),
                BINGO_SPARK_CONF=json.dumps(conf),
            )
            out = subprocess.run(
                ["taskset", "-c", f"0-{args.cpus - 1}", sys.executable, "-c",
                 CHILD.format(repo=REPO), str(args.cpus), land,
                 str(args.events), "typed"],
                capture_output=True, text=True, timeout=1800, env=env,
            )
            secs = None
            for line in reversed(out.stdout.strip().splitlines()):
                if line.strip().startswith("{"):
                    secs = json.loads(line)["secs"]
                    break
            if secs is None:
                raise RuntimeError(f"{name} failed:\n{out.stderr[-3000:]}")
            times[name].append(secs)
            print(json.dumps({"run": r, "variant": name, "secs": secs}), flush=True)
    summary = {
        name: {"min": min(v), "all": v, "vs_base": None} for name, v in times.items()
    }
    for name in summary:
        summary[name]["vs_base"] = round(
            summary[name]["min"] / summary["base"]["min"], 3
        )
    print("SUMMARY " + json.dumps(summary), flush=True)
    import shutil

    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
