"""Scaling-efficiency evidence for the north rule.

The rule demands throughput scaling efficiency >= 0.8 between N and 4N
executors. No real cluster exists in this sandbox, so per the sandbox
protocol (BASELINE.md) we run the IDENTICAL headline replay job on the
same input at two parallelism levels — local[8] and local[32] — in
fresh JVMs, and report events/sec at both plus
efficiency = (T_32 / T_8) / 4.

Usage: python BENCH/run_scaling.py [--events N] [--out BENCH/BASELINE.md]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, tempfile, time, shutil
sys.path.insert(0, {repo!r})
from bingo2sql_spark.session import get_spark
from bingo2sql_spark.sources.synth import generate_events, to_raw
from bingo2sql_spark.sources.decode import decode_events
from bingo2sql_spark.operators.apply import IcebergLiteTable
from bingo2sql_spark.pipeline import replay

cores = int(sys.argv[1]); n_events = int(sys.argv[2]); runs = int(sys.argv[3])
spark = get_spark(f"scaling-{{cores}}", master=f"local[{{cores}}]", shuffle_partitions=cores)
tmp = tempfile.mkdtemp(prefix=f"scale{{cores}}_")
n_keys = max(1000, n_events // 8)
ev = generate_events(spark, n_keys=n_keys, versions_per_key=8,
                     n_repos=max(50, n_keys // 200))
# land RAW wire events (JSON row images): the timed job includes the
# decode stage, like a real binlog ingest
to_raw(ev).write.mode("overwrite").parquet(tmp + "/raw")
raw = spark.read.parquet(tmp + "/raw")
warm = IcebergLiteTable(tmp + "/warm", n_buckets=8)
replay(decode_events(raw.filter("seq % 50 = 0")), warm, batch_id="w", tables=["repo_files"])
times = []
for i in range(runs):
    t = IcebergLiteTable(tmp + f"/tgt{{i}}", n_buckets=64)
    t0 = time.time()
    replay(decode_events(raw), t, batch_id="b", tables=["repo_files"])
    times.append(time.time() - t0)
times.sort()
med = times[len(times) // 2]
print(json.dumps({{"cores": cores, "events": n_events, "runs": runs,
                   "median_secs": round(med, 3), "all_secs": [round(x,3) for x in times],
                   "events_per_sec": round(n_events / med, 1)}}))
shutil.rmtree(tmp, ignore_errors=True)
"""


def run_child(cores: int, n_events: int, runs: int) -> dict:
    """Fresh JVM pinned to `cores` CPUs with taskset — a local[8] JVM
    otherwise still uses all machine cores for GC/compression threads,
    which would flatter the small-'cluster' run and understate scaling."""
    script = CHILD.format(repo=REPO)
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", script,
         str(cores), str(n_events), str(runs)],
        capture_output=True, text=True, timeout=3000,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"child failed (cores={cores}):\n{out.stderr[-3000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=800_000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "BASELINE.md"))
    args = ap.parse_args()

    r8 = run_child(8, args.events, args.runs)
    r32 = run_child(32, args.events, args.runs)
    eff = (r32["events_per_sec"] / r8["events_per_sec"]) / 4.0

    md = f"""# BENCH/BASELINE — scaling-efficiency evidence (N vs 4N)

North rule criterion: CDC replay throughput scaling efficiency >= 0.8
between N and 4N executors. Sandbox protocol (no real cluster): the
IDENTICAL job — raw wire events (JSON row images) from parquet ->
decode -> filters -> LWW resolve -> Iceberg-lite MERGE — on the same
input, in fresh JVMs at local[8] vs local[32], each JVM PINNED to that
many CPUs with taskset (otherwise the local[8] JVM still uses all 32
hardware threads for GC/compression, flattering the small run). Median
of {args.runs} timed runs after a JVM/codegen warmup replay (the
reference's methodology: medians over repeated /usr/bin/time runs,
docs/test.md). The machine must be otherwise idle.

Generated {datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")} by `python BENCH/run_scaling.py --events {args.events}`.

| parallelism | events | median wall (s) | events/sec |
|---|---|---|---|
| local[8]  (N)  | {r8["events"]:,}  | {r8["median_secs"]}  | {r8["events_per_sec"]:,} |
| local[32] (4N) | {r32["events"]:,} | {r32["median_secs"]} | {r32["events_per_sec"]:,} |

- speedup (4N vs N): **{r32["events_per_sec"] / r8["events_per_sec"]:.2f}x**
- scaling efficiency = speedup / 4 = **{eff:.2f}** (criterion: >= 0.8)
- all runs local[8]: {r8["all_secs"]} s; local[32]: {r32["all_secs"]} s

Reference single-node baseline (BASELINE.md): ~1.45e5 change-rows/s.
This engine at local[32]: {r32["events_per_sec"]:,} events/s on the
same-scale workload (full envelope decode + LWW + MERGE, not just SQL
text generation).

Caveats: local mode shares one JVM/driver; shuffle is in-process, so
absolute numbers flatter the real network-shuffle case, but the N-vs-4N
*ratio* is the honest scaling signal the sandbox can produce. The only
wide exchanges in the job are the LWW groupBy (map-side combinable
max_by) and the bucket-clustered write — both scale with input size,
not with table size, which is what makes the design hold at 10^10
events / 1000 executors.
"""
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write(md)
    print(json.dumps({"local8": r8, "local32": r32, "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
