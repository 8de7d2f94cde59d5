"""Shuffle-bytes A/B for the MERGE key-only winner election (VERDICT
r4 #1): run the same commits under merge_strategy=full vs election in a
FRESH JVM each (BENCH/run_scaling.py methodology) and report, per
strategy, the wall time and the total shuffle write/read bytes from
Spark's own stage metrics (UI REST API — enabled just for this tool).

Two scenarios per strategy:
- initial: one cow commit of the full event stream onto an empty table
  (heavy in-batch duplication — the replay shape; election is forced
  because auto has no pre-pass bound there).
- incremental: load half, measure ONLY the second commit (the
  steady-state CDC shape; auto's metadata bound applies).

Usage: python BENCH/shuffle_bytes.py [--events N] [--keys N] [--cpus N]
Prints one JSON line per (scenario, strategy) and a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

CHILD = """
import json, os, sys, time, urllib.request
sys.path.insert(0, {repo!r})
from bingo2sql_spark.session import get_spark
from bingo2sql_spark.sources.synth import generate_events, to_raw_typed
from bingo2sql_spark.sources.decode import decode_events_typed
from bingo2sql_spark.operators.apply import IcebergLiteTable
from bingo2sql_spark.pipeline import replay

scenario = {scenario!r}
strategy = {strategy!r}
spark = get_spark(
    "shuffle-ab", master="local[{cpus}]", shuffle_partitions={cpus},
    extra_conf={{"spark.ui.enabled": "true", "spark.local.dir": "/dev/shm/shuffle_ab_tmp"}},
)

def stage_totals():
    url = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{{url}}/api/v1/applications/{{app}}/stages?status=complete") as r:
        stages = json.load(r)
    w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    rd = sum(s.get("shuffleReadBytes", 0) for s in stages)
    return w, rd

n_events, n_keys = {events}, {keys}
versions = max(2, n_events // n_keys)
ev = generate_events(spark, n_keys=n_keys, versions_per_key=versions, n_repos=97, seed=7)
land = {land!r}
if not os.path.isdir(land):
    to_raw_typed(ev).write.mode("overwrite").parquet(land)
events = decode_events_typed(spark.read.parquet(land))

t = IcebergLiteTable({table!r}, n_buckets=64, merge_strategy=strategy)
cut = n_events // 2
if scenario == "initial":
    # warmup on a slice (codegen/JVM), then measure the full load
    warm = IcebergLiteTable({table!r} + "_warm", n_buckets=8, merge_strategy=strategy)
    replay(events.limit(20000), warm, batch_id="w")
    w0, r0 = stage_totals()
    t0 = time.time()
    replay(events, t, batch_id="full")
    wall = time.time() - t0
else:
    replay(events.filter(f"seq < {{cut}}"), t, batch_id="h1")  # warmup + base
    w0, r0 = stage_totals()
    t0 = time.time()
    m = replay(events.filter(f"seq >= {{cut}}"), t, batch_id="h2")
    wall = time.time() - t0
    assert m["merge_plan"] == ("election" if strategy == "election" else "full"), m
w1, r1 = stage_totals()
rows = t.read(spark).count()
print("RESULT " + json.dumps({{
    "scenario": scenario, "strategy": strategy, "wall_secs": round(wall, 3),
    "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
    "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
    "final_rows": rows,
}}))
"""


def run_child(repo, scenario, strategy, events, keys, cpus, land, table):
    code = CHILD.format(
        repo=repo, scenario=scenario, strategy=strategy, events=events,
        keys=keys, cpus=cpus, land=land, table=table,
    )
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", code]
    out = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=1800)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"child failed:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=3_200_000)
    ap.add_argument("--keys", type=int, default=400_000)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--runs", type=int, default=2, help="min-of-N fresh JVMs")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = tempfile.mkdtemp(prefix="shuffle_ab_", dir="/dev/shm")
    land = os.path.join(base, "landing")
    results = {}
    # interleave strategies so box drift hits both equally
    for r in range(args.runs):
        for scenario in ("initial", "incremental"):
            for strategy in ("full", "election"):
                table = os.path.join(base, f"t_{scenario}_{strategy}_{r}")
                res = run_child(
                    repo, scenario, strategy, args.events, args.keys,
                    args.cpus, land, table,
                )
                print(json.dumps(res), flush=True)
                key = (scenario, strategy)
                prev = results.get(key)
                if prev is None or res["wall_secs"] < prev["wall_secs"]:
                    results[key] = res
                import shutil

                shutil.rmtree(table, ignore_errors=True)
                shutil.rmtree(table + "_warm", ignore_errors=True)
    summary = {
        f"{sc}_{st}": {
            "wall_secs": v["wall_secs"],
            "shuffle_write_mb": v["shuffle_write_mb"],
        }
        for (sc, st), v in sorted(results.items())
    }
    for sc in ("initial", "incremental"):
        f, e = results.get((sc, "full")), results.get((sc, "election"))
        if f and e:
            summary[f"{sc}_write_ratio_election_vs_full"] = round(
                e["shuffle_write_mb"] / max(f["shuffle_write_mb"], 0.1), 3
            )
            assert e["final_rows"] == f["final_rows"], (sc, e, f)
    print("SUMMARY " + json.dumps(summary), flush=True)
    import shutil

    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
