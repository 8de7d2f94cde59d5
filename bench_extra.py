"""Per-query measurement harness for optimization work (guide §1).

bench.py is FROZEN for the driver's measurement; this file is the
builder-side instrument: it times individual declared queries with the
same methodology as bench.py's per-query loop (`.count()`, min-of-N,
same session factory), can isolate computation with the noop sink
(guide §1.4), and can dump `.explain("formatted")` for any query into
plans/r09/.

Usage:
  python bench_extra.py --sf-dir /dev/shm/sf1.0 \
      --queries dedup_simhash_pairs,curate_corpus_neardup \
      [--repeats 2] [--noop] [--plans-out plans/r09 --plan-suffix before] \
      [--json-out /tmp/qtimes.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bingo2sql_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default=None, help="comma list; default all")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--noop", action="store_true",
                    help="time a noop-sink write (all columns) instead of count()")
    ap.add_argument("--plans-out", default=None, help="dir for explain('formatted') dumps")
    ap.add_argument("--plan-suffix", default="before")
    ap.add_argument("--json-out", default=None)
    a = ap.parse_args()

    local_dir = tempfile.mkdtemp(prefix="bx_local_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
    spark = get_spark("bench_extra", extra_conf={"spark.local.dir": local_dir})

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    wanted = a.queries.split(",") if a.queries else sorted(qs)
    times: dict[str, float] = {}
    for name in wanted:
        fn = qs[name]
        if a.plans_out:
            os.makedirs(a.plans_out, exist_ok=True)
            df = fn(spark, a.sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(os.path.join(a.plans_out, f"{name}_{a.plan_suffix}.txt"), "w") as f:
                f.write(plan)
        best = None
        for i in range(a.repeats):
            spark.sparkContext.setJobDescription(f"{name} [{i}]")
            t0 = time.time()
            df = fn(spark, a.sf_dir)
            if a.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            one = time.time() - t0
            best = one if best is None else min(best, one)
            spark.sparkContext.setJobDescription(None)
        times[name] = round(best, 3)
        print(f"{name}: {best:.3f}s", flush=True)
    total = round(sum(times.values()), 3)
    print(json.dumps({"sf_dir": a.sf_dir, "noop": a.noop, "total": total, "queries": times}))
    if a.json_out:
        with open(a.json_out, "w") as f:
            json.dump({"sf_dir": a.sf_dir, "noop": a.noop, "total": total, "queries": times}, f, indent=1)


if __name__ == "__main__":
    main()
