import json, os, sys, tempfile, time, shutil
sys.path.insert(0, "/root/repo")
from bingo2sql_spark.session import get_spark
from bingo2sql_spark.sources.decode import decode_events_typed
from bingo2sql_spark.operators.apply import IcebergLiteTable
from bingo2sql_spark.pipeline import replay

cores, raw_dir = int(sys.argv[1]), sys.argv[2]
tmp = tempfile.mkdtemp(prefix=f"probe{cores}_", dir="/dev/shm")
spark = get_spark(f"probe-{cores}", master=f"local[{cores}]", shuffle_partitions=cores,
                  extra_conf={"spark.local.dir": tmp + "/spark-local"})
raw = spark.read.parquet(raw_dir)
KEYS = ["repo", "path"]
# warmup (small)
warm = IcebergLiteTable(tmp + "/warm", n_buckets=8)
replay(decode_events_typed(raw.filter("seq % 50 = 0"), before_fields=KEYS), warm, batch_id="w", tables=["repo_files"])

phases = {}
t0 = time.time()
n = decode_events_typed(raw, before_fields=KEYS).count()
phases["decode_count"] = round(time.time() - t0, 2)

# election aggregate alone
from bingo2sql_spark.operators import resolve as R
from bingo2sql_spark.operators.apply import bucket_col, _election_winners
import pyspark.sql.functions as F
ev = decode_events_typed(raw, before_fields=KEYS)
rows = R.to_upsert_rows(R.with_key(ev)).withColumn("bucket", bucket_col(64)).withColumnRenamed("_seq", "_ingest_seq")
t0 = time.time()
win = _election_winners(rows)
wn = win.count()
phases["election_agg_count"] = round(time.time() - t0, 2)

# broadcast semi-join + merge agg, NO write (count only)
t0 = time.time()
filt = rows.join(F.broadcast(_election_winners(rows)), rows["_ingest_seq"] == F.col("_win_seq"), "left_semi")
m = filt.repartition(32, "bucket").groupBy("bucket", *KEYS).agg(F.max("_ingest_seq")).count()
phases["elect_bcast_merge_count"] = round(time.time() - t0, 2)

# full replay (write + commit included)
t = IcebergLiteTable(tmp + "/tgt", n_buckets=64, merge_strategy="election")
t0 = time.time()
replay(decode_events_typed(raw, before_fields=KEYS), t, batch_id="b", tables=["repo_files"])
phases["full_replay"] = round(time.time() - t0, 2)
phases["write_commit_delta"] = round(phases["full_replay"] - phases["elect_bcast_merge_count"], 2)
print(json.dumps({"cores": cores, "rows": n, "winners": wn, **phases}))
shutil.rmtree(tmp, ignore_errors=True)
