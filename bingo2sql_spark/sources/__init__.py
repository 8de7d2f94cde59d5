from bingo2sql_spark.sources.synth import generate_events, to_raw  # noqa: F401
