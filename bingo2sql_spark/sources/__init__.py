from bingo2sql_spark.sources.binlog_binary import (  # noqa: F401
    BinlogWriter,
    binlog_raw_events,
    parse_binlog_bytes,
)
from bingo2sql_spark.sources.repl_client import (  # noqa: F401
    ReplicationClient,
    tail_to_landing,
)
from bingo2sql_spark.sources.synth import generate_events, to_raw  # noqa: F401
