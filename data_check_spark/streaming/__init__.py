from data_check_spark.streaming.checks import (  # noqa: F401
    stream_pages,
    streaming_stat_verdicts,
    streaming_dedup,
)
