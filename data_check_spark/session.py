"""SparkSession factory with scale-appropriate defaults.

The defaults below are the knobs that matter on a real multi-executor
cluster (AQE, skew-join handling, Arrow for pandas UDFs) and are safe
on local[N] where the tests run.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "data-check-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    master defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default all
    cores) in the sandbox; on a cluster the caller passes nothing and
    spark-submit supplies the master.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("DCS_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing of shuffle partitions + skew-join splits.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow transfer for pandas UDFs / toPandas at the report edge.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Broadcast threshold: dimension snapshots below this go broadcast.
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("DCS_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()


def run_with_timeout(spark: SparkSession, action, timeout_sec: float = 900.0):
    """Run a DataFrame action under a watchdog; cancel the job group
    and raise TimeoutError when it exceeds ``timeout_sec``.

    Reference parity: the BigQuery client runs each query in a thread
    and cancels the job after TIMEOUT_BIGQUERY=900 s
    (``/root/reference/data_check/query/query_bq.py:15,40-54``). The
    Spark analog is a job group + cancelJobGroup — no result-fetch
    thread needed, the cancellation interrupts the running stages.
    """
    import threading
    import uuid

    group = f"dcs-timeout-{uuid.uuid4().hex[:8]}"
    result: list = []
    error: list = []

    def target() -> None:
        spark.sparkContext.setJobGroup(group, "data-check timed action", True)
        try:
            result.append(action())
        except Exception as e:  # noqa: BLE001
            error.append(e)
        # job-group association is thread-local and the thread ends here

    t = threading.Thread(target=target, daemon=True)
    t.start()
    t.join(timeout_sec)
    if t.is_alive():
        spark.sparkContext.cancelJobGroup(group)

        def keep_cancelling() -> None:
            # the Python thread cannot be killed, and a multi-job
            # action resumes after the first cancel and submits its
            # NEXT job outside the cancelled set — re-cancel until the
            # thread actually exits so a timed-out action cannot keep
            # consuming the cluster behind the caller's back
            while t.is_alive():
                t.join(5.0)
                if t.is_alive():
                    spark.sparkContext.cancelJobGroup(group)

        threading.Thread(target=keep_cancelling, daemon=True).start()
        raise TimeoutError(f"action exceeded {timeout_sec}s; job group {group} cancelled")
    if error:
        raise error[0]
    return result[0]
