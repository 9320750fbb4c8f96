"""SparkSession factory tuned for the local[32] harness.

At cluster scale the same flags apply; only master/memory change. AQE is
the load-bearing setting: it coalesces post-shuffle partitions, re-plans
joins to broadcast at runtime, and splits skewed partitions — all of
which matter far more at 100 TB than on the test scale factors.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "etl-dag-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle_partitions = shuffle_partitions or 2 * int(cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # scan split size: 128 MB keeps a full parquet split + its
        # decompressed batch well inside an executor core's memory share
        # at cluster scale; AQE coalesces the small-file end of the range
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # stderr is the one channel a real regression surfaces in —
        # keep carriage-return progress bars out of it
        .config("spark.ui.showConsoleProgress", "false")
    )
    return builder.getOrCreate()


def quiet_benign_logs(spark: SparkSession) -> None:
    """Silence the known-benign ``DAGScheduler: Failed to update
    accumulator … attempted to access non-existent accumulator`` ERROR
    class: a Spark artifact of ``unpersist()``/``localCheckpoint()``
    teardown racing straggler task completion (the accumulator is
    deregistered while a finished task's update is still in flight).
    It is cosmetic — the task already succeeded — but it pollutes
    err.log, the channel a real regression would surface in.

    Implementation: attach a Log4j2 ``StringMatchFilter`` scoped to the
    exact message class (DENY on match, NEUTRAL otherwise) to a
    dedicated DAGScheduler ``LoggerConfig`` — NOT a blanket level
    change, so the scheduler's real ERROR/WARN output (stage failures,
    barrier/executor-loss diagnostics) still reaches stderr, and so do
    all other loggers. The config is additive: non-matching events
    flow to the root appenders unchanged. Call from bench / driver-sim
    style harnesses; interactive sessions can keep it."""
    jvm = spark.sparkContext._jvm
    name = "org.apache.spark.scheduler.DAGScheduler"
    result = jvm.org.apache.logging.log4j.core.Filter.Result
    b = jvm.org.apache.logging.log4j.core.filter.StringMatchFilter.newBuilder()
    b.setMatchString("Failed to update accumulator")
    b.setOnMatch(result.DENY)
    b.setOnMismatch(result.NEUTRAL)
    filt = b.build()
    filt.start()
    ctx = jvm.org.apache.logging.log4j.core.LoggerContext.getContext(False)
    cfg = ctx.getConfiguration()
    lc = cfg.getLoggerConfig(name)
    if lc.getName() != name:
        # events currently route through an ancestor config (root):
        # create a dedicated additive config so the filter touches only
        # this logger's events
        lc = jvm.org.apache.logging.log4j.core.config.LoggerConfig(
            name, lc.getLevel(), True
        )
        cfg.addLogger(name, lc)
    lc.addFilter(filt)
    ctx.updateLoggers()
