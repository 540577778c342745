"""SparkSession factory.

One place to make sessions so every entry point (tests, bench, driver
contract) gets the same scale-minded defaults: AQE on (runtime re-plan +
skew-join splitting), Arrow on (vectorized pandas-UDF transfer), UTC
session timezone (stable vs the DuckDB oracle), and shuffle partitions
sized to the actual core count instead of the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "etl_framework_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env) or
    ``local[*]``; pass ``master="cluster"`` to leave the master to
    spark-submit (cluster deployments: ``spark-submit --py-files
    etl_framework_spark.zip scripts/ingest_job.py ...``). All confs
    below are cluster-safe.
    """
    # Driver memory MUST be set before the JVM exists — builder confs are
    # silently ignored for spark.driver.memory in an already-launched
    # local JVM (observed: 32 parquet writer threads thrashing a 1 GB
    # default heap made local[32] 2.6x SLOWER than local[8]).
    from pyspark import SparkContext

    if (
        SparkContext._active_spark_context is None
        and "PYSPARK_SUBMIT_ARGS" not in os.environ
    ):
        mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
        os.environ["PYSPARK_SUBMIT_ARGS"] = f"--driver-memory {mem} pyspark-shell"

    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"

    # Python workers (pandas UDFs / applyInPandas) import this package by
    # reference; make sure they can resolve it even when the driver
    # script runs from another directory. Local mode: workers inherit
    # the driver env, so extending PYTHONPATH suffices. Cluster mode:
    # ship the package with ``spark-submit --py-files`` instead.
    if master.startswith("local"):
        pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        parts = os.environ.get("PYTHONPATH", "").split(os.pathsep)
        if pkg_parent not in parts:
            os.environ["PYTHONPATH"] = os.pathsep.join(
                [pkg_parent] + [p for p in parts if p]
            )

    # Shuffle/spill dirs: a RAM-backed dir for LOCAL masters only (on a
    # real cluster spark.local.dir is the NVMe scratch ops configures —
    # /dev/shm is capped at ~half of RAM, so defaulting to it there would
    # fail any spill larger than that). Local virtio disks here are slow;
    # measured ~3x end-to-end on the CDC apply. Explicit opt-in anywhere
    # via SPARK_GRAFT_LOCAL_DIR. The size gate skips tiny tmpfs mounts.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and master.startswith("local"):
        try:
            import shutil

            if (
                os.path.isdir("/dev/shm")
                and os.access("/dev/shm", os.W_OK)
                and shutil.disk_usage("/dev/shm").total >= 8 << 30
            ):
                local_dir = "/dev/shm/spark_local"
        except OSError:
            pass
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )

    builder = SparkSession.builder.appName(app_name)
    if master != "cluster":
        builder = builder.master(master)
    builder = (
        builder
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # INT96 timestamps (Spark's legacy default) carry NO footer
        # min/max statistics, killing both parquet predicate pushdown
        # on ts and the lakehouse manifests' file-range skipping.
        # TIMESTAMP_MICROS is the standard annotated type every modern
        # reader (DuckDB, Arrow, Trino) understands.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # v2 commits rename task outputs task-side (parallel) instead of
        # sequentially on the driver at job commit — measurable on
        # many-partition dynamic writes; snapshot atomicity here comes
        # from the LakeTable manifest, not the FS committer.
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        # local mode: keep the UI off and the driver quiet. JVM logs go to
        # STDERR (see log4j2.properties) so stdout stays machine-readable
        # (bench.py prints exactly one JSON line there).
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", local_dir or "/tmp")
        .config(
            "spark.driver.extraJavaOptions",
            "-Dlog4j2.configurationFile=file:"
            + os.path.join(os.path.dirname(os.path.abspath(__file__)), "log4j2.properties"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
