"""SparkSession factory with the engine's standard configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "ocr_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build the session.

    Defaults: AQE on (runtime re-plan / skew-join safety net on top of our
    explicit salting), Arrow transfer on with bounded batches (fat text
    payloads — cap records per batch so executor Python workers never hold
    more than ~a few MB of payload at once), UTC session timezone
    (timestamp parity with the oracle regardless of host zone).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("OCR_SPARK_SHUFFLE_PARTITIONS", "32"))
    return (
        SparkSession.builder.appName(app)
        .master(master)
        # local mode: executors live in the driver JVM; the 1g default
        # throttles 32 concurrent parquet writers (effective at JVM launch
        # only — a no-op if a JVM already exists).
        .config("spark.driver.memory", os.environ.get("OCR_SPARK_DRIVER_MEM", "16g"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # ~8k rows × ~0.5 KB payload ≈ 4 MB per Arrow batch: big enough to
        # amortize the per-batch pandas/IPC overhead, small enough that a
        # Python worker never holds more than a few batches of fat text.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", _local_dir())
        .getOrCreate()
    )


def _local_dir() -> str:
    """Shuffle/spill dir. A node-local fast device is standard practice on
    real clusters (NVMe); in the sandbox /dev/shm plays that role — the
    default /tmp disk serializes shuffle I/O across 32 executor threads."""
    if os.environ.get("OCR_SPARK_LOCAL_DIR"):
        return os.environ["OCR_SPARK_LOCAL_DIR"]
    if os.path.isdir("/dev/shm"):
        d = "/dev/shm/ocr-spark-local"
        os.makedirs(d, exist_ok=True)
        return d
    return "/tmp"
