"""SparkSession factory with scale-appropriate defaults.

Tuned for the extraction hot path: Arrow transport on, modest
records-per-batch (pages can be MBs — byte-capping happens inside the
kernel stage too), AQE for runtime coalescing/skew handling.  On a real
cluster the same code ships via ``spark-submit --py-files
<package.zip>`` (see tools/package_pyfiles.py).
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import SparkSession

DEFAULT_CONFS = {
    # local mode: the driver JVM hosts all executor threads — the 1g
    # default heap GC-thrashes at 32 threads (measured 4x slowdown).
    "spark.driver.memory": "48g",
    "spark.driver.maxResultSize": "4g",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Pages can be large; keep Arrow batches modest so a batch of giant
    # documents fits executor memory (byte-capped again in-kernel).
    "spark.sql.execution.arrow.maxRecordsPerBatch": "1024",
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.parquet.compression.codec": "zstd",
    "spark.ui.enabled": "false",
    "spark.driver.host": "127.0.0.1",
    "spark.ui.showConsoleProgress": "false",
}


def get_spark(
    app_name: str = "simple-html-parser-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict | None = None,
) -> SparkSession:
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = _parallelism_of(master) or 32

    # ensure executor python workers can import this package regardless
    # of the driver's cwd (workers inherit the driver's PYTHONPATH env)
    pkg_root = str(Path(__file__).resolve().parents[2])
    if pkg_root not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + os.pathsep + os.environ["PYTHONPATH"]
            if os.environ.get("PYTHONPATH") else pkg_root)

    builder = SparkSession.builder.appName(app_name).master(master)
    confs = dict(DEFAULT_CONFS)
    confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def _parallelism_of(master: str) -> int | None:
    if master.startswith("local["):
        inner = master[6:-1]
        if inner == "*":
            return os.cpu_count()
        try:
            return int(inner)
        except ValueError:
            return None
    return None
