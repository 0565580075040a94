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
    # Shuffle/spill on tmpfs, NOT the VM's virtual disk.  The sandbox
    # disk sustains ~25 MB/s fsync writes; a long session pushes tens
    # of GB of shuffle data through the page cache, background
    # writeback falls behind, and once the dirty-page ratio trips,
    # EVERY write blocks at disk speed — measured as episodic 5-10x
    # windows (curate_web 6s → 110s; 1-task jobs with 14s scheduler
    # gaps and 2s GC inflation) that a pure-CPU host control cannot
    # see.  Real executors shuffle to local NVMe; tmpfs is the honest
    # stand-in here (128 GiB RAM, sf0.1 shuffles are a few GB).
    "spark.local.dir": "/dev/shm/spark-local",
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

    confs = dict(DEFAULT_CONFS)
    if extra_confs:
        confs.update(extra_confs)
    # tmpfs local dir: ensure the root exists and purge leaked subdirs
    # from crashed sessions (clean shutdowns remove their own; kill -9
    # leaks RAM-backed files that would otherwise live until reboot)
    local_dir = confs.get("spark.local.dir")
    if local_dir and local_dir.startswith("/dev/shm"):
        try:
            confs["spark.local.dir"] = _prepare_tmpfs_local_dir(local_dir)
        except OSError:
            confs.pop("spark.local.dir")  # fall back to /tmp

    builder = SparkSession.builder.appName(app_name).master(master)
    confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    for k, v in confs.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def _prepare_tmpfs_local_dir(root: str) -> str:
    """Per-PID tmpfs local dir: each driver gets `root/pid-<pid>`, and
    startup purges sibling `pid-*` dirs whose owning process is DEAD
    (kill -9 leaks RAM-backed shuffle files until reboot).  Liveness,
    not mtime, decides — a long-lived concurrent session with a stale
    blockmgr mtime keeps its live shuffle dirs.  Pre-PID-scheme leaked
    dirs (no pid- prefix) still fall back to a 6h mtime purge."""
    import shutil
    import time

    os.makedirs(root, exist_ok=True)
    cutoff = time.time() - 6 * 3600
    for entry in os.scandir(root):
        if not entry.is_dir():
            continue
        try:
            if entry.name.startswith("pid-"):
                pid = int(entry.name[4:])
                if pid != os.getpid() and not _pid_alive(pid):
                    shutil.rmtree(entry.path, ignore_errors=True)
            elif entry.stat().st_mtime < cutoff:
                shutil.rmtree(entry.path, ignore_errors=True)
        except (OSError, ValueError):
            continue
    mine = os.path.join(root, f"pid-{os.getpid()}")
    os.makedirs(mine, exist_ok=True)
    return mine


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else — leave it


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
