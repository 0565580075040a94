"""Measured giant-page skew experiment (SCALE.md evidence).

Models the crawl-segment-of-giant-pages layout the north rule's
"salted repartitioning on url-hash" exists for: 2000 normal pages
(~12 KB) spread over 8 input partitions, plus 16 giant pages (~2 MB,
~170x normal) all landing in ONE partition (a union preserves child
partitioning, exactly like reading a size-sorted file layout).  The
same extraction then runs

  (a) unsalted — partitions follow the input layout, so one task owns
      every giant page and the stage wall is that single task;
  (b) salted   — ``extract_documents(salt_partitions=N)`` repartitions
      on xxhash64(url) first, spreading the giants across tasks.

Prints one JSON line with both walls.  Interleaves A/B measurements
(3 rounds, min per arm) so a host-noise window cannot masquerade as a
salting win.

    python3 tools/skew_experiment.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from pyspark.sql import functions as F  # noqa: E402

from simple_html_parser_spark.operators.extraction import (  # noqa: E402
    extract_documents,
)
from simple_html_parser_spark.runtime.session import get_spark  # noqa: E402
from simple_html_parser_spark.sources.documents import (  # noqa: E402
    render_html_heavy,
)

CORES = 8
N_NORMAL, N_GIANT = 2000, 6
GIANT_PARAS = 48000  # ~16 MB pages, ~1400x a normal page


def build(spark):
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    normal = render_html_heavy(
        base.limit(N_NORMAL).repartition(8), paras=35)
    giants = render_html_heavy(
        base.limit(N_GIANT)
        .withColumn("doc_id", F.col("doc_id") + 1_000_000)
        .coalesce(1),
        paras=GIANT_PARAS)
    # union preserves child partitioning: partitions 0-7 normal,
    # partition 8 = ALL the giants (the skewed file layout)
    return normal.unionByName(giants)


def wall(docs, salt) -> float:
    t0 = time.perf_counter()
    n = extract_documents(docs, salt_partitions=salt) \
        .agg(F.count("*"), F.sum(F.length("extracted_text"))).collect()
    assert n[0][0] == N_NORMAL + N_GIANT
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    import shutil
    import tempfile

    spark = get_spark("skew", master=f"local[{CORES}]",
                      shuffle_partitions=4 * CORES)
    # materialize to parquet first — production reads html FROM the
    # table, so the measured arms must not include the synthetic
    # render (which would otherwise skew identically in both arms and
    # mute the contrast).  The write preserves the partition layout:
    # the giants land in one ~64 MB file = one input split.
    tmp = tempfile.mkdtemp(prefix="skew_corpus_")
    build(spark).write.mode("overwrite").parquet(tmp)
    docs = spark.read.parquet(tmp)
    wall(docs, None)  # warm JIT/codegen/python pool on the SAME plan
    unsalted, salted = [], []
    for _ in range(3):
        unsalted.append(wall(docs, None))
        salted.append(wall(docs, 4 * CORES))
    out = {
        "layout": f"{N_NORMAL} normal (~12KB) over 8 partitions + "
                  f"{N_GIANT} giants (~16MB) in ONE partition",
        "cores": CORES,
        "unsalted_wall_s": min(unsalted),
        "salted_wall_s": min(salted),
        "unsalted_runs": unsalted,
        "salted_runs": salted,
        "speedup": round(min(unsalted) / min(salted), 2),
    }
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
