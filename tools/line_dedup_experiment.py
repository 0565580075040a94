"""Measure dedup_lines' winner-election strategy on a duplication-heavy
corpus: hash-aggregate min(struct) + join-back (the shipped shape) vs
the naive row_number window over segments.

    python3 tools/line_dedup_experiment.py [replicas=8] [sf_dir]
        [--boilerplate]

``--boilerplate`` (any position) prepends the same 8 tokens to every
doc, making its first segment one global hot key (df = corpus size) —
the SCALE.md recorded run is ``32 /root/testdata/sf0.1 --boilerplate``.

The replicated corpus models a crawl where every page was re-fetched
``replicas`` times: every segment's df multiplies, which is exactly the
hot-key regime the window's per-key sort dies on at scale.  Results go
to stdout; SCALE.md records a representative run.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from pyspark.sql import functions as F  # noqa: E402

from simple_html_parser_spark.operators.dedup import (  # noqa: E402
    dedup_lines, segments_col, tokens_col,
)
from simple_html_parser_spark.runtime.session import get_spark  # noqa: E402
from simple_html_parser_spark.sources.documents import (  # noqa: E402
    load_table,
)


def window_line_dedup(docs, seg_len: int = 8):
    """The naive formulation: row_number window over (seg) — one sort
    group per distinct segment, hot segments sort in ONE task."""
    from pyspark.sql import Window

    segs = (
        docs.select("doc_id", tokens_col().alias("_toks"))
        .select("doc_id",
                F.posexplode(segments_col(seg_len, F.col("_toks")))
                .alias("seg_idx", "seg"))
    )
    keep = segs.withColumn(
        "_rn", F.row_number().over(
            Window.partitionBy("seg").orderBy("doc_id", "seg_idx")))
    return (
        keep.groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.when(
                        F.col("_rn") == 1,
                        F.struct("seg_idx", "seg")))),
                    lambda s: s.seg)).alias("kept_text"),
            F.count("*").alias("n_segments"),
            F.sum((F.col("_rn") == 1).cast("bigint")).alias("n_kept"))
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--boilerplate"]
    boiler = "--boilerplate" in sys.argv[1:]
    replicas = int(args[0]) if args else 8
    sf = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("linededup-exp", master="local[8]",
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, sf, "documents").select("doc_id", "text")
    if boiler:
        # every doc STARTS with the same 8 tokens, so its first
        # fixed-width segment is one global hot key (df = corpus size)
        # — the site-chrome segment that makes the window's per-key
        # sort a one-task straggler at crawl scale
        base = base.select(
            "doc_id",
            F.concat(F.lit(
                "home about contact privacy terms sitemap rss login "
            ), F.col("text")).alias("text"))
    rep = base
    for i in range(1, replicas):
        rep = rep.unionByName(base.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
            "text"))
    rep = rep.localCheckpoint()  # freeze input; measure only dedup
    n = rep.count()

    def best(fn, trials=3):
        times = []
        for _ in range(trials):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn().count()
            times.append(round(time.perf_counter() - t0, 2))
        return min(times), times

    agg_t, agg_all = best(lambda: dedup_lines(rep))
    win_t, win_all = best(lambda: window_line_dedup(rep))
    # same outputs?
    a = dedup_lines(rep).agg(
        F.sum("n_kept"), F.sum("n_segments")).collect()[0]
    w = window_line_dedup(rep).agg(
        F.sum("n_kept"), F.sum("n_segments")).collect()[0]
    print(f"corpus: {n} docs ({replicas}x replicated {sf})")
    print(f"agg+join (shipped): {agg_t}s  {agg_all}")
    print(f"window (naive):     {win_t}s  {win_all}")
    print(f"identical totals: {tuple(a) == tuple(w)} "
          f"(kept={a[0]}, segments={a[1]})")
    print(f"speedup: {win_t / agg_t:.2f}x")


if __name__ == "__main__":
    main()
