"""End-to-end training-data curation: the composition every LLM data
pipeline runs, expressed as one declarative DataFrame plan so Catalyst
sees the whole thing (filter pushdown + shared scans):

    documents
      → language agreement  (lang_id prediction == declared lang)
      → quality floor       (integer quality_bp ≥ cutoff)
      → exact dedup         (keep min doc_id per text)
      → near-dup dedup      (keep each LSH cluster's min doc_id)
      → curated set

Every stage is one of the already-oracled operators; the composed
output is itself oracle-checked (the DuckDB side composes the same
CTEs).  At 10^12 docs the joins are: one hash-agg on text (or
fingerprint), the LSH candidate pipeline, and anti-joins against the
loser sets.  Loser-set size is corpus-dependent (a duplication-heavy
crawl makes it corpus-proportional), so broadcast decisions are left
to AQE rather than forced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import dedup_clusters, dedup_exact
from .textstats import lang_id, quality_score


def curate(
    docs: DataFrame,
    quality_min_bp: int = 5500,
    near_dup_threshold: float = 0.30,
) -> DataFrame:
    """(doc_id, pred_lang, quality_bp) for documents surviving all four
    filters."""
    quality = quality_score(docs).select("doc_id", "quality_bp")
    lang = lang_id(docs).select("doc_id", "pred_lang")
    base = (
        docs.select("doc_id", "lang")
        .join(lang, "doc_id")
        .join(quality, "doc_id")
        .where((F.col("pred_lang") == F.col("lang"))
               & (F.col("quality_bp") >= quality_min_bp))
    )
    exact_keep = dedup_exact(docs).select("doc_id")
    # near-dup losers: cluster members that are not the representative.
    # The "auto" df-cut is explicit (dedup defaults are None): see
    # dedup.shingle_drop_stats for the observability counterpart.
    clusters = dedup_clusters(docs, threshold=near_dup_threshold,
                              max_shingle_df="auto")
    near_losers = clusters.where(
        F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    # NO forced broadcast on near_losers: on a duplication-heavy crawl
    # the loser set is corpus-proportional (7/8 of docs in SCALE.md's
    # crossover corpus), so a mandatory BroadcastExchange would collect
    # it to the driver and OOM at 10^12 docs.  Left to AQE, which
    # broadcasts only when the measured size is under the threshold.
    return (
        base.join(exact_keep, "doc_id", "left_semi")
        .join(near_losers, "doc_id", "left_anti")
        .select("doc_id", "pred_lang", "quality_bp")
    )


def curate_web(
    docs: DataFrame,
    quality_min_bp: int = 5500,
    oov_max_bp: int = 600,
    near_dup_threshold: float = 0.30,
) -> DataFrame:
    """The full web-crawl curation flow as ONE declarative plan:

        documents
          → PII scrub          (emails/IPs/phones → placeholders)
          → language agreement (prediction == declared lang)
          → quality floor      (quality_bp ≥ cutoff)
          → OOV ceiling        (oov_bp ≤ cutoff vs the corpus head)
          → exact dedup        (keep min doc_id per scrubbed text)
          → near-dup dedup     (keep each LSH cluster's min doc_id)

    All downstream stages run on the SCRUBBED text (dedup must not be
    defeated by unique emails in otherwise-identical boilerplate —
    the reason real pipelines scrub before dedup).  Returns
    (doc_id, pred_lang, quality_bp, oov_bp).  Same broadcast/AQE
    discipline as ``curate``; the added stages are a codegen regexp
    pass (scrub) and one broadcast-head join (OOV)."""
    from .pii import scrub_col
    from .textstats import oov_stats

    # scrub is a pure projection — NOT a join against pii_scrub()
    # output (that would shuffle the corpus against itself once per
    # downstream branch); every stage below re-derives the scrubbed
    # text inside its own scan+project, all codegen
    docs2 = docs.select("doc_id", "lang",
                        scrub_col(F.col("text")).alias("text"))
    quality = quality_score(docs2).select("doc_id", "quality_bp")
    lang = lang_id(docs2).select("doc_id", "pred_lang")
    oov = oov_stats(docs2).select("doc_id", "oov_bp")
    base = (
        docs2.select("doc_id", "lang")
        .join(lang, "doc_id")
        .join(quality, "doc_id")
        .join(oov, "doc_id")
        .where((F.col("pred_lang") == F.col("lang"))
               & (F.col("quality_bp") >= quality_min_bp)
               & (F.col("oov_bp") <= oov_max_bp))
    )
    exact_keep = dedup_exact(docs2).select("doc_id")
    clusters = dedup_clusters(docs2, threshold=near_dup_threshold,
                              max_shingle_df="auto")
    near_losers = clusters.where(
        F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    return (
        base.join(exact_keep, "doc_id", "left_semi")
        .join(near_losers, "doc_id", "left_anti")
        .select("doc_id", "pred_lang", "quality_bp", "oov_bp")
    )
