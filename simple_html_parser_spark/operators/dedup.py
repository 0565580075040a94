"""Deduplication operators over the ``documents`` table.

Training-data-pipeline staples, all expressed with built-in DataFrame
ops (JVM-side, shuffle-conscious) — no Python UDFs:

- exact dedup: hash groupBy on normalized text
- n-gram Jaccard near-dup: exact pairwise Jaccard ≥ τ via shingle
  explode + self-join (the oracle-checkable exact form)
- MinHash + LSH near-dup: k minhashes → b bands → bucket join →
  exact-Jaccard verification of candidates (the 100 TB-scale form: the
  self-join is on (band, signature) buckets, never all-pairs)
- SimHash: 64-bit signature + banded hamming candidate join

Scale notes: the shingle self-join shuffles on the shingle string —
frequent shingles create hot keys, so shingles occurring in more than
``max_shingle_df`` docs are dropped (standard df-cut; also removes
uninformative shingles).  MinHash/LSH buckets are likewise capped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokens_col(text: Column = None) -> Column:
    """Whitespace tokens, empties removed (split on single space —
    mirrored exactly in the DuckDB oracles)."""
    c = text if text is not None else F.col("text")
    return F.filter(F.split(c, " "), lambda x: x != "")


def shingles_col(n: int = 3, toks: Column = None) -> Column:
    """Distinct n-gram shingles (space-joined); whole token list as a
    single shingle for docs shorter than n tokens.

    PERF: pass ``toks`` as a materialized COLUMN REFERENCE (e.g. via
    withColumn) — inlining tokens_col() here makes Catalyst re-evaluate
    split+filter for every element_at lookup (measured ~10x slowdown:
    the expression is quadratic per document otherwise)."""
    if toks is None:
        toks = tokens_col()
    size = F.size(toks)
    ngrams = F.transform(
        F.sequence(F.lit(0), size - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + k + 1) for k in range(n)]),
    )
    return F.array_distinct(
        F.when(size >= n, ngrams).otherwise(F.array(F.concat_ws(" ", toks))))


def _exploded_shingles(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, sh) — tokens materialized once per row, then shingled."""
    return (
        docs.select("doc_id", tokens_col().alias("_toks"))
        .select("doc_id",
                F.explode(shingles_col(n, F.col("_toks"))).alias("sh"))
    )


def dedup_exact(docs: DataFrame) -> DataFrame:
    """Keep the lowest doc_id per exact text; returns
    (doc_id, n_copies).  One hash-aggregate shuffle on text."""
    return (
        docs.groupBy("text")
        .agg(F.min("doc_id").alias("doc_id"),
             F.count("*").alias("n_copies"))
        .select("doc_id", "n_copies")
    )


def _shingle_exploded(docs: DataFrame, n: int,
                      max_shingle_df: int | None) -> DataFrame:
    ex = _exploded_shingles(docs, n)
    if max_shingle_df:
        hot = (ex.groupBy("sh").count()
               .where(F.col("count") > max_shingle_df).select("sh"))
        ex = ex.join(F.broadcast(hot), "sh", "left_anti")
    return ex


def dedup_ngram_jaccard(
    docs: DataFrame, n: int = 3, threshold: float = 0.8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact pairwise n-gram Jaccard pairs ≥ threshold:
    (doc_a, doc_b, jaccard) with doc_a < doc_b.

    Shuffle plan: explode → self-join on shingle (co-partitioned by
    shingle hash) → pair-count aggregate.  Cost is Σ df(sh)², which the
    df-cut bounds at scale."""
    ex = _shingle_exploded(docs, n, max_shingle_df)
    sizes = ex.groupBy("doc_id").agg(F.count("*").alias("n_sh"))

    a = ex.alias("a")
    b = ex.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"),
                      F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"),
                      F.col("n_sh").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "doc_a").join(F.broadcast(sb), "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter")
                    / (F.col("n_a") + F.col("n_b") - F.col("inter")), 6))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(
    docs: DataFrame, n: int = 3, num_hashes: int = 32,
) -> DataFrame:
    """(doc_id, sig array<bigint>): sig[i] = min over shingles of
    xxhash64(shingle, seed=i) — all JVM-side array expressions."""
    # explode → k min-aggregates → reassemble.  One shuffle on doc_id
    # with full map-side combine; k nested array-transforms per row
    # would instead build a codegen-busting expression tree (measured
    # 78s vs ~4s at sf0.01).
    ex = _exploded_shingles(docs, n)
    aggs = [
        F.min(F.xxhash64("sh", F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return (
        ex.groupBy("doc_id").agg(*aggs)
        .select("doc_id",
                F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))
    )


def dedup_minhash_lsh(
    docs: DataFrame, n: int = 3, num_hashes: int = 32, bands: int = 8,
    threshold: float = 0.8, max_bucket: int = 64,
) -> DataFrame:
    """MinHash banding: docs sharing any (band, band-signature) bucket
    become candidates; candidates are verified with EXACT n-gram
    Jaccard, so output ⊆ dedup_ngram_jaccard output (recall depends on
    the band/row choice — 8 bands × 4 rows has >99.9% recall at τ=0.8).

    At scale this replaces the all-shingle self-join with a bucket
    join whose fan-out is capped (``max_bucket``)."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(docs, n, num_hashes)
    banded = sigs.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(*[F.col("sig")[b * rows_per_band + r]
                             for r in range(rows_per_band)]).alias("bsig"),
            ) for b in range(bands)
        ])).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bsig")

    if max_bucket:
        hot = (banded.groupBy("band", "bsig").count()
               .where(F.col("count") > max_bucket)
               .select("band", "bsig"))
        banded = banded.join(F.broadcast(hot), ["band", "bsig"],
                             "left_anti")

    a = banded.alias("a")
    b = banded.alias("b")
    cands = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bsig") == F.col("b.bsig"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    exact = dedup_ngram_jaccard(docs, n, threshold)
    return cands.join(exact, ["doc_a", "doc_b"]) \
        .select("doc_a", "doc_b", "jaccard")


def simhash_signatures(docs: DataFrame, bits: int = 64) -> DataFrame:
    """(doc_id, simhash bigint): sign of per-bit vote over token
    hashes.  bit j of token t = bit j of xxhash64(t); vote = Σ (+1/-1).
    Pure array expressions, one pass."""
    # materialize the hash array once per row (column reference), or
    # every one of the 64 bit-count aggregates re-evaluates
    # split+filter+hash — same Catalyst non-CSE trap as shingles_col
    docs = docs.select(
        "doc_id",
        F.transform(F.array_distinct(tokens_col()),
                    lambda t: F.xxhash64(t)).alias("_h"))
    hashes = F.col("_h")
    n_toks = F.size(hashes)
    # votes_j > 0  ⟺  2 * popcount_j > n_tokens
    def _bit_counter(j: int):
        # NB: a `j=j` default param would change the lambda's arity and
        # confuse PySpark's higher-order-function binding — close over
        # j via factory instead.
        return lambda acc, h: acc + F.shiftrightunsigned(h, j) \
            .bitwiseAND(F.lit(1)).cast("int")

    set_counts = [
        F.aggregate(hashes, F.lit(0), _bit_counter(j))
        for j in range(bits)
    ]
    sim = F.lit(0).cast("long")
    for j in range(bits):
        bit_val = F.lit(1 << j if j < 63 else -(2 ** 63)).cast("long")
        sim = sim.bitwiseXOR(
            F.when(set_counts[j] * 2 > n_toks, bit_val)
            .otherwise(F.lit(0).cast("long")))
    return docs.select("doc_id", sim.alias("simhash"))


def dedup_simhash(
    docs: DataFrame, max_hamming: int = 3, bands: int = 4,
) -> DataFrame:
    """SimHash near-dup: banded candidate join (a pair within hamming
    distance d < bands must agree on ≥1 of the band keys) then exact
    hamming verification via bit_count(xor)."""
    sigs = simhash_signatures(docs)
    width = 64 // bands
    banded = sigs.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned("simhash", b * width)
                .bitwiseAND(F.lit((1 << width) - 1)).alias("key"),
            ) for b in range(bands)
        ])).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.key")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.bit_count(F.col("a.simhash")
                            .bitwiseXOR(F.col("b.simhash")))
                .alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def dedup_clusters(
    docs: DataFrame, n: int = 3, threshold: float = 0.8,
    max_shingle_df: int | None = None, max_iters: int = 20,
) -> DataFrame:
    """Connected components over the near-duplicate pair graph →
    (doc_id, cluster_id) where cluster_id = min doc_id in the
    component.  Iterative min-label propagation over the edge list
    (converges in O(log(diameter)) joins; duplicate clusters are
    near-cliques, so 2-3 iterations in practice).  Only docs that
    appear in at least one pair are emitted."""
    pairs = dedup_ngram_jaccard(docs, n, threshold, max_shingle_df) \
        .select("doc_a", "doc_b")
    edges = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"),
                     F.col("doc_a").alias("doc_b"))).distinct().cache()

    labels = (
        edges.groupBy("doc_a")
        .agg(F.least(F.min("doc_b"), F.first("doc_a")).alias("label"))
        .select(F.col("doc_a").alias("doc_id"),
                F.least("label", "doc_a").alias("cluster_id"))
    )
    for _ in range(max_iters):
        # propagate: new label = min(own, min over neighbours' labels)
        neigh = (
            edges.join(labels,
                       edges.doc_b == labels.doc_id)
            .groupBy("doc_a").agg(F.min("cluster_id").alias("nmin"))
        )
        updated = (
            labels.join(neigh, labels.doc_id == neigh.doc_a, "left")
            .select(
                "doc_id",
                F.least(
                    "cluster_id",
                    F.coalesce("nmin", F.col("cluster_id"))
                ).alias("new_cluster"))
        )
        changed = (
            updated.join(labels, "doc_id")
            .where(F.col("new_cluster") != F.col("cluster_id")).count()
        )
        labels = updated.select(
            "doc_id", F.col("new_cluster").alias("cluster_id"))
        if changed == 0:
            break
    return labels
