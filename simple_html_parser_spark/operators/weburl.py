"""URL-level operators over the crawl fetch log.

The per-url layer every Common-Crawl-style pipeline runs BEFORE any
content work: parse/normalize urls, collapse refetches to the latest
capture, aggregate per site, and take deterministic hash-based samples
(the reproducible alternative to ``df.sample`` — the same url is always
in or out regardless of partitioning, executor count, or Spark
version).

All pure built-in expressions (whole-stage codegen; ``parse_url`` is
the JVM-side extractor).  Scale shapes:

- ``url_dedup_latest``: ONE hash-aggregate shuffle on url with
  map-side partial ``max_by`` — never a window (a row_number window
  would sort inside url groups and cannot partial-aggregate; at 10^12
  fetch records the agg form is the difference between a combine-then-
  shuffle of unique urls and a full-log sort).
- ``domain_stats``: same single-agg shape keyed on host; hosts are
  Zipf-skewed in real crawls, which partial aggregation absorbs (the
  hot host is pre-combined per map task before the exchange).
- ``domain_hash_sample``: a pure filter — no shuffle at all; sampling
  decisions depend only on md5(url), so resuming or re-running yields
  the identical sample (the property ``df.sample`` does not give).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def url_components(crawl: DataFrame) -> DataFrame:
    """(url, scheme, host, registered_domain, path, query) — one row
    per distinct url.  ``parse_url`` is the built-in JVM extractor;
    registered_domain is the last two dot-labels of the host (the
    public-suffix-list lookup is a broadcast-map refinement at prod)."""
    u = F.col("url")
    host = F.parse_url(u, F.lit("HOST"))
    return crawl.select("url").distinct().select(
        "url",
        F.parse_url(u, F.lit("PROTOCOL")).alias("scheme"),
        host.alias("host"),
        F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
        .alias("registered_domain"),
        F.parse_url(u, F.lit("PATH")).alias("path"),
        F.parse_url(u, F.lit("QUERY")).alias("query"),
    )


def url_dedup_latest(crawl: DataFrame) -> DataFrame:
    """Collapse refetches: one row per url carrying the LATEST capture
    (url, warc_ts, n_bytes, n_fetches).  The max_by ordering key folds
    fetch_seq in after the microsecond timestamp, so two captures
    sharing a timestamp still resolve deterministically (this module's
    determinism contract must not depend on the corpus being
    tie-free).  The key is a SCALAR bigint, not
    struct(warc_ts, fetch_seq): a struct ordering key cannot live in a
    hash-aggregation buffer and silently demotes the whole plan to
    SortAggregate — the plan audit pins HashAggregate.

    The fold reserves 12 bits for fetch_seq (micros*4096 + seq):
    4096 same-microsecond captures of one url is beyond any real
    fetcher, and the budget is ENFORCED with raise_error (mirroring
    dedup_lines' seg_idx guard) rather than silently wrapped —
    ADVICE r03.  micros*4096 stays under bigint max through 2041;
    ANSI mode turns any later overflow into a loud error, never a
    wrong winner."""
    seq = F.when(
        (F.col("fetch_seq") >= 0) & (F.col("fetch_seq") < F.lit(1 << 12)),
        F.col("fetch_seq").cast("bigint"),
    ).otherwise(F.raise_error(F.lit(
        "url_dedup_latest: fetch_seq outside [0, 4096) breaks the "
        "scalar ordering-key fold (a negative seq would collide with "
        "the previous microsecond's keys); widen the budget")))
    ord_key = F.unix_micros("warc_ts") * F.lit(4096).cast("bigint") + seq
    return (
        crawl.groupBy("url")
        .agg(F.max("warc_ts").alias("warc_ts"),
             F.max_by("n_bytes", ord_key).alias("n_bytes"),
             F.count("*").alias("n_fetches"))
    )


def domain_stats(crawl: DataFrame) -> DataFrame:
    """Per-host crawl aggregates:
    (host, n_urls, n_fetches, total_bytes, latest_ts)."""
    host = F.parse_url(F.col("url"), F.lit("HOST"))
    return (
        crawl.select(host.alias("host"), "url", "warc_ts", "n_bytes")
        .groupBy("host")
        .agg(F.count_distinct("url").alias("n_urls"),
             F.count("*").alias("n_fetches"),
             F.sum("n_bytes").alias("total_bytes"),
             F.max("warc_ts").alias("latest_ts"))
    )


def url_hash_bucket(col: Column, buckets: int = 10000) -> Column:
    """Deterministic bucket in [0, buckets): the first 6 hex chars of
    md5(url) as an integer, mod buckets.  md5 (not xxhash64) because it
    is bit-identical across engines and Spark versions — the sampling
    decision is part of the dataset contract, reproducible anywhere
    (the DuckDB oracle replays it digit-by-digit)."""
    return (F.conv(F.substring(F.md5(col), 1, 6), 16, 10)
            .cast("bigint") % buckets)


def domain_hash_sample(crawl: DataFrame, rate_bp: int = 2000) -> DataFrame:
    """Keep urls whose md5 bucket < rate_bp (of 10000): a deterministic
    ~rate_bp/10000 sample, stable under repartitioning and resume.
    Returns the surviving fetch-log rows."""
    return crawl.where(url_hash_bucket(F.col("url")) < F.lit(rate_bp))


def domain_quota(crawl: DataFrame, k: int = 10,
                 salt_buckets: int = 16) -> DataFrame:
    """Per-domain quota cap (the RefinedWeb/FineWeb "at most k pages
    per site" step): keep the k urls per host with the smallest
    (md5-bucket, url) key — a deterministic choice, like
    ``domain_hash_sample``, so reruns and resumes keep the same pages.
    Operates on distinct urls (refetches collapse first); returns
    (host, url, rank).

    Scale shape: top-k-per-key via SALTED two-phase selection, not one
    window over raw hosts — a viral host with 10^8 pages would
    otherwise sort its entire group in one task.  Phase 1 takes top-k
    within (host, salt) — bounding any single sort group to
    |host|/salt_buckets rows and spreading a hot host across
    ``salt_buckets`` tasks; phase 2 re-ranks the ≤ k·salt_buckets
    survivors per host.  Exact: every global top-k row is top-k within
    its own salt group.  The salt is derived from the url (xxhash64),
    so the result is still deterministic."""
    from pyspark.sql import Window

    ranked = (
        crawl.select("url").distinct()
        .select(
            "url",
            F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
            url_hash_bucket(F.col("url"), 1 << 30).alias("_rk"),
            F.pmod(F.xxhash64("url"), F.lit(salt_buckets)).alias("_salt"),
        )
    )
    phase1 = (
        ranked.withColumn(
            "_r1",
            F.row_number().over(
                Window.partitionBy("host", "_salt")
                .orderBy("_rk", "url")))
        .where(F.col("_r1") <= k)
    )
    return (
        phase1.withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("host").orderBy("_rk", "url"))
            .cast("bigint"))
        .where(F.col("rank") <= k)
        .select("host", "url", "rank")
    )


def blocklist_filter(crawl: DataFrame, rules: DataFrame) -> DataFrame:
    """Robots/blocklist filtering: drop fetches whose host matches a
    rule and whose path starts with the rule's ``path_prefix``
    (``"/"`` blocks the whole host) — the Disallow semantics of a
    compiled robots/domain blocklist.  ``rules(host, path_prefix)``.

    Scale shape: blocklists are human-curated (10^3-10^6 rows against
    a 10^12-row fetch log) → broadcast LEFT ANTI join, equi-keyed on
    host with the prefix test as the join residual; the log side
    stays a single codegen pass, no shuffle."""
    u = F.col("url")
    # parse_url PATH is '' for a bare-root url (https://host) — treat
    # it as '/', else a 'Disallow: /' whole-host rule leaks the root
    # page (ubiquitous in real fetch logs)
    raw_path = F.parse_url(u, F.lit("PATH"))
    c = (crawl
         .withColumn("_host", F.parse_url(u, F.lit("HOST")))
         .withColumn("_path", F.when(raw_path == "", "/")
                     .otherwise(raw_path)))
    r = rules.select(F.col("host").alias("_bh"),
                     F.col("path_prefix").alias("_bp"))
    return (
        c.join(F.broadcast(r),
               (F.col("_host") == F.col("_bh"))
               & F.col("_path").startswith(F.col("_bp")),
               "left_anti")
        .drop("_host", "_path")
    )


def domain_mix_sample(crawl: DataFrame, weights: DataFrame,
                      default_rate_bp: int = 10000) -> DataFrame:
    """Stratified corpus mixing: sample each host at its own rate
    (``weights(host, rate_bp)``; hosts absent from the table keep
    ``default_rate_bp``).  The up/down-weighting step a curated-mix
    pipeline runs after quality scoring — e.g. keep 100% of a curated
    domain but 5% of a boilerplate-heavy one.

    Deterministic like ``domain_hash_sample`` (same md5-bucket per
    url, so raising a host's rate strictly GROWS its sample — earlier
    picks never churn out).  Scale shape: the weights table is
    human-curated (small) → broadcast LEFT join + one codegen filter;
    the fetch log never shuffles."""
    u = F.col("url")
    c = crawl.withColumn("_host", F.parse_url(u, F.lit("HOST")))
    w = weights.select(F.col("host").alias("_wh"),
                       F.col("rate_bp").alias("_rate"))
    return (
        c.join(F.broadcast(w), F.col("_host") == F.col("_wh"), "left")
        .where(url_hash_bucket(u)
               < F.coalesce(F.col("_rate"),
                            F.lit(default_rate_bp).cast("bigint")))
        .drop("_host", "_wh", "_rate")
    )


def crawl_delta(old: DataFrame, new: DataFrame) -> DataFrame:
    """Crawl freshness report: compare two url-level snapshots (one
    row per url each, e.g. ``url_dedup_latest`` outputs) and count per
    host how many urls were added, removed, changed (byte count
    differs), or unchanged.  Returns (host, status, n).

    Scale shape: ONE full-outer shuffle join on url between the two
    snapshots, then a host/status hash-agg on the (small) categorized
    result.  At prod, write both snapshots bucketed by url-hash and
    the join becomes a co-located zero-shuffle merge; AQE handles the
    residual skew either way."""
    o = old.select("url", F.col("n_bytes").alias("_ob"))
    n = new.select("url", F.col("n_bytes").alias("_nb"))
    j = o.join(n, "url", "full_outer")
    status = (
        F.when(F.col("_ob").isNull(), "added")
        .when(F.col("_nb").isNull(), "removed")
        .when(F.col("_ob") != F.col("_nb"), "changed")
        .otherwise("unchanged"))
    return (
        j.select(F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
                 status.alias("status"))
        .groupBy("host", "status")
        .agg(F.count("*").alias("n"))
    )
