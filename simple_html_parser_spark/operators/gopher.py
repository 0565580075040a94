"""Gopher document-quality rules (Rae et al. 2021, "Scaling Language
Models: Methods, Analysis & Insights from Training Gopher",
arXiv:2112.11446 §A1.1 — the public filtering recipe used, with
variations, by MassiveText / RefinedWeb / FineWeb / Dolma):

1. word count in [min_words, max_words] (paper: 50..100,000);
2. mean word length in [3, 10] characters;
3. symbol-to-word ratio <= 0.1 for BOTH '#' and '...' (ellipsis);
4. <= 90% of lines start with a bullet ('-', '*', '•');
5. <= 30% of lines end with an ellipsis ('...' or '…');
6. >= 80% of words contain at least one alphabetic character;
7. document contains >= 2 distinct "stop words" (paper list:
   the, be, to, of, and, that, have, with — ``stops`` makes the list
   corpus/language-configurable, as every production variant does).

Everything is a per-row codegen'd column projection — NO shuffle, no
Python stage, no join: at 10^12 docs this is a pure map over the scan
(the same shape as quality_score / repetition_stats).  All signals are
INTEGER basis points / scaled integers so the DuckDB value oracle
replays them bit-for-bit (floats-across-engines rule, CLAUDE.md):
every division is an integer ``div``, and every pass/fail threshold is
a cross-multiplied integer comparison with no division at all.

Words are split on [ \\n] (space or newline) with empties dropped —
the line rules need newline-aware words, unlike the single-space
``tokens_col`` the dedup family mirrors into its oracles.

``gopher_filter`` is the COMPOSITION form: it returns the passing
rows of the input frame itself (original columns), as a pure filter
projection — curation flows must use it instead of joining
``gopher_rules`` output back on doc_id, which would cost a corpus
self-join for a zero-shuffle predicate (the VERDICT r03 inline-
projection rule).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Gopher §A1.1 "stop words" (quality proxy, NOT a stopword-removal
# list): a doc must contain at least 2 of these.
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")

BULLETS = ("-", "*", "•")


def _count_occurrences(text: Column, needle: str) -> Column:
    """Non-overlapping occurrence count via length difference —
    identical left-to-right semantics in Spark and DuckDB replace().
    The /len division is exact: the length delta is always a multiple
    of len(needle)."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle))))
        .cast("bigint") / F.lit(len(needle))
    ).cast("bigint")


def _with_signals(docs: DataFrame,
                  stops: tuple[str, ...]) -> DataFrame:
    """docs + the seven rules' integer signal columns (underscored).
    Materialized via withColumn so Catalyst never re-evaluates the
    split arrays per consumer (memory/catalyst-cse-trap)."""
    words = F.col("_w")
    lines = F.col("_l")
    return (
        docs
        .withColumn("_w", F.filter(
            F.split(F.col("text"), "[ \n]"), lambda x: x != ""))
        .withColumn("_l", F.split(F.col("text"), "\n"))
        .withColumn("_nw", F.size(words).cast("bigint"))
        .withColumn("_nl", F.size(lines).cast("bigint"))
        .withColumn("_twc", F.aggregate(
            words, F.lit(0).cast("bigint"),
            lambda a, w: a + F.length(w)))
        .withColumn("_nh", _count_occurrences(F.col("text"), "#"))
        .withColumn("_ne", _count_occurrences(F.col("text"), "..."))
        .withColumn("_nbl", F.size(F.filter(
            lines, lambda ln: F.substring(ln, 1, 1).isin(*BULLETS))
        ).cast("bigint"))
        .withColumn("_nel", F.size(F.filter(
            lines, lambda ln: ln.endswith("...") | ln.endswith("…"))
        ).cast("bigint"))
        .withColumn("_naw", F.size(F.filter(
            words, lambda w: w.rlike("[a-zA-Z]"))).cast("bigint"))
        .withColumn("_nsh", F.size(F.array_intersect(
            words, F.array(*[F.lit(s) for s in stops])
        )).cast("bigint"))
    )


def _passes_col(min_words: int, max_words: int) -> Column:
    """The composite verdict over _with_signals columns: every
    threshold is a cross-multiplied INTEGER comparison (no division
    decides a pass/fail at any corpus size)."""
    nw, nl = F.col("_nw"), F.col("_nl")
    twc = F.col("_twc")
    return (
        (nw >= min_words) & (nw <= max_words)
        & (twc >= 3 * nw) & (twc <= 10 * nw)
        & (10 * F.col("_nh") <= nw)
        & (10 * F.col("_ne") <= nw)
        & (10 * F.col("_nbl") <= 9 * nl)
        & (10 * F.col("_nel") <= 3 * nl)
        & (5 * F.col("_naw") >= 4 * nw)
        & (F.col("_nsh") >= 2)
    )


def gopher_rules(docs: DataFrame,
                 min_words: int = 50,
                 max_words: int = 100_000,
                 stops: tuple[str, ...] = GOPHER_STOPS) -> DataFrame:
    """(doc_id, n_words, n_lines, mean_word_len_x100, hash_word_bp,
    ellipsis_word_bp, bullet_line_bp, ellipsis_line_bp, alpha_word_bp,
    n_stop_hits, passes) — the seven Gopher rules as integer signals
    plus the composite verdict.  ``min_words`` defaults to the paper's
    50; callers tune per corpus."""
    return _with_signals(docs, stops).select(
        "doc_id",
        F.col("_nw").alias("n_words"),
        F.col("_nl").alias("n_lines"),
        F.expr("100 * _twc div greatest(_nw, 1)")
        .alias("mean_word_len_x100"),
        F.expr("10000 * _nh div greatest(_nw, 1)").alias("hash_word_bp"),
        F.expr("10000 * _ne div greatest(_nw, 1)")
        .alias("ellipsis_word_bp"),
        F.expr("10000 * _nbl div greatest(_nl, 1)")
        .alias("bullet_line_bp"),
        F.expr("10000 * _nel div greatest(_nl, 1)")
        .alias("ellipsis_line_bp"),
        F.expr("10000 * _naw div greatest(_nw, 1)")
        .alias("alpha_word_bp"),
        F.col("_nsh").alias("n_stop_hits"),
        _passes_col(min_words, max_words).alias("passes"),
    )


def _rl_fold(arr: Column, step, init_extra: list, finish) -> Column:
    """Run-length fold over a SORTED string array: the accumulator
    carries (prev, run, *extra); ``step`` maps (acc, g, run') to the
    new extra fields, ``finish`` extracts the result.  Sort order is
    irrelevant beyond grouping equal elements adjacently, so Spark and
    DuckDB collation differences cannot matter."""
    acc0 = F.struct(
        F.lit("").alias("prev"), F.lit(0).cast("bigint").alias("run"),
        *init_extra)

    def _step(acc, g):
        run = F.when(g == acc["prev"], acc["run"] + 1).otherwise(
            F.lit(1).cast("bigint"))
        return F.struct(g.alias("prev"), run.alias("run"),
                        *step(acc, g, run))
    return F.aggregate(F.array_sort(arr), acc0, _step, finish)


def _dup_pos_col(grams: Column) -> Column:
    """1-based window positions whose gram occurs >= 2 times, sorted
    ascending.  Sort (gram, pos) pairs so equal grams sit adjacent,
    run-length-collect every member of each run of length >= 2 (the
    run head joins at its second occurrence), then re-sort by
    position.  O(W log W) per row — replaces the dup-SET form whose
    consumer scanned the set per window (O(W * n * |dups|) string
    compares; 500 bench docs took 40 s under it)."""
    z = F.array_sort(F.transform(
        grams,
        lambda w, i: F.struct(w.alias("w"), (i + 1).alias("i"))))
    acc0 = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("pi"),
        F.lit(0).cast("bigint").alias("run"),
        F.array().cast("array<int>").alias("ids"))

    def _step(acc, e):
        run = F.when(e["w"] == acc["prev"], acc["run"] + 1).otherwise(
            F.lit(1).cast("bigint"))
        ids = (
            F.when(run == F.lit(2),
                   F.concat(acc["ids"], F.array(acc["pi"], e["i"])))
            .when(run > F.lit(2), F.array_append(acc["ids"], e["i"]))
            .otherwise(acc["ids"]))
        return F.struct(e["w"].alias("prev"), e["i"].alias("pi"),
                        run.alias("run"), ids.alias("ids"))
    return F.array_sort(F.aggregate(z, acc0, _step,
                                    lambda acc: acc["ids"]))


def _covered_chars(dpos: Column, wl: Column, n: int) -> Column:
    """Total chars of tokens covered by the union of [j, j+n-1] over
    duplicated-window positions ``dpos`` (ascending), given per-token
    char lengths ``wl``.  Interval-union fold: each step adds the
    slice of ``wl`` not already covered by the previous window
    (start = max(j, last+1) <= stop = j+n-1 always, since positions
    strictly increase), so every covered token is counted once —
    exactly the position-coverage set of the per-position exists()
    form this replaces."""
    acc0 = F.struct(F.lit(0).alias("last"),
                    F.lit(0).cast("bigint").alias("c"))

    def _step(acc, j):
        start = F.greatest(j, acc["last"] + 1)
        stop = j + (n - 1)
        add = F.aggregate(
            F.slice(wl, start, stop - start + 1),
            F.lit(0).cast("bigint"), lambda a, x: a + x)
        return F.struct(stop.alias("last"),
                        (acc["c"] + add).alias("c"))
    return F.aggregate(dpos, acc0, _step, lambda acc: acc["c"])


def _top_mass_col(grams: Column, n: int) -> Column:
    """max over distinct grams of count * token-chars(gram) — the
    character mass of the most-repeated n-gram (token chars = the
    gram's length minus its n-1 separator spaces)."""
    return _rl_fold(
        grams,
        lambda acc, g, run: [
            F.greatest(acc["best"],
                       run * (F.length(g) - (n - 1))).alias("best")],
        [F.lit(0).cast("bigint").alias("best")],
        lambda acc: acc["best"])


def massivetext_repetition(
    docs: DataFrame,
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """The MassiveText repetition filters (Rae et al. 2021 §A1.1,
    Table A1 — the other half of the Gopher recipe, alongside
    ``gopher_rules``), integer-exact per row:

    - dup_line_bp / dup_line_char_bp: fraction of lines (and of line
      characters) in duplicate line occurrences beyond the first;
      thresholds 0.30 / 0.20;
    - dup_para_bp / dup_para_char_bp: the same pair over PARAGRAPHS
      (blank-line-separated, i.e. split on '\\n\\n'); thresholds
      0.30 / 0.20;
    - top{2,3,4}gram_char_bp: character mass of the single most-
      repeated n-gram over total token chars ("most repeated" = the
      gram maximizing count × chars, which is what the threshold
      bounds); thresholds 0.20 / 0.18 / 0.16.  Overlapping
      occurrences each count (the count × chars formulation), so the
      bp can exceed 10000 on degenerate inputs like 'x y x y x y' —
      fine for a one-sided upper-bound filter;
    - dup{n}gram_char_bp for n in ``dup_ns``: fraction of token
      characters at positions covered by ANY n-gram occurring >= 2
      times (position coverage, not occurrence sums — overlapping
      duplicates count each token once, the paper's formulation);
      thresholds 0.15 / 0.14 / 0.13 / 0.12 / 0.11 / 0.10 for n=5..10;
    - passes: every threshold as a cross-multiplied INTEGER
      comparison (no division decides a verdict).

    Scale shape: per-row codegen'd array expressions only — no
    shuffle, no join, no Python (the gopher_rules plan shape).  Every
    gram array and dup-set is MATERIALIZED via withColumn before the
    HOFs that consume it (memory/catalyst-cse-trap); run-length folds
    replace the O(G^2) count-per-distinct-gram form, which the DuckDB
    oracle uses instead (order-free, so engine sort collations cannot
    diverge).  Coverage is O(L * n * |dups|) per row, bounded by the
    upstream length filter like dedup_substrings' reconstruction."""
    TOP_TH = {2: 20, 3: 18, 4: 16}           # x/100 of token chars
    DUP_TH = {5: 15, 6: 14, 7: 13, 8: 12, 9: 11, 10: 10}

    words = F.col("_w")
    lines = F.col("_l")
    base = (
        docs
        .withColumn("_w", F.filter(
            F.split(F.col("text"), "[ \n]"), lambda x: x != ""))
        .withColumn("_l", F.split(F.col("text"), "\n"))
        .withColumn("_nw", F.size(words).cast("bigint"))
        .withColumn("_nl", F.size(lines).cast("bigint"))
        .withColumn("_twc", F.aggregate(
            words, F.lit(0).cast("bigint"),
            lambda a, w: a + F.length(w)))
        .withColumn("_tlc", F.aggregate(
            lines, F.lit(0).cast("bigint"),
            lambda a, ln: a + F.length(ln)))
        .withColumn("_ndl", F.size(F.array_distinct(lines))
                    .cast("bigint"))
        # chars in duplicate line OCCURRENCES beyond the first
        .withColumn("_dlc", _rl_fold(
            lines,
            lambda acc, g, run: [
                (acc["c"] + F.when(run >= 2, F.length(g))
                 .otherwise(F.lit(0))).alias("c")],
            [F.lit(0).cast("bigint").alias("c")],
            lambda acc: acc["c"]))
        # the paragraph twins (blank-line-separated spans)
        .withColumn("_p", F.split(F.col("text"), "\n\n"))
        .withColumn("_np", F.size(F.col("_p")).cast("bigint"))
        .withColumn("_tpc", F.aggregate(
            F.col("_p"), F.lit(0).cast("bigint"),
            lambda a, pp: a + F.length(pp)))
        .withColumn("_ndp", F.size(F.array_distinct(F.col("_p")))
                    .cast("bigint"))
        .withColumn("_dpc", _rl_fold(
            F.col("_p"),
            lambda acc, g, run: [
                (acc["c"] + F.when(run >= 2, F.length(g))
                 .otherwise(F.lit(0))).alias("c")],
            [F.lit(0).cast("bigint").alias("c")],
            lambda acc: acc["c"]))
    )

    def grams_col(n: int) -> Column:
        return F.when(
            F.col("_nw") >= n,
            F.transform(F.sequence(F.lit(1), F.col("_nw") - (n - 1)),
                        lambda i: F.concat_ws(
                            " ", F.slice(words, i, n))),
        ).otherwise(F.array().cast("array<string>"))

    for n in (2, 3, 4):
        base = base.withColumn(f"_g{n}", grams_col(n)) \
            .withColumn(f"_m{n}", _top_mass_col(F.col(f"_g{n}"), n))
    base = base.withColumn("_wl", F.transform(words, F.length))
    for n in dup_ns:
        # positions covered by ANY duplicated n-gram window =
        # union of [j, j+n-1] over duplicated-window positions j —
        # the same set as "i covered iff some dup window j in
        # [max(1, i-n+1), min(i, L-n+1)] contains i", computed as an
        # interval-union fold instead of a per-position dup-set scan
        base = (base.withColumn(f"_g{n}", grams_col(n))
                .withColumn(f"_dp{n}", _dup_pos_col(F.col(f"_g{n}"))))
        cov = _covered_chars(F.col(f"_dp{n}"), F.col("_wl"), n)
        base = base.withColumn(
            f"_c{n}", F.when(F.col("_nw") >= n, cov)
            .otherwise(F.lit(0).cast("bigint")))

    nl, twc, tlc = F.col("_nl"), F.col("_twc"), F.col("_tlc")
    np_, tpc = F.col("_np"), F.col("_tpc")
    passes = (
        (10 * (nl - F.col("_ndl")) <= 3 * nl)
        & (10 * F.col("_dlc") <= 2 * F.greatest(tlc, F.lit(1)))
        & (10 * (np_ - F.col("_ndp")) <= 3 * np_)
        & (10 * F.col("_dpc") <= 2 * F.greatest(tpc, F.lit(1)))
    )
    for n in (2, 3, 4):
        passes = passes & (
            100 * F.col(f"_m{n}") <= TOP_TH[n] * F.greatest(
                twc, F.lit(1)))
    for n in dup_ns:
        passes = passes & (
            100 * F.col(f"_c{n}") <= DUP_TH[n] * F.greatest(
                twc, F.lit(1)))

    out = [
        "doc_id",
        F.col("_nw").alias("n_words"),
        nl.alias("n_lines"),
        F.expr("10000 * (_nl - _ndl) div greatest(_nl, 1)")
        .alias("dup_line_bp"),
        F.expr("10000 * _dlc div greatest(_tlc, 1)")
        .alias("dup_line_char_bp"),
        F.expr("10000 * (_np - _ndp) div greatest(_np, 1)")
        .alias("dup_para_bp"),
        F.expr("10000 * _dpc div greatest(_tpc, 1)")
        .alias("dup_para_char_bp"),
    ]
    out += [F.expr(f"10000 * _m{n} div greatest(_twc, 1)")
            .alias(f"top{n}gram_char_bp") for n in (2, 3, 4)]
    out += [F.expr(f"10000 * _c{n} div greatest(_twc, 1)")
            .alias(f"dup{n}gram_char_bp") for n in dup_ns]
    out.append(passes.alias("passes"))
    return base.select(*out)


def gopher_filter(docs: DataFrame,
                  min_words: int = 50,
                  max_words: int = 100_000,
                  stops: tuple[str, ...] = GOPHER_STOPS) -> DataFrame:
    """The rows of ``docs`` (original columns) passing all seven
    rules — a pure filter projection for inline composition; never
    join gopher_rules back on doc_id."""
    return (_with_signals(docs, stops)
            .where(_passes_col(min_words, max_words))
            .select(*docs.columns))
