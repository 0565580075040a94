"""Document sources.

Two input shapes:

1. **Crawl shape** (BASELINE.json input_hint): a table
   ``(url string, warc_ts timestamp, html binary, text string,
   lang string)`` — at production scale an Iceberg table partitioned by
   ``warc_ts``; here parquet.  ``load_documents`` reads it with column
   pruning left to the caller.

2. **Driver testdata shape** (/root/testdata/sf*/documents.parquet):
   ``(doc_id, text, lang, source, n_chars)`` — no html.
   ``render_html`` turns it into the crawl shape DETERMINISTICALLY and
   entirely JVM-side (format_string + encode: whole-stage codegen, no
   Python), using a fixed template whose parse results are
   SQL-derivable — which is what makes the parser pipeline
   DuckDB-oracle-checkable end-to-end (extracted text, node counts,
   comment contents are all closed-form functions of the input row).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)

# One-line page template; %1$s = doc_id, %2$s = text, %3$s = lang,
# %4$s = source.  Keep in sync with oracle SQL in __spark_entry__
# (ORACLE_* constants) and the counts in tests/test_pipeline.py.
HTML_TEMPLATE = (
    '<html><head><title>Doc %1$s</title>'
    "<style>.main { color: #222; } "
    "@media print { .main { color: black; } }</style></head>"
    '<body><nav class="top"><a href="/src/%4$s">%4$s</a>'
    '<a href="/lang/%3$s">%3$s</a></nav>'
    '<main class="main"><h1>Doc %1$s</h1>'
    '<p class="content">%2$s</p></main>'
    '<aside><a href="/r">related</a></aside>'
    "<!-- id:%1$s --><footer>corpus footer</footer></body></html>"
)


# --- oracle-corpus variant templates (VERDICT r01 item 4) -----------------
# Each exercises tokenizer branches the main template cannot, with a
# CONSTANT node structure for any substitution (verified against the
# reference via tools/ref_dump.mjs for diverse samples; structure maps
# in __spark_entry__ oracles are derived from the kernel and pinned).
#
# voids: T3 non-tag '<' rescue, T7 void elements (img/hr/input), a
# self-closing-style 'br/', and an unmatched </section> closer.
TPL_VOIDS = (
    '<html><body><p>a < b; %2$s</p><br/>'
    '<img src="/img/%1$s.png" alt="d%1$s"><hr>'
    '</section><input type="text" value="%3$s"></body></html>'
)
# special: T6 special-tag JS submachine — jhp content split into
# text/comment tokens (line + block comments), script block as text.
TPL_SPECIAL = (
    '<html><body><jhp>var x = %1$s; // note %4$s\n'
    '/* c */ if (x < 2) { x = x + 1; }</jhp>'
    '<script>let s = "%3$s"; // tail\n</script>'
    '<p>%2$s</p></body></html>'
)
# toHtml of the MAIN template is not byte-identical to the input:
# style blocks re-serialize through cssTreeToString (pretty-printed)
# and comments are dropped by default — both reference semantics.  The
# serialized form is still a fixed template (kernel-derived, reference-
# verified via goldens' to_html asserts):
TPL_MAIN_SERIALIZED = (
    "<html><head><title>Doc %1$s</title><style>\n.main {\n"
    "    color: #222;\n}\n@media print {\n    .main {\n"
    "        color: black;\n    }\n\n}\n</style></head>"
    '<body><nav class="top"><a href="/src/%4$s">%4$s</a>'
    '<a href="/lang/%3$s">%3$s</a></nav>'
    '<main class="main"><h1>Doc %1$s</h1>'
    '<p class="content">%2$s</p></main>'
    '<aside><a href="/r">related</a></aside>'
    "<footer>corpus footer</footer></body></html>"
)
# the main template after operators/editing.EDIT_STEPS (A2-A4 attr
# writes + M1-M7 tree rewrites) serializes to this fixed template —
# kernel-derived (marker substitution), reference-verified via the
# edit-pipeline golden cases.  Note reference semantics preserved:
# updateAttribute APPENDS ("top topx"), removeAttribute leaves a bare
# <a>, toHtml drops the comment.
TPL_MAIN_EDITED = (
    "<html><head><span>T</span><style>\n.main {\n    color: #222;\n}\n"
    "@media print {\n    .main {\n        color: black;\n    }\n\n}\n"
    '</style></head><body><nav class="top topx">'
    '<a href="/src/%4$s">%4$s</a><a href="/lang/%3$s">%3$s</a></nav>'
    '<main class="main" data-k="v1"><h1>Doc %1$s</h1>'
    '<p class="content">%2$s</p><p class="x">tail</p></main>'
    "<em>z</em><aside><a>related</a></aside></body></html>"
)
# the reference does NOT round-trip jhp comments (toHtml drops them);
# its serialized form is itself a fixed template — used as the
# doc_roundtrip oracle for the special page.
TPL_SPECIAL_SERIALIZED = (
    '<html><body><jhp>var x = %1$s;  if (x < 2) { x = x + 1; }</jhp>'
    '<script>let s = "%3$s"; // tail\n</script>'
    '<p>%2$s</p></body></html>'
)
# malformed: T8 recovery — unclosed p/span closed by the ancestor
# </div>, an unmatched </i>, and an unclosed trailing <p> at EOF
# (mirrors /root/reference/test/parser.test.js "handles malformed HTML
# gracefully").
TPL_MALFORMED = (
    '<div class="w"><p>Unclosed %2$s<span>s%1$s</div>'
    '<b>b %3$s</i></b><p>tail %4$s'
)

# cssy: C2 nested-rule lookahead, C8-C11 cssFind* (at-rule, compound
# vs exact rule match, custom properties with :root/#hdr scopes —
# --pad's VALUE is per-doc, so the variables query is value-checked,
# not just shape-checked).
TPL_CSSY = (
    "<html><head><style>"
    ":root { --c: #0a0; --pad: %1$spx; } "
    ".a, .b { color: var(--c); padding: 2px; } "
    "#hdr { margin: 0; --local: 7px; } "
    "/* theme %1$s */ "
    "@media screen { .a { width: 10px; } } "
    ".c { .d { x: y; } top: 1px; }"
    "</style></head>"
    '<body id="hdr"><p class="a b">%2$s</p></body></html>'
)

# cssToString option matrix over the cssy template (C12, reference
# node.js:707-870, option semantics exercised by test/css.test.js:
# 244-531).  Each combo's output is a fixed template with ONE doc-id
# substitution (@D@ = doc_id, inside the --pad custom property) —
# kernel-derived and byte-verified against the reference via ref_dump
# css_to_string for multiple substitutions.  Keys match
# operators.queryapi.CSS_SER_COMBOS.
TPL_CSSY_SERIALIZED = {
    "default": ':root {\n    --c: #0a0;\n    --pad: @D@px;\n}\n'
               '.a, .b {\n    color: var(--c);\n    padding: 2px;\n}\n'
               '#hdr {\n    margin: 0;\n    --local: 7px;\n}\n'
               '@media screen {\n    .a {\n        width: 10px;\n    }'
               '\n\n}\n.c {\n    top: 1px;\n    .d {\n        x: y;\n'
               '    }\n}',
    "single_line": ':root { --c: #0a0; --pad: @D@px; }'
                   '.a, .b { color: var(--c); padding: 2px; }'
                   '#hdr { margin: 0; --local: 7px; }'
                   '@media screen {    .a {\n        width: 10px;\n'
                   '    }\n}.c { top: 1px; .d { x: y; } }',
    "flatten": ':root {\n    --c: #0a0;\n    --pad: @D@px;\n}\n'
               '.a, .b {\n    color: var(--c);\n    padding: 2px;\n}\n'
               '#hdr {\n    margin: 0;\n    --local: 7px;\n}\n'
               '@media screen {\n    .a {\n        width: 10px;\n    }'
               '\n\n}\n.c {\n    top: 1px;\n\n.c .d {\n    x: y;\n}\n}',
    "no_combine": ':root {\n    --c: #0a0;\n    --pad: @D@px;\n}\n'
                  '.a, .b {\n    color: var(--c);\n    padding: 2px;\n'
                  '}\n#hdr {\n    margin: 0;\n    --local: 7px;\n}\n'
                  '@media screen {\n    .a {\n        width: 10px;\n'
                  '    }\n\n}\n.c {\n    top: 1px;\n    .d {\n'
                  '        x: y;\n    }\n}',
    "bare": '--c: #0a0;\n--pad: @D@px;\n\ncolor: var(--c);\n'
            'padding: 2px;\n\nmargin: 0;\n--local: 7px;\n\n'
            '@media screen {\n    .a {\n        width: 10px;\n    }\n\n}'
            '\ntop: 1px;\nx: y;',
    "indent2": '  :root {\n      --c: #0a0;\n      --pad: @D@px;\n  }\n'
               '  .a, .b {\n      color: var(--c);\n      padding: 2px;'
               '\n  }\n  #hdr {\n      margin: 0;\n      --local: 7px;'
               '\n  }\n  @media screen {\n    .a {\n        width: '
               '10px;\n    }\n\n  }\n  .c {\n      top: 1px;\n'
               '      .d {\n          x: y;\n      }\n  }',
    # includeComments=true (reference node.js:732,813,855; exercised
    # by test/css.test.js:112-127) — the template's top-level
    # '/* theme N */' comment is emitted in place, in document order;
    # all OTHER combos default includeComments=false and skip comment
    # nodes entirely, which is why their forms are byte-identical to
    # the comment-free template's (re-derived via ref_dump, r4)
    "comments": ':root {\n    --c: #0a0;\n    --pad: @D@px;\n}\n'
                '.a, .b {\n    color: var(--c);\n    padding: 2px;\n}\n'
                '#hdr {\n    margin: 0;\n    --local: 7px;\n}\n'
                '/* theme @D@ */\n'
                '@media screen {\n    .a {\n        width: 10px;\n    }'
                '\n\n}\n.c {\n    top: 1px;\n    .d {\n        x: y;\n'
                '    }\n}',
}

# serialize.visualize of the main template (S6) — fixed box-drawing
# tree; %5$s marks the truncated text preview (first 17 chars + '...',
# always truncated: corpus texts are ≥44 chars, pre-trimmed).  css-*
# node labels are empty — reference's unhandled visualize branches.
TPL_MAIN_VISUALIZE = (
    'ROOT\n├── <html>\n│   ├── <head>\n│   │   ├── <title>\n'
    '│   │   │   └── TEXT: "Doc %1$s"\n│   │   ├── </title>\n'
    '│   │   ├── <style>\n│   │   │   ├── \n│   │   │   └── \n'
    '│   │   │       └── \n│   │   └── </style>\n│   ├── </head>\n'
    '│   ├── <body>\n│   │   ├── <nav class="top">\n'
    '│   │   │   ├── <a href="/src/%4$s">\n'
    '│   │   │   │   └── TEXT: "%4$s"\n│   │   │   ├── </a>\n'
    '│   │   │   ├── <a href="/lang/%3$s">\n'
    '│   │   │   │   └── TEXT: "%3$s"\n│   │   │   └── </a>\n'
    '│   │   ├── </nav>\n│   │   ├── <main class="main">\n'
    '│   │   │   ├── <h1>\n│   │   │   │   └── TEXT: "Doc %1$s"\n'
    '│   │   │   ├── </h1>\n│   │   │   ├── <p class="content">\n'
    '│   │   │   │   └── TEXT: "%5$s"\n│   │   │   └── </p>\n'
    '│   │   ├── </main>\n│   │   ├── <aside>\n'
    '│   │   │   ├── <a href="/r">\n'
    '│   │   │   │   └── TEXT: "related"\n│   │   │   └── </a>\n'
    '│   │   ├── </aside>\n'
    '│   │   ├── COMMENT (html-comment): "id:%1$s"\n'
    '│   │   ├── <footer>\n│   │   │   └── TEXT: "corpus footer"\n'
    '│   │   └── </footer>\n│   └── </body>\n└── </html>\n'
)

VARIANT_TEMPLATES = {
    "main": HTML_TEMPLATE,
    "voids": TPL_VOIDS,
    "special": TPL_SPECIAL,
    "malformed": TPL_MALFORMED,
    "cssy": TPL_CSSY,
}


def load_table(spark: SparkSession, sf_dir: str, name: str,
               fmt: str | None = None) -> DataFrame:
    """Table seam.  Production shape is an Iceberg catalog table
    (``fmt="iceberg"`` / SPARK_GRAFT_TABLE_FORMAT=iceberg reads
    ``<sf_dir>.<name>`` as a catalog identifier — partition pruning and
    snapshot isolation come from the Iceberg source); this container
    has no Iceberg runtime, so the default is the parquet fallback over
    the driver's testdata layout."""
    fmt = fmt or os.environ.get("SPARK_GRAFT_TABLE_FORMAT", "parquet")
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(f"{sf_dir}.{name}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def render_html(docs: DataFrame) -> DataFrame:
    """(doc_id, text, lang, source, …) → crawl-shaped
    (url, warc_ts, html binary, text, lang).  Pure built-in expressions:
    stays inside whole-stage codegen."""
    return docs.select(
        F.format_string("doc://%s/%s", "source", "doc_id").alias("url"),
        (F.lit("2025-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("doc_id").cast("double"))
         ).alias("warc_ts"),
        F.encode(
            F.format_string(HTML_TEMPLATE, "doc_id", "text", "lang",
                            "source"),
            "utf-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-shaped documents for a testdata sf dir (rendered)."""
    return render_html(load_table(spark, sf_dir, "documents"))


def render_variant(docs: DataFrame, variant: str) -> DataFrame:
    """(doc_id, text, lang, source, …) → crawl shape rendered with one
    of VARIANT_TEMPLATES; urls carry the variant as a fragment so the
    corpora can be unioned without key collisions."""
    tpl = VARIANT_TEMPLATES[variant]
    return docs.select(
        F.format_string(f"doc://%s/%s#{variant}", "source", "doc_id")
        .alias("url"),
        F.encode(
            F.format_string(tpl, "doc_id", "text", "lang", "source"),
            "utf-8").alias("html"),
        F.col("text"), F.col("lang"),
    )


def load_documents_variant(spark: SparkSession, sf_dir: str,
                           variant: str) -> DataFrame:
    return render_variant(load_table(spark, sf_dir, "documents"), variant)


# --- crawl fetch log (web-shaped urls + refetches) ------------------------
# Common-Crawl-style fetch log for the URL-level operators
# (operators/weburl.py): every page gets a realistic https url built
# closed-form from (source, lang, doc_id), and every
# CRAWL_REFETCH_MOD-th page appears TWICE — the refetch one day later
# with a different byte count — so url-level dedup-by-recency is
# non-vacuous.  Pure JVM expressions; the DuckDB oracles rebuild the
# identical log from the same closed forms (__spark_entry__._CRAWL_CTE).

CRAWL_REFETCH_MOD = 3
CRAWL_EPOCH = "2025-01-01 00:00:00"


def render_crawl(docs: DataFrame) -> DataFrame:
    """(doc_id, text, lang, source, n_chars) → fetch log
    (doc_id, url, warc_ts, n_bytes, fetch_seq)."""
    url = F.format_string(
        "https://%s.example.com/%s/sec%s/doc-%s.html?ref=r%s",
        F.col("source"), F.col("lang"),
        (F.col("doc_id") % 50).cast("string"),
        F.col("doc_id").cast("string"),
        (F.col("doc_id") % 7).cast("string"))
    base = docs.select(
        "doc_id", url.alias("url"),
        (F.lit(CRAWL_EPOCH).cast("timestamp")
         + F.make_interval(secs=F.col("doc_id").cast("double"))
         ).alias("warc_ts"),
        F.col("n_chars").cast("bigint").alias("n_bytes"),
        F.lit(0).cast("bigint").alias("fetch_seq"),
    )
    refetch = base.where(F.col("doc_id") % CRAWL_REFETCH_MOD == 0).select(
        "doc_id", "url",
        (F.col("warc_ts") + F.make_interval(days=F.lit(1))).alias("warc_ts"),
        (F.col("n_bytes") + F.lit(17)).alias("n_bytes"),
        F.lit(1).cast("bigint").alias("fetch_seq"),
    )
    return base.unionByName(refetch)


def load_crawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl fetch log for a testdata sf dir."""
    return render_crawl(load_table(spark, sf_dir, "documents"))


# --- WARC container files (Common Crawl's input format) -------------------
# Pages packed into per-(source, doc_id-block) WARC files, records in
# doc_id order, every header field closed-form in (source, doc_id) —
# so the WARC record parser (operators/warc.py) is fully
# DuckDB-oracle-able.  Rendered with pure JVM expressions (binary
# concat + an ordered collect_list aggregate); bodies are the same
# HTML_TEMPLATE pages the extraction oracle already pins.

WARC_DATE_FMT = "yyyy-MM-dd'T'HH:mm:ss'Z'"

# Records per file are CAPPED by bucketing on doc_id range (ADVICE
# r03: one-file-per-source made a single payload row grow linearly
# with sf — groupBy source collects a source's whole corpus into one
# binary, breaking executor memory / Arrow's 2 GB binary limit at
# large sf and serializing each source into one task).  A 320-wide
# doc_id block holds 16 records per file at the synthesis's 20
# sources; file count now grows with sf while per-file payload stays
# constant.  LOAD-BEARING for the warc_records oracle SQL in
# __spark_entry__ (warc_id suffix + rec_idx partitioning mirror it).
WARC_DOC_BLOCK = 320


def render_warc(docs: DataFrame) -> DataFrame:
    """(doc_id, text, lang, source, …) → WARC files
    (warc_id, payload binary, n_records): one file per (source,
    doc_id-block of WARC_DOC_BLOCK), warc_id = ``source-pN``, records
    sorted by doc_id, each
    ``WARC/1.0 CRLF headers CRLF CRLF body CRLF CRLF``."""
    p = docs.select(
        "doc_id", "source",
        F.format_string("doc://%s/%s", "source", "doc_id").alias("url"),
        (F.lit(CRAWL_EPOCH).cast("timestamp")
         + F.make_interval(secs=F.col("doc_id").cast("double"))
         ).alias("warc_ts"),
        F.format_string(HTML_TEMPLATE, "doc_id", "text", "lang",
                        "source").alias("html"),
    )
    # records stay STRINGS until one final encode: an aggregate-fold of
    # binary concat would copy the accumulated payload once per record
    # (O(bytes^2) per file); array_join is linear.  Content-Length is
    # octet_length (utf-8 BYTES), which is what the parser slices by.
    rec = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
        F.col("url"),
        F.lit("\r\nWARC-Date: "),
        F.date_format("warc_ts", WARC_DATE_FMT),
        F.lit("\r\nContent-Length: "),
        F.octet_length("html").cast("string"),
        F.lit("\r\n\r\n"),
        F.col("html"),
        F.lit("\r\n\r\n"))
    part = F.expr(f"doc_id div {WARC_DOC_BLOCK}")
    return (
        p.select("source", "doc_id", rec.alias("rec"),
                 part.alias("part"))
        .groupBy("source", "part")
        .agg(F.count("*").alias("n_records"),
             F.encode(
                 F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.struct("doc_id", "rec"))),
                         lambda s: s.rec),
                     ""),
                 "utf-8").alias("payload"))
        .select(F.format_string("%s-p%s", "source", "part")
                .alias("warc_id"), "payload", "n_records")
    )


def load_warc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC files for a testdata sf dir."""
    return render_warc(load_table(spark, sf_dir, "documents"))


# every CONTACT_MOD-th doc gets a deterministic PII-bearing contact
# suffix (email + IPv4 + phone, all closed-form in doc_id) so the
# pii_scrub / oov operators are non-vacuous and DuckDB-oracle-able
CONTACT_MOD = 5


def with_contacts(docs: DataFrame) -> DataFrame:
    """documents with the contact suffix appended to every
    CONTACT_MOD-th text (other rows unchanged)."""
    d = F.col("doc_id")
    suffix = F.format_string(
        " contact user%s@mail%s.example.com from 10.%s.0.%s"
        " or call 555-%s-%s",
        d.cast("string"), (d % 10).cast("string"),
        (d % 200).cast("string"), (d % 250).cast("string"),
        F.lpad((d % 1000).cast("string"), 3, "0"),
        F.lpad((d % 10000).cast("string"), 4, "0"))
    return docs.withColumn(
        "text",
        F.when(d % CONTACT_MOD == 0, F.concat(F.col("text"), suffix))
        .otherwise(F.col("text")))


# --- multimodal binary payloads (closed-form headers) ---------------------
# Deterministic PNG / WAV byte columns rendered ENTIRELY JVM-side, so
# the real header decoders (operators/multimodal.py) can be checked by
# the DuckDB oracle: every header field is a closed-form function of
# doc_id.  The PNG chunk CRCs are REAL (F.crc32 == PNG's CRC-32), so
# any independent PNG header reader accepts these files; the IDAT body
# is filler (a header probe never inflates pixel data).

PNG_SIG = b"\x89PNG\r\n\x1a\n"
PNG_IEND = bytes.fromhex("0000000049454e44ae426082")


def _be(col, nbytes: int):
    """bigint column → big-endian fixed-width binary (JVM built-ins:
    hex → lpad → unhex)."""
    return F.unhex(F.lpad(F.hex(col.cast("bigint")), 2 * nbytes, "0"))


def _le(col, nbytes: int):
    """bigint column → little-endian fixed-width binary (byte-swapped
    hex)."""
    h = F.lpad(F.hex(col.cast("bigint")), 2 * nbytes, "0")
    return F.unhex(F.concat(
        *[F.substring(h, 2 * i + 1, 2) for i in reversed(range(nbytes))]))


def _chunk(ctype: bytes, data):
    """A PNG chunk: len(4BE) + type + data + crc32(type||data)."""
    return F.concat(
        _be(F.length(data), 4), F.lit(ctype), data,
        _be(F.crc32(F.concat(F.lit(ctype), data)), 4))


def render_png(docs: DataFrame) -> DataFrame:
    """(doc_id, source, …) → (url, payload binary): a structurally
    valid PNG whose IHDR fields are closed-form in doc_id —
    width = doc_id%640+1, height = doc_id%480+1, bit depth 8,
    color type cycling gray/RGB/RGBA (1/3/4 channels), plus a filler
    IDAT of doc_id%13+1 bytes so n_bytes varies."""
    doc_id = F.col("doc_id").cast("bigint")
    ihdr_data = F.concat(
        _be(doc_id % 640 + 1, 4),            # width
        _be(doc_id % 480 + 1, 4),            # height
        F.lit(b"\x08"),                      # bit depth
        _be(F.when(doc_id % 3 == 0, 0)       # color type 0/2/6
             .when(doc_id % 3 == 1, 2).otherwise(6), 1),
        F.lit(b"\x00\x00\x00"),              # compression/filter/interlace
    )
    idat_data = F.encode(F.expr("repeat(' ', CAST(doc_id % 13 + 1 AS INT))"),
                         "utf-8")
    payload = F.concat(F.lit(PNG_SIG), _chunk(b"IHDR", ihdr_data),
                       _chunk(b"IDAT", idat_data), F.lit(PNG_IEND))
    return docs.select(
        F.format_string("doc://%s/%s#png", "source", "doc_id").alias("url"),
        payload.alias("payload"))


def render_wav(docs: DataFrame) -> DataFrame:
    """(doc_id, source, …) → (url, payload binary): a valid PCM WAV
    (RIFF/WAVE + fmt + data) with closed-form header fields —
    sample_rate = 8000 + (doc_id%5)*8000, channels = doc_id%2+1,
    16-bit samples, doc_id%50+10 frames of filler audio."""
    doc_id = F.col("doc_id").cast("bigint")
    channels = doc_id % 2 + 1
    sample_rate = doc_id % 5 * 8000 + 8000
    block_align = channels * 2                       # 16-bit PCM
    frames = doc_id % 50 + 10
    data_size = block_align * frames
    fmt_data = F.concat(
        _le(F.lit(1), 2),                            # PCM
        _le(channels, 2),
        _le(sample_rate, 4),
        _le(sample_rate * block_align, 4),           # byte rate
        _le(block_align, 2),
        _le(F.lit(16), 2),                           # bits/sample
    )
    body = F.encode(
        F.expr("repeat(' ', CAST((doc_id % 2 + 1) * 2 "
               "* (doc_id % 50 + 10) AS INT))"), "utf-8")
    payload = F.concat(
        F.lit(b"RIFF"), _le(data_size + 36, 4), F.lit(b"WAVE"),
        F.lit(b"fmt "), _le(F.lit(16), 4), fmt_data,
        F.lit(b"data"), _le(data_size, 4), body)
    return docs.select(
        F.format_string("doc://%s/%s#wav", "source", "doc_id").alias("url"),
        payload.alias("payload"))


# --- synthesized PDF corpus (north-rule "PDF/layout parse") --------------
# Structurally valid 3-page PDFs built ENTIRELY from JVM expressions:
# classic xref table with correct byte offsets (cumulative F.length over
# the object columns), page tree (/Pages → 3 /Kids), per-page content
# streams whose text-show operators carry closed-form text in doc_id —
# so the DuckDB oracle verifies the real parser (operators/pdftext.py):
# xref walk, /Length-delimited stream extraction, FlateDecode (page 3's
# constant colophon stream is zlib-compressed once at plan-build time),
# escape/hex/TJ string forms, and the LAYOUT re-sort (page 1's body
# lines are painted in REVERSE stream order; only a y-sort restores
# reading order).

_PDF_HEADER = b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n"
_PDF_COLOPHON_STREAM = (
    "BT /F1 12 Tf 14 TL 72 720 Td (Colophon page) Tj T* "
    "(Synthesized deterministic corpus) Tj ET\n"
)


def _pdf_obj(num: int, body) -> "F.Column":
    return F.concat(F.lit(f"{num} 0 obj\n".encode("ascii")), body,
                    F.lit(b"endobj\n"))


def _pdf_stream_obj(num: int, data, filt: str = "") -> "F.Column":
    """Stream object: /Length is the exact byte length of the data
    column (F.length on binary = bytes), EOL before endstream excluded
    per spec 7.3.8.1."""
    return _pdf_obj(num, F.concat(
        F.lit(b"<< /Length "),
        F.encode(F.length(data).cast("string"), "utf-8"),
        F.lit((filt + " >>\nstream\n").encode("ascii")),
        data, F.lit(b"\nendstream\n")))


def _pdf_page_obj(num: int, contents: int) -> "F.Column":
    return _pdf_obj(num, F.lit((
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 9 0 R >> >> "
        f"/Contents {contents} 0 R >>\n").encode("ascii")))


def render_pdf(docs: DataFrame) -> DataFrame:
    """(doc_id, source, …) → (url, payload binary): a valid 3-page PDF
    whose extracted page texts are closed-form in doc_id.

    Page 1 (uncompressed): a TJ heading with kerning numbers, then
    doc_id%3+1 body lines painted in REVERSE stream order (the layout
    y-sort is load-bearing), an escape-heavy line, and a hex-string
    line.  Page 2 (uncompressed): Tj + relative TD second line.
    Page 3 (/Filter /FlateDecode): constant colophon, compressed once
    in Python at plan-build time (F.lit of the deflate bytes — Spark
    has no deflate built-in, and a constant stream keeps it
    deterministic)."""
    import zlib

    doc_id = F.col("doc_id").cast("bigint")
    sid = doc_id.cast("string")

    def body_line(i: int):
        return F.concat(
            F.lit(f"BT /F1 12 Tf 72 {700 - 14 * i} Td "
                  f"(Body line {i} of document "),
            sid, F.lit(") Tj ET\n"))

    body_rev = (
        F.when(doc_id % 3 == 2,
               F.concat(body_line(3), body_line(2), body_line(1)))
        .when(doc_id % 3 == 1, F.concat(body_line(2), body_line(1)))
        .otherwise(body_line(1)))
    heading = F.concat(
        F.lit("BT /F1 12 Tf 72 720 Td "
              "[(Heading for ) -20 (document ) -18 ("),
        sid, F.lit(")] TJ ET\n"))
    c1 = F.encode(F.concat(
        body_rev, heading,
        F.lit("BT /F1 12 Tf 72 640 Td "
              "(Escape \\(parens\\) \\\\ slash) Tj ET\n"),
        F.lit("BT /F1 12 Tf 72 620 Td <486578206c696e65> Tj ET\n"),
    ), "utf-8")
    c2 = F.encode(F.concat(
        F.lit("BT /F1 12 Tf 72 720 Td (Document "), sid,
        F.lit(" continued on page 2) Tj 0 -14 TD (Token "),
        (doc_id % 100).cast("string"),
        F.lit(" of section "), (doc_id % 7).cast("string"),
        F.lit(") Tj ET\n")), "utf-8")
    c3 = F.lit(zlib.compress(_PDF_COLOPHON_STREAM.encode("ascii"), 9))

    objs = [
        _pdf_obj(1, F.lit(b"<< /Type /Catalog /Pages 2 0 R >>\n")),
        _pdf_obj(2, F.lit(
            b"<< /Type /Pages /Kids [3 0 R 5 0 R 7 0 R] /Count 3 >>\n")),
        _pdf_page_obj(3, contents=4),
        _pdf_stream_obj(4, c1),
        _pdf_page_obj(5, contents=6),
        _pdf_stream_obj(6, c2),
        _pdf_page_obj(7, contents=8),
        _pdf_stream_obj(8, c3, filt=" /Filter /FlateDecode"),
        _pdf_obj(9, F.lit(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n")),
    ]
    # cumulative byte offsets → a CORRECT classic xref table
    offsets = []
    acc = F.lit(len(_PDF_HEADER)).cast("bigint")
    for o in objs:
        offsets.append(acc)
        acc = acc + F.length(o).cast("bigint")
    xref_entries = [F.lit(b"0000000000 65535 f \n")] + [
        F.concat(F.encode(F.lpad(off.cast("string"), 10, "0"), "utf-8"),
                 F.lit(b" 00000 n \n"))
        for off in offsets]
    payload = F.concat(
        F.lit(_PDF_HEADER), *objs,
        F.lit(b"xref\n0 10\n"), *xref_entries,
        F.lit(b"trailer\n<< /Size 10 /Root 1 0 R >>\nstartxref\n"),
        F.encode(acc.cast("string"), "utf-8"),
        F.lit(b"\n%%EOF"))
    return docs.select(
        F.format_string("doc://%s/%s#pdf", "source", "doc_id").alias("url"),
        payload.alias("payload"))


def render_html_heavy(docs: DataFrame, paras: int = 40) -> DataFrame:
    """Bench-realistic pages (~10-40 KB): ``paras`` indexed paragraphs
    plus a nav link list and a style block.  Still pure JVM expressions
    and still deterministic; used by bench.py so measured throughput
    reflects kernel work on crawl-sized pages, not per-row overhead."""
    body = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(paras)),
            lambda i: F.format_string(
                '<p class="content">para %s %s</p>',
                i.cast("string"), F.col("text"))),
        "")
    navs = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(20)),
            lambda i: F.format_string(
                '<li><a href="/t/%s">tag %s</a></li>',
                i.cast("string"), i.cast("string"))),
        "")
    page = F.concat(
        F.format_string(
            '<html><head><title>Doc %s</title>'
            "<style>.main { color: #222; } .nav { display: none; } "
            "@media print { .main { color: black; } }</style></head>"
            '<body><nav class="nav"><ul>', "doc_id"),
        navs,
        F.lit('</ul></nav><main class="main">'),
        F.format_string("<h1>Doc %s</h1>", "doc_id"),
        body,
        F.lit("</main><footer>corpus footer</footer></body></html>"),
    )
    return docs.select(
        F.format_string("doc://%s/%s", "source", "doc_id").alias("url"),
        F.encode(page, "utf-8").alias("html"),
        F.col("text"), F.col("lang"),
    )


# --- charset-variant corpus (byte→string sniffing, kernel/charset) --------
# Five closed-form encodings keyed on doc_id % 5 — BOM'd UTF-8, BOM'd
# UTF-16LE, meta-labelled ISO-8859-1, unlabelled UTF-8, and
# unlabelled cp1252 (strict-utf-8-probe fallback tier) — over an
# ASCII-sanitized text (ASCII ⊂ every variant, so the decoded STRING
# is identical across variants and the oracle can rebuild it in SQL).
# LOAD-BEARING for the charset_sniff oracle in __spark_entry__.

CHARSET_TPL = (
    '<html><head><meta charset="%s"><title>Doc %s</title></head>'
    "<body><p>%s</p></body></html>"
)
CHARSET_TPL_NOMETA = (
    "<html><head><title>Doc %s</title></head>"
    "<body><p>%s</p></body></html>"
)


def render_charset(docs: DataFrame) -> DataFrame:
    """(doc_id, text, source, …) → (doc_id, url, payload binary):
    pages in five byte encodings, selected by doc_id % 5:

      0: UTF-8 with BOM (meta also says utf-8 — BOM wins)
      1: UTF-16LE with BOM (meta label present but BOM wins)
      2: ISO-8859-1, labelled ONLY by the meta tag
      3: unlabelled UTF-8 (sniffer default tier: strict probe passes)
      4: unlabelled cp1252 with a non-ASCII ' café' suffix — the
         0xE9 byte fails the strict utf-8 probe, so the sniffer's
         WHATWG fallback tier (windows-1252) must fire

    Text is ASCII-sanitized JVM-side so every variant encodes the
    SAME string (ASCII bytes are identical in utf-8/latin-1 and map
    1:1 into UTF-16LE; é is byte 0xE9 in BOTH latin-1 and cp1252, so
    the ISO-8859-1 encoder below produces valid cp1252) — the decoded
    output is closed-form."""
    ascii_text = F.regexp_replace("text", "[^ -~]", "")
    mod = F.col("doc_id") % 5
    page_meta = F.format_string(
        CHARSET_TPL,
        F.when(mod == 0, F.lit("utf-8"))
        .when(mod == 1, F.lit("utf-16le"))
        .otherwise(F.lit("iso-8859-1")),
        F.col("doc_id").cast("string"), ascii_text)
    page_plain = F.format_string(
        CHARSET_TPL_NOMETA, F.col("doc_id").cast("string"), ascii_text)
    page_cafe = F.format_string(
        CHARSET_TPL_NOMETA, F.col("doc_id").cast("string"),
        F.concat(ascii_text, F.lit(" café")))
    payload = (
        F.when(mod == 0, F.concat(F.lit(b"\xef\xbb\xbf"),
                                  F.encode(page_meta, "UTF-8")))
        .when(mod == 1, F.concat(F.lit(b"\xff\xfe"),
                                 F.encode(page_meta, "UTF-16LE")))
        .when(mod == 2, F.encode(page_meta, "ISO-8859-1"))
        .when(mod == 4, F.encode(page_cafe, "ISO-8859-1"))
        .otherwise(F.encode(page_plain, "UTF-8"))
    )
    return docs.select(
        "doc_id",
        F.format_string("doc://%s/%s#charset", "source", "doc_id")
        .alias("url"),
        payload.alias("payload"),
    )
