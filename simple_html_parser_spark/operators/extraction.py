"""Spark extraction pipeline — the engine's flagship operator.

Design (SURVEY.md §3.4, §4.3):

    scan (url, html only — column pruning reaches the parquet reader)
      → salted repartition on url hash (defuses giant-page skew)
      → ONE mapInArrow stage (tokenize → flat tree → extract), the only
        JVM↔Python boundary on the hot path; no per-row Python UDFs
      → columnar output batches, byte-capped

Scale notes:
- Input batches are bounded by spark.sql.execution.arrow.maxRecordsPerBatch;
  output batches are flushed by BYTES (EXTRACT_FLUSH_BYTES) so one batch
  of giant pages cannot balloon executor memory.
- Every document is wrapped in try/except: a pathological page yields an
  error row instead of failing the task (at 10^12 docs, tail pages WILL
  be pathological).
- The kernel is iterative (no recursion) except CSS serialization;
  RecursionError is caught per-document.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernel.charset import decode_html
from ..kernel.extract import MAIN_CONTENT, PARITY, ExtractionProfile, extract
from ..kernel.tokenizer import DEFAULT_SPECIAL_TAGS, parse_html

EXTRACT_SCHEMA = (
    "url string, extracted_text string, "
    "spans array<struct<start:int,end:int>>, "
    "n_nodes int, n_text_nodes int, n_bytes bigint, "
    "parse_ms double, error string"
)

_PA_SPANS = pa.list_(pa.struct([("start", pa.int32()), ("end", pa.int32())]))
_PA_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("extracted_text", pa.string()),
    ("spans", _PA_SPANS),
    ("n_nodes", pa.int32()),
    ("n_text_nodes", pa.int32()),
    ("n_bytes", pa.int64()),
    ("parse_ms", pa.float64()),
    ("error", pa.string()),
])

# Flush output batches when accumulated text exceeds this many bytes.
EXTRACT_FLUSH_BYTES = 32 * 1024 * 1024


def _decode(b) -> str:
    if isinstance(b, (bytes, bytearray, memoryview)):
        return bytes(b).decode("utf-8", "replace")
    return b if isinstance(b, str) else ""


def _decode_sniffed(b, _decode_html=decode_html) -> str:
    """Charset-aware decode (kernel/charset): BOM → meta prescan →
    strict-utf-8 probe → cp1252 fallback.  The opt-in byte path for
    crawls that are not all-UTF-8; the default stays the plain utf-8
    decode so the parity corpus's byte counts/oracles are untouched.
    decode_html is bound at def time — no per-row module lookup in
    the mapInArrow hot loop."""
    if isinstance(b, (bytes, bytearray, memoryview)):
        return _decode_html(bytes(b))[0]
    return b if isinstance(b, str) else ""


# per-document node-count safety valve (10^12-doc tails contain
# pathological pages; a capped doc becomes an error row, not an OOM)
MAX_NODES_PER_DOC = 5_000_000


def _make_extract_fn(profile: ExtractionProfile,
                     sniff_charset: bool = False):
    decode = _decode_sniffed if sniff_charset else _decode

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        cols = {name: [] for name in _PA_SCHEMA.names}
        acc_bytes = 0

        def flush():
            nonlocal cols, acc_bytes
            out = pa.RecordBatch.from_pydict(
                {k: pa.array(v, type=_PA_SCHEMA.field(k).type)
                 for k, v in cols.items()},
                schema=_PA_SCHEMA)
            cols = {name: [] for name in _PA_SCHEMA.names}
            acc_bytes = 0
            return out

        for batch in batches:
            urls = batch.column("url").to_pylist()
            htmls = batch.column("html").to_pylist()
            for url, raw in zip(urls, htmls):
                html = decode(raw)
                n_bytes = len(raw) if raw is not None else 0
                t0 = time.perf_counter()
                try:
                    tree = parse_html(html, max_nodes=MAX_NODES_PER_DOC)
                    res = extract(tree, profile)
                    ms = (time.perf_counter() - t0) * 1e3
                    cols["url"].append(url)
                    cols["extracted_text"].append(res.text)
                    # res.spans is already a list of (start, end)
                    # tuples and pyarrow builds struct arrays from
                    # tuples directly — the per-span dict conversion
                    # was pure allocation overhead (80+ spans/page on
                    # the text-heavy bench corpus)
                    cols["spans"].append(res.spans)
                    cols["n_nodes"].append(res.n_nodes)
                    cols["n_text_nodes"].append(res.n_text_nodes)
                    cols["n_bytes"].append(n_bytes)
                    cols["parse_ms"].append(ms)
                    cols["error"].append(None)
                    acc_bytes += len(res.text) + n_bytes // 8
                except Exception as e:  # noqa: BLE001 — per-doc isolation
                    ms = (time.perf_counter() - t0) * 1e3
                    cols["url"].append(url)
                    cols["extracted_text"].append("")
                    cols["spans"].append([])
                    cols["n_nodes"].append(0)
                    cols["n_text_nodes"].append(0)
                    cols["n_bytes"].append(n_bytes)
                    cols["parse_ms"].append(ms)
                    cols["error"].append(f"{type(e).__name__}: {e}")
                if acc_bytes >= EXTRACT_FLUSH_BYTES:
                    yield flush()
        if cols["url"]:
            yield flush()

    return fn


def extract_documents(
    df: DataFrame,
    profile: ExtractionProfile = PARITY,
    salt_partitions: int | None = None,
    sniff_charset: bool = False,
) -> DataFrame:
    """documents(url, html, ...) → extracted(url, extracted_text, spans,
    stats).  Column pruning to (url, html) happens here so it reaches
    the scan; ``salt_partitions`` forces an explicit pre-UDF exchange on
    the (unique) url so giant pages spread across tasks instead of
    clustering in input-file order.  ``sniff_charset`` switches the
    byte→string step from plain utf-8 to the BOM/meta-prescan sniffer
    (kernel/charset) — the path for real crawls, where UTF-16 exports
    and meta-labelled 8-bit pages exist."""
    pruned = df.select("url", "html")
    if salt_partitions:
        pruned = pruned.repartition(salt_partitions, F.xxhash64("url"))
    return pruned.mapInArrow(
        _make_extract_fn(profile, sniff_charset=sniff_charset),
        EXTRACT_SCHEMA)


def extract_main_content(df: DataFrame, **kw) -> DataFrame:
    return extract_documents(df, profile=MAIN_CONTENT, **kw)


# ---- serialization round-trip ------------------------------------------------

ROUNDTRIP_SCHEMA = "url string, rt_len bigint, rt_sha256 string, error string"

_PA_RT = pa.schema([
    ("url", pa.string()), ("rt_len", pa.int64()),
    ("rt_sha256", pa.string()), ("error", pa.string()),
])


def _roundtrip_fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    import hashlib

    from ..kernel.serialize import to_html
    for batch in batches:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        cols = {name: [] for name in _PA_RT.names}
        for url, raw in zip(urls, htmls):
            cols["url"].append(url)
            try:
                t = parse_html(_decode(raw), max_nodes=MAX_NODES_PER_DOC)
                out = to_html(t).encode("utf-8")
                cols["rt_len"].append(len(out))
                cols["rt_sha256"].append(hashlib.sha256(out).hexdigest())
                cols["error"].append(None)
            except Exception as e:  # noqa: BLE001 — per-doc isolation
                cols["rt_len"].append(0)
                cols["rt_sha256"].append(None)
                cols["error"].append(f"{type(e).__name__}: {e}")
        if cols["url"]:
            yield pa.RecordBatch.from_pydict(
                {k: pa.array(v, type=_PA_RT.field(k).type)
                 for k, v in cols.items()},
                schema=_PA_RT)


def roundtrip_html(df: DataFrame) -> DataFrame:
    """documents(url, html) → (url, rt_len, rt_sha256): length and
    sha256 of serialize.to_html(parse_html(html)) — pins S1/S5/C12-C15
    under a byte-level oracle (the reference guarantees byte round-trip
    for the quoted-attribute subset, reference test/parser.test.js
    round-trip cases; for jhp pages the serialized form is itself a
    fixed template, see sources.documents.TPL_SPECIAL_SERIALIZED)."""
    return df.select("url", "html").mapInArrow(_roundtrip_fn,
                                               ROUNDTRIP_SCHEMA)


# ---- exploded nodes view ----------------------------------------------------

NODES_SCHEMA = (
    "url string, node_id int, parent_id int, subtree_end int, "
    "bfs_rank int, depth int, type string, name string, "
    "attrs map<string,string>, content string, comment_type string, "
    "style_block boolean, script_block boolean, css_selector string, "
    "css_name string, css_params string, "
    "css_declarations map<string,string>, src_start int, src_end int"
)

_PA_NODES = pa.schema([
    ("url", pa.string()), ("node_id", pa.int32()),
    ("parent_id", pa.int32()), ("subtree_end", pa.int32()),
    ("bfs_rank", pa.int32()), ("depth", pa.int32()),
    ("type", pa.string()), ("name", pa.string()),
    ("attrs", pa.map_(pa.string(), pa.string())),
    ("content", pa.string()), ("comment_type", pa.string()),
    ("style_block", pa.bool_()), ("script_block", pa.bool_()),
    ("css_selector", pa.string()), ("css_name", pa.string()),
    ("css_params", pa.string()),
    ("css_declarations", pa.map_(pa.string(), pa.string())),
    ("src_start", pa.int32()), ("src_end", pa.int32()),
])


# error-marker row values per column (type='error', content=message;
# NEVER drop a document silently: at 10^12 docs a pathological page
# must leave a trace)
_ERROR_ROW = {
    "node_id": 0, "parent_id": -1, "subtree_end": 0, "bfs_rank": 0,
    "depth": 0, "type": "error", "name": None, "attrs": None,
    "comment_type": None, "style_block": False, "script_block": False,
    "css_selector": None, "css_name": None, "css_params": None,
    "css_declarations": None, "src_start": 0, "src_end": 0,
}


def _sparse_list(sc, n: int) -> list:
    """SparseColumn → dense list (None-filled) without n dict probes."""
    out = [None] * n
    for k, v in sc.d.items():
        out[k] = v
    return out


def _make_nodes_fn(max_nodes: int,
                   special_tags: tuple[str, ...] | None = None,
                   columns: list[str] | None = None):
    special = (tuple(special_tags) if special_tags is not None
               else DEFAULT_SPECIAL_TAGS)
    names = list(_PA_NODES.names) if columns is None else list(columns)
    schema = pa.schema([_PA_NODES.field(c) for c in names])
    need = set(names)

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            urls = batch.column("url").to_pylist()
            htmls = batch.column("html").to_pylist()
            cols = {name: [] for name in names}
            for url, raw in zip(urls, htmls):
                try:
                    t = parse_html(_decode(raw), special,
                                   max_nodes=max_nodes)
                except Exception as e:  # noqa: BLE001 — per-doc isolation
                    for k in names:
                        cols[k].append(
                            url if k == "url"
                            else f"{type(e).__name__}: {e}"
                            if k == "content" else _ERROR_ROW[k])
                    continue
                # COLUMNAR emission: the FlatTree already is
                # struct-of-arrays, so each requested column is one
                # C-level list extend (or a single comprehension)
                # instead of 19 per-node appends — and unrequested
                # columns (incl. the per-doc BFS/depth Python passes)
                # are never computed.  Measured r6: full emission
                # 0.46s CPU for 200k nodes row-at-a-time vs
                # per-column extends; callers that prune (e.g.
                # nodes_type_counts needs only `type`) skip both the
                # build and the Arrow transport of 19-column rows.
                n = len(t.type)
                if "url" in need:
                    cols["url"].extend([url] * n)
                if "node_id" in need:
                    cols["node_id"].extend(range(n))
                if "parent_id" in need:
                    cols["parent_id"].extend(t.parent)
                if "subtree_end" in need:
                    cols["subtree_end"].extend(t.subtree_end())
                if "bfs_rank" in need:
                    bfs_rank = [0] * n
                    for rank, nid in enumerate(t.bfs_order(0)):
                        bfs_rank[nid] = rank
                    cols["bfs_rank"].extend(bfs_rank)
                if "depth" in need:
                    depth = [0] * n
                    parent = t.parent
                    for nid in range(1, n):
                        depth[nid] = depth[parent[nid]] + 1
                    cols["depth"].extend(depth)
                if "type" in need:
                    cols["type"].extend(t.type)
                if "name" in need:
                    cols["name"].extend(t.name)
                if "attrs" in need:
                    cols["attrs"].extend(
                        list(a.items()) if a is not None else None
                        for a in t.attrs)
                if "content" in need:
                    cols["content"].extend(t.content)
                if "comment_type" in need:
                    cols["comment_type"].extend(
                        _sparse_list(t.comment_type, n))
                if "style_block" in need:
                    cols["style_block"].extend(
                        (f & 1) != 0 for f in t.flags)
                if "script_block" in need:
                    cols["script_block"].extend(
                        (f & 2) != 0 for f in t.flags)
                if "css_selector" in need:
                    cols["css_selector"].extend(
                        _sparse_list(t.css_selector, n))
                if "css_name" in need:
                    cols["css_name"].extend(_sparse_list(t.css_name, n))
                if "css_params" in need:
                    cols["css_params"].extend(
                        _sparse_list(t.css_params, n))
                if "css_declarations" in need:
                    cols["css_declarations"].extend(
                        list(d.items()) if d is not None else None
                        for d in _sparse_list(t.css_decls, n))
                if "src_start" in need:
                    cols["src_start"].extend(t.src_start)
                if "src_end" in need:
                    cols["src_end"].extend(t.src_end)
            if cols[names[0]]:
                yield pa.RecordBatch.from_pydict(
                    {k: pa.array(v, type=schema.field(k).type)
                     for k, v in cols.items()},
                    schema=schema)

    return fn


# per-column DDL (split-safe: no NODES_SCHEMA type contains ', ')
_NODES_DDL = {
    s.strip().split(" ", 1)[0]: s.strip()
    for s in NODES_SCHEMA.split(", ")
}
assert list(_NODES_DDL) == list(_PA_NODES.names), _NODES_DDL


def parse_nodes(df: DataFrame, salt_partitions: int | None = None,
                max_nodes: int = MAX_NODES_PER_DOC,
                special_tags: tuple[str, ...] | None = None,
                columns: list[str] | None = None) -> DataFrame:
    """documents(url, html) → one row per SOM node (FIXTURES.md §3) —
    the SQL-queryable tree view used for oracle-checked operators.
    Unparseable / over-``max_nodes`` docs yield one type='error' marker
    row (silent data loss at 10^12 docs is not acceptable).
    ``special_tags`` is the reference constructor's only parameter
    (`/root/reference/src/simple-html-parser.js:37`) — tags whose
    content runs through the JS submachine instead of the tree
    builder; default ('jhp', 's_').

    ``columns`` prunes the EMITTED node view to the listed subset (in
    NODES_SCHEMA order recommended): Catalyst's column pruning cannot
    see into the Python stage, so an opaque mapInArrow otherwise
    builds and ships all 19 columns — including the per-document
    BFS-rank and depth passes — for a query that reads one of them
    (guide §4: pass only the columns the function needs; here the
    output side).  Values of the emitted columns are identical to the
    full view's."""
    pruned = df.select("url", "html")
    if salt_partitions:
        pruned = pruned.repartition(salt_partitions, F.xxhash64("url"))
    if columns is None:
        schema = NODES_SCHEMA
    else:
        unknown = [c for c in columns if c not in _NODES_DDL]
        if unknown:
            raise ValueError(f"unknown node columns: {unknown}")
        schema = ", ".join(_NODES_DDL[c] for c in columns)
    return pruned.mapInArrow(
        _make_nodes_fn(max_nodes, special_tags, columns), schema)
