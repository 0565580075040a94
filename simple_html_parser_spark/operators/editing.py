"""Scripted DOM-edit pipeline over the corpus — puts the manipulation
(M1-M8) and attribute-write (A2-A4) operator families under the
driver's byte-level oracle.

``EDIT_STEPS`` is a fixed edit script executed per document through
the SAME selector-driven machinery the differential goldens use
(kernel/compat._run_mutation, step-for-step mirrored by
tools/ref_dump.mjs against the reference — reference entry points:
node.js setAttribute/updateAttribute/removeAttribute,
createNode/appendChild/insertBefore/insertAfter/insertAdjacentHTML/
replaceWith/remove).  On the fixed main template the edited page
serializes to a CLOSED-FORM template of (doc_id, text, lang, source),
so DuckDB can verify the whole parse→query→mutate→serialize pipeline
per url without executing any of it.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame

from ..kernel.compat import _run_mutation
from ..kernel.tokenizer import parse_html
from .extraction import MAX_NODES_PER_DOC, _decode

# One step per op family; order chosen so moves happen before removes.
# A2 set / A4 update / A3 remove attribute; M6 replaceWith (new node =
# M1 create); M1+M2 create+append; M3 insertBefore (move); M4
# insertAfter (move); M5 insertAdjacentHTML; M7 remove (M8 extract is
# exercised internally by every move).
EDIT_STEPS: tuple[dict, ...] = (
    {"act": "set_attr", "sel": ".main", "index": 0,
     "name": "data-k", "value": "v1"},
    {"act": "update_attr", "sel": "nav", "index": 0,
     "name": "class", "value": "topx"},
    {"act": "remove_attr", "sel": "a", "index": 2, "name": "href"},
    {"act": "replace_with_new", "sel": "title", "index": 0,
     "tag": "span", "text": "T"},
    {"act": "create_append", "sel": "main", "index": 0,
     "tag": "p", "attrs": {"class": "x"}, "text": "tail"},
    {"act": "insert_before_sel", "sel": "p", "index": 0,
     "node_sel": "h1", "node_index": 0},
    {"act": "insert_after_sel", "sel": "main", "index": 0,
     "node_sel": "aside", "node_index": 0},
    {"act": "iah", "sel": "main", "index": 0,
     "position": "afterend", "html": "<em>z</em>"},
    {"act": "remove", "sel": "footer", "index": 0},
)

EDIT_SCHEMA = "url string, ed_len bigint, ed_sha256 string, error string"

_PA_EDIT = pa.schema([
    ("url", pa.string()), ("ed_len", pa.int64()),
    ("ed_sha256", pa.string()), ("error", pa.string()),
])


def _edit_fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    import hashlib
    for batch in batches:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        cols = {name: [] for name in _PA_EDIT.names}
        for url, raw in zip(urls, htmls):
            cols["url"].append(url)
            try:
                t = parse_html(_decode(raw), max_nodes=MAX_NODES_PER_DOC)
                out = _run_mutation(t, list(EDIT_STEPS))["html"] \
                    .encode("utf-8")
                cols["ed_len"].append(len(out))
                cols["ed_sha256"].append(hashlib.sha256(out).hexdigest())
                cols["error"].append(None)
            except Exception as e:  # noqa: BLE001 — per-doc isolation
                cols["ed_len"].append(0)
                cols["ed_sha256"].append(None)
                cols["error"].append(f"{type(e).__name__}: {e}")
        if cols["url"]:
            yield pa.RecordBatch.from_pydict(
                {k: pa.array(v, type=_PA_EDIT.field(k).type)
                 for k, v in cols.items()},
                schema=_PA_EDIT)


def edit_roundtrip(df: DataFrame) -> DataFrame:
    """documents(url, html) → (url, ed_len, ed_sha256): sha256+length
    of to_html after applying EDIT_STEPS."""
    return df.select("url", "html").mapInArrow(_edit_fn, EDIT_SCHEMA)
