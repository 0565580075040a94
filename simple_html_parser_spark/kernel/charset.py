"""Charset sniffing + decoding for raw crawl bytes.

A 10^12-page crawl is NOT all UTF-8: real WARC payloads carry BOMs,
UTF-16 exports, and legacy 8-bit pages whose only label is a `<meta`
tag.  The reference parser takes a JS string and never sees bytes
(`/root/reference/src/simple-html-parser.js:54` — `parse(html)` on an
already-decoded string), so the byte→string step is this engine's
responsibility.  The sniffer follows the WHATWG encoding-sniff
algorithm's first two tiers (public spec), simplified:

1. BOM: UTF-8 / UTF-16LE / UTF-16BE byte-order marks win outright.
2. meta prescan: the first 1024 BYTES are scanned for
   `<meta ... charset=...>` (both the HTML5 attribute and the legacy
   `http-equiv Content-Type` form match the same pattern).
3. default: UTF-8.

Decoding always uses errors="replace" (a mojibake page must yield an
extractable row, never a task failure) and falls back to latin-1 —
which maps every byte — if the labelled codec is unknown to Python.
"""

from __future__ import annotations

import codecs
import re

# charset label inside the first-1024-byte prescan window.  Matches
# <meta charset=X> and <meta http-equiv=... content="text/html;
# charset=X"> alike by keying on the `charset=` token itself.
_META_CHARSET = re.compile(
    rb"""<meta[^>]{0,512}?charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]{1,40})""",
    re.IGNORECASE | re.DOTALL,
)

# common crawl-era label aliases → Python codec names
_ALIASES = {
    "iso-8859-1": "iso-8859-1",
    "latin-1": "iso-8859-1",
    "latin1": "iso-8859-1",
    "windows-1252": "cp1252",
    "cp1252": "cp1252",
    "utf8": "utf-8",
    "utf-8": "utf-8",
    "utf-16": "utf-16",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
    "us-ascii": "ascii",
    "ascii": "ascii",
    "shift_jis": "shift_jis",
    "shift-jis": "shift_jis",
    "euc-jp": "euc_jp",
    "gb2312": "gb2312",
    "gbk": "gbk",
    "big5": "big5",
    "koi8-r": "koi8_r",
}

PRESCAN_BYTES = 1024


def sniff_charset(b: bytes) -> tuple[str, str]:
    """(encoding, source) for raw page bytes; source is one of
    'bom' | 'meta' | 'default'.  The returned encoding is a
    normalized lowercase label (the canonical form the oracle pins),
    not necessarily the Python codec name — see :func:`decode_html`.
    """
    if b.startswith(b"\xef\xbb\xbf"):
        return "utf-8", "bom"
    if b.startswith(b"\xff\xfe"):
        return "utf-16le", "bom"
    if b.startswith(b"\xfe\xff"):
        return "utf-16be", "bom"
    m = _META_CHARSET.search(b[:PRESCAN_BYTES])
    if m:
        label = m.group(1).decode("ascii", "replace").lower()
        # WHATWG "changing the encoding": a meta-sourced UTF-16 label
        # is mapped to UTF-8 — the prescan only SAW the label because
        # the bytes are ASCII-compatible, so the label cannot be true
        # (a real UTF-16 page declares itself via BOM, the tier above)
        if label.startswith("utf-16"):
            return "utf-8", "meta"
        return label, "meta"
    return "utf-8", "default"


def _codec_for(label: str) -> str | None:
    name = _ALIASES.get(label, label)
    try:
        codecs.lookup(name)
        return name
    except LookupError:
        return None


def decode_html(b: bytes) -> tuple[str, str, str]:
    """(text, encoding, source): sniff, strip the BOM, decode with
    errors='replace'.  An unknown meta label falls back to latin-1
    (every byte maps), keeping the page extractable."""
    enc, src = sniff_charset(b)
    if src == "bom":
        if enc == "utf-8":
            b = b[3:]
        else:
            b = b[2:]
    codec = _codec_for(enc)
    if codec is None:
        return b.decode("iso-8859-1", "replace"), enc, src
    return b.decode(codec, "replace"), enc, src
