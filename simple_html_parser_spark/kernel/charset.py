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
   `<!--…-->` comment spans inside the prescan window are skipped
   first (WHATWG prescan steps them over), so a commented-out label
   cannot mislabel the page.
3. unlabelled: strict UTF-8 probe; if the bytes decode cleanly the
   page IS utf-8 (source 'default').  On UnicodeDecodeError the page
   is a legacy 8-bit page and decodes as windows-1252 — WHATWG's
   de-facto web default — with source 'fallback'.

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

# comment spans are stepped over by the WHATWG prescan; an
# unterminated comment swallows the rest of the window
_COMMENT_SPAN = re.compile(rb"<!--.*?(?:-->|\Z)", re.DOTALL)


def _meta_label(b: bytes) -> str | None:
    window = _COMMENT_SPAN.sub(b"", b[:PRESCAN_BYTES])
    m = _META_CHARSET.search(window)
    if m:
        return m.group(1).decode("ascii", "replace").lower()
    return None


def sniff_charset(b: bytes) -> tuple[str, str]:
    """(encoding, source) for raw page bytes; source is one of
    'bom' | 'meta' | 'default' | 'fallback'.  The returned encoding
    is a normalized lowercase label (the canonical form the oracle
    pins), not necessarily the Python codec name — see
    :func:`decode_html`.  The unlabelled tier costs a strict utf-8
    probe over the full payload (the same work decode_html does)."""
    if b.startswith(b"\xef\xbb\xbf"):
        return "utf-8", "bom"
    if b.startswith(b"\xff\xfe"):
        return "utf-16le", "bom"
    if b.startswith(b"\xfe\xff"):
        return "utf-16be", "bom"
    label = _meta_label(b)
    if label is not None:
        # WHATWG "changing the encoding": a meta-sourced UTF-16 label
        # is mapped to UTF-8 — the prescan only SAW the label because
        # the bytes are ASCII-compatible, so the label cannot be true
        # (a real UTF-16 page declares itself via BOM, the tier above)
        if label.startswith("utf-16"):
            return "utf-8", "meta"
        return label, "meta"
    try:
        b.decode("utf-8")
        return "utf-8", "default"
    except UnicodeDecodeError:
        return "windows-1252", "fallback"


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
    (every byte maps), keeping the page extractable.  Unlabelled
    pages decode inline (strict utf-8, else cp1252) so the hot path
    never pays the probe twice."""
    if b.startswith(b"\xef\xbb\xbf"):
        return b[3:].decode("utf-8", "replace"), "utf-8", "bom"
    if b.startswith(b"\xff\xfe"):
        return b[2:].decode("utf-16-le", "replace"), "utf-16le", "bom"
    if b.startswith(b"\xfe\xff"):
        return b[2:].decode("utf-16-be", "replace"), "utf-16be", "bom"
    label = _meta_label(b)
    if label is not None:
        enc = "utf-8" if label.startswith("utf-16") else label
        codec = _codec_for(enc)
        if codec is None:
            return b.decode("iso-8859-1", "replace"), enc, "meta"
        return b.decode(codec, "replace"), enc, "meta"
    try:
        return b.decode("utf-8"), "utf-8", "default"
    except UnicodeDecodeError:
        # cp1252's five unmapped bytes (0x81 8D 8F 90 9D) still hit
        # errors='replace'; every other byte maps
        return b.decode("cp1252", "replace"), "windows-1252", "fallback"
