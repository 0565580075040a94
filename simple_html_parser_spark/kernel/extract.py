"""Main-content extraction over a parsed FlatTree.

The reference repo has no extraction layer — this spec is FROZEN here
(FIXTURES.md §6) and mirrored verbatim in tools/ref_dump.mjs, which
runs it over the REFERENCE parser's tree; byte-identical output per url
is therefore a cross-runtime equivalence test of the tree semantics
(BASELINE.json north_rule: "matching the reference's extracted
text/spans per document").

Two profiles:

- ``parity``: DFS document-order text collection, skipping
  (a) styleBlock subtrees (CSS children, never text),
  (b) scriptBlock subtrees (special-tag JS text),
  (c) subtrees of blacklisted elements (case-insensitive tag match),
  keeping every text node with at least one non-JS-whitespace char,
  concatenated verbatim.  This is the golden-gated flagship output.

- ``main_content``: parity candidates grouped into nearest block-level
  ancestor; a block is kept when its total trimmed text length ≥
  ``min_block_chars`` AND its link-text density ≤ ``max_link_density``
  (boilerplate nav/footer lists are link-dense).  Deterministic,
  golden-gated through the same JS mirror.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .jsre import JS_WS_SET, js_trim
from .tree import TAG_OPEN, TEXT, FlatTree

# Frozen extraction blacklist (FIXTURES.md §6).
BLACKLIST = frozenset((
    "script", "style", "noscript", "template", "head", "nav",
    "footer", "aside", "iframe", "svg",
))

# Block-level grouping tags for the density profile.
BLOCK_TAGS = frozenset((
    "div", "p", "article", "section", "main", "td", "th", "li",
    "blockquote", "pre", "body", "h1", "h2", "h3", "h4", "h5", "h6",
))


@dataclass(frozen=True)
class ExtractionProfile:
    mode: str = "parity"  # 'parity' | 'density'
    blacklist: frozenset = field(default=BLACKLIST)
    block_tags: frozenset = field(default=BLOCK_TAGS)
    min_block_chars: int = 20
    max_link_density: float = 0.5


PARITY = ExtractionProfile(mode="parity")
MAIN_CONTENT = ExtractionProfile(mode="density")


@dataclass
class ExtractResult:
    text: str
    spans: list[tuple[int, int]]
    n_nodes: int
    n_text_nodes: int


def _parity_candidates(tree: FlatTree, profile: ExtractionProfile):
    """Document-order kept text node ids — the shared candidate walk
    for BOTH profiles (r5: the density path's per-node
    (nid, ancestor) tuple bookkeeping was dead weight — the ancestor
    was never consumed; _density_filter derives block/link ancestry
    via its own memoised chain walks)."""
    out: list[int] = []
    ap = out.append
    children = tree.children
    ttype = tree.type
    tname = tree.name
    content = tree.content
    flags = tree.flags
    blacklist = profile.blacklist
    stack = [0]
    # children are pushed reversed via ONE C-level extend of a slice
    # copy instead of a per-child Python push loop — identical visit
    # order, measured x1.7 on the candidate walk (r6 paired CPU A/B,
    # median of 7 interleaved pairs on the text-heavy bench pages)
    ext = stack.extend
    pop = stack.pop
    while stack:
        nid = pop()
        ty = ttype[nid]
        if ty == TEXT:
            c = content[nid]
            if c and (c[0] not in JS_WS_SET or js_trim(c) != ""):
                ap(nid)
            continue
        if ty == TAG_OPEN and (
                flags[nid] & 3 or tname[nid].lower() in blacklist):
            continue
        kids = children[nid]
        if kids:
            ext(kids[::-1])
    return out


def extract(
    tree: FlatTree, profile: ExtractionProfile = PARITY
) -> ExtractResult:
    if profile.mode == "parity":
        kept_ids = _parity_candidates(tree, profile)
        n_text_nodes = len(kept_ids)
    else:
        cands = _parity_candidates(tree, profile)
        n_text_nodes = len(cands)
        kept_ids = cands if not cands else _density_filter(
            tree, cands, profile)

    content = tree.content
    text = "".join(map(content.__getitem__, kept_ids))
    src_start = tree.src_start
    src_end = tree.src_end
    spans = [
        (src_start[nid], src_end[nid]) for nid in kept_ids
        if src_start[nid] >= 0
    ]
    return ExtractResult(
        text=text, spans=spans,
        n_nodes=len(tree.type), n_text_nodes=n_text_nodes,
    )


def _nearest(tree: FlatTree, nid: int, names: frozenset) -> int:
    """Nearest ancestor tag-open whose lowercased name is in ``names``
    (walks the structural parent chain); -1 if none."""
    p = tree.parent[nid]
    while p >= 0:
        if tree.type[p] == TAG_OPEN and tree.name[p].lower() in names:
            return p
        p = tree.parent[p]
    return -1


def _nearest_memo(
    tree: FlatTree, nid: int, names: frozenset, cache: dict
) -> int:
    """``_nearest`` with a per-call-site memo over ancestor node ids.

    ``cache[e]`` = nearest tag-open in ``names`` at-or-above element
    ``e`` (-1 if none).  Candidates in one document share ancestor
    chains, so the naive walk is O(candidates × depth) with a
    ``str.lower`` per step; memoised it is O(elements) total — on
    real crawl pages (depth 15-25, thousands of text nodes) this is
    the difference between ~40k and ~2k chain steps per document.
    Pure lookup reordering: returns exactly ``_nearest``'s value."""
    p = tree.parent[nid]
    path = []
    ttype = tree.type
    tname = tree.name
    tparent = tree.parent
    while p >= 0:
        hit = cache.get(p)
        if hit is not None:
            break
        if ttype[p] == TAG_OPEN and tname[p].lower() in names:
            hit = p
            break
        path.append(p)
        p = tparent[p]
    else:
        hit = -1
    for e in path:
        cache[e] = hit
    if p >= 0:
        cache[p] = hit
    return hit


_A = frozenset(("a",))


def _density_filter(
    tree: FlatTree, cands: list[int],
    profile: ExtractionProfile,
) -> list[int]:
    # Group candidates by nearest block ancestor; aggregate text and
    # link-text character counts per block.  Sibling text nodes share
    # a parent, so the memo's answer for parent[nid] is usually
    # already cached — the dict .get fast path below skips the
    # _nearest_memo call frame for that common case (r5; identical
    # values by construction: the memo caches every visited element).
    block_of: list[int] = []
    text_chars: dict[int, int] = {}
    link_chars: dict[int, int] = {}
    block_cache: dict[int, int] = {}
    link_cache: dict[int, int] = {}
    tparent = tree.parent
    content = tree.content
    block_tags = profile.block_tags
    bc_get = block_cache.get
    lc_get = link_cache.get
    for nid in cands:
        p = tparent[nid]
        block = bc_get(p)
        if block is None:
            block = _nearest_memo(tree, nid, block_tags, block_cache)
        block_of.append(block)
        # frozen-spec length = Unicode CODE POINTS (a JS .length would
        # count astral chars twice; the harness mirror uses Array.from)
        n = len(js_trim(content[nid]))
        text_chars[block] = text_chars.get(block, 0) + n
        link_anc = lc_get(p)
        if link_anc is None:
            link_anc = _nearest_memo(tree, nid, _A, link_cache)
        # link text only counts if the <a> is inside the block
        if link_anc != -1 and (block == -1 or link_anc > block):
            link_chars[block] = link_chars.get(block, 0) + n
    kept_blocks = {
        b for b, tc in text_chars.items()
        if tc >= profile.min_block_chars
        and link_chars.get(b, 0) <= profile.max_link_density * tc
    }
    return [
        nid for nid, b in zip(cands, block_of) if b in kept_blocks
    ]
