"""Serialization: node tree → HTML / CSS strings.

Semantics-identical to the reference serializers:
- toHtml / toString / innerHtml / outerHtml / getTag
  (/root/reference/src/node.js:1324-1335, 1367-1403, 1721-1725,
  1921-1978)
- cssToString + private buildCssRule / buildCssAtRule / cssTreeToString
  (/root/reference/src/node.js:281-398, 707-902)

The HTML walk is iterative (the reference recurses, node.js:1952; a
100 TB crawl contains pathologically deep trees that would overflow a
Python executor stack).  The CSS builders recurse like the reference —
CSS nesting depth is parser-bounded and shallow in practice; the Spark
boundary catches RecursionError per document.

Replicated quirks: ``__EMPVAL__`` attributes serialize as bare names
(node.js:1327-1331); styleBlock children are serialized as CSS prefixed
with a newline (node.js:1948-1949); at-rules nested inside a css-rule
are DROPPED by buildCssRule (node.js:353 only handles css-rule
children); output is trimEnd'ed with the JS whitespace set.
"""

from __future__ import annotations

from .jsre import JS_WS_CHARS, js_entries
from .tree import (
    COMMENT, CSS_AT_RULE, CSS_RULE, TAG_CLOSE, TAG_OPEN, TEXT, FlatTree,
)

_STATEMENT_AT_RULES = ("import", "charset", "namespace")

_DEFAULT_CSS_OPTS = {
    "includeComments": False,
    "includeNestedRules": True,
    "flattenNested": False,
    "includeBraces": True,
    "includeSelector": True,
    "combineDeclarations": True,
    "singleLine": False,
    "indent": 0,
}


def attrs_string(attrs: dict | None) -> str:
    """#getNodeAttributesString (node.js:1324-1335)."""
    if not attrs:
        return ""
    parts = []
    for key, value in js_entries(attrs):
        if value == "__EMPVAL__":
            parts.append(f" {key}")
        else:
            parts.append(f' {key}="{value}"')
    return "".join(parts)


def format_comment(content: str, comment_type: str | None) -> str:
    ct = comment_type or "html-comment"
    if ct == "js-single-line":
        return f"//{content}"
    if ct == "js-multi-line":
        return f"/*{content}*/"
    return f"<!--{content}-->"


def get_tag(tree: FlatTree, nid: int) -> str:
    """Single node's own markup without children (node.js:1367-1389)."""
    ty = tree.type[nid]
    if ty == TEXT:
        return tree.content[nid]
    if ty == COMMENT:
        return format_comment(tree.content[nid], tree.comment_type[nid])
    if ty in (TAG_OPEN, TAG_CLOSE):
        return f"<{tree.name[nid]}{attrs_string(tree.attrs[nid])}>"
    return ""


def to_html(tree: FlatTree, nid: int = 0, show_comments: bool = False) -> str:
    """node.toHtml(showComments) (node.js:1921-1970), iterative."""
    parts: list[str] = []
    # bare node-id stack: close tags are SEPARATE sibling nodes in the
    # FlatTree, so no deferred-literal entries are ever needed — the
    # former (kind, v) tuple encoding allocated one tuple per visited
    # node for a dead branch; children push via one C-level extend of
    # a reversed slice (identical visit order)
    stack: list[int] = [nid]
    ext = stack.extend
    children = tree.children
    ttype = tree.type
    # manipulation can create cycles (appendChild of an ancestor — the
    # reference stack-overflows there); bound the walk instead of
    # spinning forever
    budget = 4 * len(ttype) + 1048576
    while stack:
        budget -= 1
        if budget < 0:
            raise RuntimeError("serialization cycle / runaway tree")
        v = stack.pop()
        ty = ttype[v]
        if ty == TEXT:
            parts.append(tree.content[v])
        elif ty == COMMENT:
            if show_comments:
                parts.append(
                    format_comment(tree.content[v], tree.comment_type[v]))
        elif ty == TAG_OPEN:
            parts.append(f"<{tree.name[v]}{attrs_string(tree.attrs[v])}>")
            kids = children[v]
            if tree.is_style_block(v) and kids:
                parts.append("\n" + css_tree_to_string(tree, kids, 0))
            elif kids:
                ext(kids[::-1])
        elif ty == TAG_CLOSE:
            parts.append(f"</{tree.name[v]}>")
        else:
            # root / css-root / css-rule / css-at-rule: children concat
            kids = children[v]
            if kids:
                ext(kids[::-1])
    return "".join(parts)


def inner_html(tree: FlatTree, nid: int, show_comments: bool = False) -> str:
    """Children's HTML without the node's own tags (node.js:1396-1403)."""
    return "".join(
        to_html(tree, c, show_comments) for c in tree.children[nid])


def outer_html(tree: FlatTree, nid: int, show_comments: bool = False) -> str:
    return to_html(tree, nid, show_comments)


def to_string(tree: FlatTree, nid: int = 0) -> str:
    """toString ≡ toHtml(true) (node.js:1976-1978)."""
    return to_html(tree, nid, True)


# ---- CSS serialization ----------------------------------------------------


def css_to_string(
    tree: FlatTree,
    nodes: list[int] | int | None = None,
    context: int = 0,
    **options,
) -> str:
    """cssToString (node.js:707-870).

    ``nodes`` — css node id(s) to convert; None reproduces the no-args
    form: find all <style> tags under ``context`` (document order — the
    reference uses querySelectorAll whose BFS ordering is equivalent for
    the flat 'style' selector... it is BFS; see note) and convert all
    their children.
    """
    if nodes is None:
        # reference: this.querySelectorAll('style') → BFS order.
        from .selector import query_selector_all  # lazy: avoid cycle
        style_tags = query_selector_all(tree, context, "style")
        if style_tags:
            node_list = [c for s in style_tags for c in tree.children[s]]
        else:
            node_list = list(tree.children[context]) or [context]
    elif isinstance(nodes, int):
        node_list = [nodes]
    else:
        node_list = list(nodes)

    opts = dict(_DEFAULT_CSS_OPTS)
    opts.update(options)

    include_comments = opts["includeComments"]
    include_nested = opts["includeNestedRules"]
    combine = opts["combineDeclarations"]
    single_line = opts["singleLine"]
    indent = opts["indent"]

    result = ""
    if combine:
        emitted: set[str] = set()
        rules_by_selector: dict[str, list[int]] = {}
        for nid in node_list:
            if tree.type[nid] == CSS_RULE:
                rules_by_selector.setdefault(
                    tree.css_selector[nid], []).append(nid)
        for nid in node_list:
            ty = tree.type[nid]
            if ty == CSS_RULE:
                selector = tree.css_selector[nid]
                if selector in emitted:
                    continue
                emitted.add(selector)
                combined: dict = {}
                nested: list[int] = []
                for r in rules_by_selector[selector]:
                    if tree.css_decls[r]:
                        combined.update(tree.css_decls[r])
                    if include_nested and tree.children[r] and not nested:
                        nested.extend(
                            c for c in tree.children[r]
                            if tree.type[c] in (CSS_RULE, CSS_AT_RULE))
                result += _build_css_rule(tree, selector, combined,
                                          nested, opts)
                if not single_line:
                    result += "\n"
            elif (ty == COMMENT and tree.comment_type[nid] == "css"
                  and include_comments):
                spaces = "" if single_line else " " * indent
                result += f"{spaces}/*{tree.content[nid]}*/"
                if not single_line:
                    result += "\n"
            elif ty == CSS_AT_RULE:
                result += _build_css_at_rule(tree, nid, opts)
                if not single_line:
                    result += "\n"
        return result.rstrip(JS_WS_CHARS)

    for nid in node_list:
        ty = tree.type[nid]
        if ty == CSS_RULE:
            nested = [
                c for c in tree.children[nid]
                if tree.type[c] in (CSS_RULE, CSS_AT_RULE)
            ] if include_nested else []
            result += _build_css_rule(
                tree, tree.css_selector[nid], tree.css_decls[nid] or {},
                nested, opts)
            if not single_line:
                result += "\n"
        elif (ty == COMMENT and tree.comment_type[nid] == "css"
              and include_comments):
            spaces = "" if single_line else " " * indent
            result += f"{spaces}/*{tree.content[nid]}*/"
            if not single_line:
                result += "\n"
        elif ty == CSS_AT_RULE:
            result += _build_css_at_rule(tree, nid, opts)
            if not single_line:
                result += "\n"
    return result.rstrip(JS_WS_CHARS)


def _build_css_rule(
    tree: FlatTree, selector: str, declarations: dict,
    nested_children: list[int], opts: dict,
) -> str:
    """#buildCssRule (node.js:308-398)."""
    include_braces = opts["includeBraces"]
    include_selector = opts["includeSelector"]
    include_nested = opts["includeNestedRules"]
    flatten = opts["flattenNested"]
    single_line = opts["singleLine"]
    indent = opts["indent"]

    spaces = "" if single_line else " " * indent
    newline = " " if single_line else "\n"
    result = ""

    if include_selector and selector:
        result += f"{spaces}{selector}"
    if include_braces:
        result += f" {{{newline}" if (include_selector and selector) \
            else f"{{{newline}"

    decl_indent = indent + 4 if (include_braces and not single_line) \
        else indent
    decl_spaces = "" if single_line else " " * decl_indent

    entries = js_entries(declarations)
    for i, (prop, value) in enumerate(entries):
        if single_line:
            result += f"{prop}: {value};"
            if i < len(entries) - 1 or nested_children:
                result += " "
        else:
            result += f"{decl_spaces}{prop}: {value};{newline}"

    if include_nested and nested_children:
        for nested in nested_children:
            if tree.type[nested] != CSS_RULE:
                continue  # nested at-rules dropped (node.js:353)
            nested_decls = tree.css_decls[nested] or {}
            nested_nested = [
                c for c in tree.children[nested]
                if tree.type[c] in (CSS_RULE, CSS_AT_RULE)
            ]
            if flatten:
                full = f"{selector} {tree.css_selector[nested]}"
                if not single_line:
                    result += "\n"
                result += _build_css_rule(
                    tree, full, nested_decls, nested_nested,
                    {**opts, "indent": indent})
            else:
                result += _build_css_rule(
                    tree, tree.css_selector[nested], nested_decls,
                    nested_nested, {**opts, "indent": decl_indent})
            if not single_line:
                result += "\n"

    if include_braces:
        result += " }" if single_line else f"{spaces}}}"
    return result


def _build_css_at_rule(tree: FlatTree, nid: int, opts: dict) -> str:
    """#buildCssAtRule (node.js:281-302)."""
    single_line = opts["singleLine"]
    indent = opts["indent"]
    spaces = "" if single_line else " " * indent
    newline = " " if single_line else "\n"
    name = tree.css_name[nid] or ""
    params = (tree.css_params[nid] or "").strip(JS_WS_CHARS)

    if name in _STATEMENT_AT_RULES:
        return f"{spaces}@{name}{' ' + params if params else ''};"

    indent_level = indent // 4
    body = css_tree_to_string(tree, tree.children[nid], indent_level + 1) \
        if tree.children[nid] else ""

    head = f"{spaces}@{name}{' ' + params if params else ''}"
    if single_line:
        return f"{head} {{{body}}}"
    return f"{head} {{{newline}{body}{newline}{spaces}}}"


def css_tree_to_string(
    tree: FlatTree, css_nodes: list[int], indent: int = 0
) -> str:
    """#cssTreeToString (node.js:880-902) — used by toHtml for
    styleBlock children."""
    css = ""
    for nid in css_nodes:
        ty = tree.type[nid]
        if ty in (CSS_RULE, CSS_AT_RULE):
            css += css_to_string(
                tree, nid,
                includeNestedRules=True,
                includeBraces=True,
                includeSelector=True,
                combineDeclarations=False,
                indent=indent * 4,
            )
            css += "\n"
        elif ty == COMMENT and tree.comment_type[nid] == "css":
            css += f"{' ' * (indent * 4)}/*{tree.content[nid]}*/\n"
        elif tree.children[nid]:
            css += css_tree_to_string(tree, tree.children[nid], indent)
    return css


# ---- visualize (S6, node.js:2009-2148) -------------------------------------


def visualize(
    tree: FlatTree, nid: int = 0,
    content_preview_length: int = 20,
    show_attributes: bool = True,
    show_content: bool = True,
    show_node_number: bool = False,
    show_node_type: bool = False,
) -> str:
    """ASCII box-drawing tree (reference visualize with
    returnString=true).  css-* node types get empty labels, exactly
    like the reference's unhandled branches."""
    from .jsre import js_trim
    from .tree import COMMENT as _C, ROOT as _R, TAG_CLOSE as _TC, \
        TAG_OPEN as _TO, TEXT as _T

    def preview(content: str) -> str:
        if not content or not show_content:
            return ""
        trimmed = js_trim(content)
        if not trimmed:
            return ""
        if len(trimmed) > content_preview_length:
            return f': "{trimmed[:content_preview_length - 3]}..."'
        return f': "{trimmed}"'

    def fmt_attrs(attrs: dict | None) -> str:
        if not show_attributes or not attrs:
            return ""
        return " " + " ".join(
            k if v == "__EMPVAL__" else f'{k}="{v}"'
            for k, v in js_entries(attrs))

    def label(n: int, is_root_call: bool) -> str:
        ty = tree.type[n]
        if is_root_call and ty == _R:
            return "ROOT"
        if ty == _T:
            return f"TEXT{preview(tree.content[n])}"
        if ty == _C:
            ct = f" ({tree.comment_type[n]})" if tree.comment_type[n] \
                else ""
            return f"COMMENT{ct}{preview(tree.content[n])}"
        if ty == _TO:
            return f"<{tree.name[n]}{fmt_attrs(tree.attrs[n])}>"
        if ty == _TC:
            return f"</{tree.name[n]}>"
        return ""

    counter = 0

    def decorate(n: int, base: str) -> str:
        nonlocal counter
        out = base
        if show_node_type:
            out += f" ({tree.type[n]}"
            if tree.is_script_block(n):
                out += ", script-block"
            out += ")"
        if show_node_number:
            out += f" [{counter}]"
            counter += 1
        return out

    def walk(n: int, prefix: str, is_last: bool, parents: tuple):
        lines.append(decorate(
            n, "".join(parents) + prefix + label(n, False)))
        ckids = tree.children[n]
        if ckids:
            nxt = parents + (("    " if is_last else "│   "),)
            for i, c in enumerate(ckids):
                clast = i == len(ckids) - 1
                walk(c, "└── " if clast else "├── ", clast, nxt)

    lines: list[str] = [decorate(nid, label(nid, True))]
    for i, c in enumerate(tree.children[nid]):
        last = i == len(tree.children[nid]) - 1
        walk(c, "└── " if last else "├── ", last, ())
    return "\n".join(lines) + "\n"
