"""Cross-runtime comparison facade.

Produces the normalized tree-dump / op-result shapes that
tools/ref_dump.mjs produces from the reference parser, so pytest can
assert byte-level equivalence (the correctness gate: extracted text and
tree semantics byte-identical per url, BASELINE.json `north_rule`).
"""

from __future__ import annotations

from . import cssquery, selector, serialize
from .tokenizer import DEFAULT_SPECIAL_TAGS, parse_html
from .tree import FlatTree


def dump_tree(tree: FlatTree) -> list[dict]:
    out = []
    for nid in tree.iter_preorder(0):
        attrs = tree.attrs[nid]
        out.append({
            "parent": tree.parent[nid],
            "type": tree.type[nid],
            "name": tree.name[nid],
            "attrs": attrs if attrs else None,
            "content": tree.content[nid],
            "comment_type": tree.comment_type[nid],
            "style_block": tree.is_style_block(nid),
            "script_block": tree.is_script_block(nid),
            "css_selector": tree.css_selector[nid],
            "css_name": tree.css_name[nid],
            "css_params": tree.css_params[nid],
            "css_decls": tree.css_decls[nid],
        })
    return out


def run_op(tree: FlatTree, op: dict):
    ctx = op.get("ctx", 0)
    name = op["op"]
    if name == "extract":
        from .extract import ExtractionProfile, extract
        if op.get("mode") == "density":
            profile = ExtractionProfile(
                mode="density",
                min_block_chars=op.get("min_block_chars", 20),
                max_link_density=op.get("max_link_density", 0.5),
            )
        else:
            profile = ExtractionProfile(mode="parity")
        r = extract(tree, profile)
        return {"text": r.text, "n_text_nodes": r.n_text_nodes}
    if name == "qsa":
        return selector.query_selector_all(tree, ctx, op["sel"])
    if name == "qs":
        return selector.query_selector(tree, ctx, op["sel"])
    if name == "find_by_attr":
        return selector.find_all_by_attr(tree, ctx, op["name"])
    if name == "find_by_tag":
        return selector.find_all_by_tag(tree, ctx, op["name"])
    if name == "find_by_type":
        return selector.find_all_by_type(tree, ctx, op["name"])
    if name == "nodes_by_type":
        return selector.get_nodes_by_type(tree, ctx, op["name"])
    if name == "comments":
        return [
            {"content": c.get("content"),
             "commentType": c.get("commentType"),
             "node": c["node"]}
            for c in selector.get_comments(tree, ctx)
        ]
    if name == "get_tag":
        return serialize.get_tag(tree, ctx)
    if name == "inner_html":
        return serialize.inner_html(tree, ctx, bool(op.get("comments")))
    if name == "outer_html":
        return serialize.outer_html(tree, ctx, bool(op.get("comments")))
    if name == "node_to_html":
        return serialize.to_html(tree, ctx, bool(op.get("comments")))
    if name == "get_attribute":
        return selector.get_attribute(tree, ctx, op["name"])
    if name == "css_to_string":
        return serialize.css_to_string(
            tree, None, context=ctx, **(op.get("options") or {}))
    if name == "css_to_string_nodes":
        return serialize.css_to_string(
            tree, op["node_ids"], context=ctx, **(op.get("options") or {}))
    if name == "css_find_rules":
        o = op.get("options") or {}
        rules = cssquery.css_find_rules(
            tree, ctx, op["sel"],
            include_compound=o.get("includeCompound", True),
            shallow=o.get("shallow", False),
        )
        if o.get("shallow"):
            return [
                {"selector": tree.css_selector[r],
                 "decls": tree.css_decls[r],
                 "n_children": len(tree.children[r])}
                for r in rules
            ]
        return rules
    if name == "css_find_at_rules":
        return cssquery.css_find_at_rules(tree, ctx, op.get("name"))
    if name == "css_find_variable":
        return cssquery.css_find_variable(tree, ctx, op["name"])
    if name == "css_find_variables":
        return [
            {"name": v["name"], "value": v["value"], "scope": v["scope"]}
            for v in cssquery.css_find_variables(
                tree, ctx, include_root=bool(op.get("includeRoot")))
        ]
    raise ValueError(f"unknown op {name}")


def run_case(case: dict) -> dict:
    """Mirror of the JS harness result for one {id, html, special_tags?,
    ops?} case."""
    special = tuple(case.get("special_tags") or DEFAULT_SPECIAL_TAGS)
    tree = parse_html(case["html"], special)
    ops_out = []
    for op in case.get("ops") or []:
        try:
            ops_out.append({"ok": run_op(tree, op)})
        except Exception as e:  # noqa: BLE001 — mirror JS error capture
            ops_out.append({"error": str(e)})
    return {
        "id": case["id"],
        "dump": dump_tree(tree),
        "to_html": serialize.to_html(tree, 0, False),
        "to_html_comments": serialize.to_html(tree, 0, True),
        "ops": ops_out,
    }
