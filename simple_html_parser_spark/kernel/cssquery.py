"""CSS tree query operators (C8-C11).

Semantics-identical to the reference:
- cssFindAtRules (/root/reference/src/node.js:466-486)
- cssFindRules (node.js:508-561) — compound matching uses substring
  containment for class/id selectors and a CASE-INSENSITIVE word-boundary
  regex for tag selectors; exact mode splits the rule selector on commas
  AND whitespace; shallow mode returns a CLONE with rule/at-rule
  children stripped.
- cssFindVariable (node.js:577-603), cssFindVariables (node.js:616-668)
  including the ':root scope' quirk that depends on the dangling
  css-root parent pointer (FLAG_CSS_TOP here).
"""

from __future__ import annotations

import re

from .jsre import js_entries, js_split_ws, js_trim
from .tree import CSS_AT_RULE, CSS_ROOT, CSS_RULE, FlatTree


def css_find_at_rules(
    tree: FlatTree, ctx: int, name: str | None = None
) -> list[int]:
    return [
        nid for nid in tree.iter_preorder(ctx)
        if tree.type[nid] == CSS_AT_RULE
        and (name is None or tree.css_name[nid] == name)
    ]


def css_find_rules(
    tree: FlatTree, ctx: int, selector: str,
    include_compound: bool = True, shallow: bool = False,
) -> list[int]:
    results: list[int] = []
    is_tag_selector = not selector.startswith((".", "#", "["))
    tag_re = re.compile(rf"\b{selector}\b", re.IGNORECASE) \
        if (include_compound and is_tag_selector) else None

    for nid in tree.iter_preorder(ctx):
        if tree.type[nid] != CSS_RULE:
            continue
        rule_selector = tree.css_selector[nid] or ""
        if include_compound:
            if is_tag_selector:
                matches = bool(tag_re.search(rule_selector))
            else:
                matches = selector in rule_selector
        else:
            tokens = [
                js_trim(part)
                for chunk in rule_selector.split(",")
                for part in js_split_ws(js_trim(chunk))
            ]
            matches = selector in tokens
        if matches:
            results.append(
                _shallow_clone(tree, nid) if shallow else nid)
    return results


def _shallow_clone(tree: FlatTree, nid: int) -> int:
    """Reference shallow mode: Object.assign clone with css-rule /
    css-at-rule children filtered out (node.js:540-545).  The clone is
    NOT linked into any parent's children (matches JS: the clone never
    enters the tree)."""
    clone = tree.new_node(
        tree.type[nid], name=tree.name[nid],
        attrs=tree.attrs[nid], parent=tree.parent[nid],
        content=tree.content[nid], comment_type=tree.comment_type[nid],
        flags=tree.flags[nid],
    )
    tree.css_selector[clone] = tree.css_selector[nid]
    tree.css_name[clone] = tree.css_name[nid]
    tree.css_params[clone] = tree.css_params[nid]
    tree.css_decls[clone] = tree.css_decls[nid]
    tree.children[clone] = [
        c for c in tree.children[nid]
        if tree.type[c] not in (CSS_RULE, CSS_AT_RULE)
    ]
    return clone


def css_find_variable(
    tree: FlatTree, ctx: int, name: str, rule: int | None = None
) -> str | None:
    var_name = name if name.startswith("--") else f"--{name}"
    if rule is not None:
        decls = tree.css_decls[rule]
        return (decls or {}).get(var_name) or None
    for nid in tree.iter_preorder(ctx):
        decls = tree.css_decls[nid]
        if decls and decls.get(var_name):
            return decls[var_name]
    return None


def css_find_variables(
    tree: FlatTree, ctx: int, include_root: bool = False
) -> list[dict]:
    """All custom properties with scope paths (node.js:616-668)."""
    variables: list[dict] = []

    stack: list[tuple[int, str]] = [(ctx, "")]
    # iterative pre-order with per-node scope threading
    while stack:
        nid, scope_path = stack.pop()
        ty = tree.type[nid]
        current_scope = scope_path
        if ty == CSS_RULE:
            sel = tree.css_selector[nid]
            current_scope = f"{scope_path} > {sel}" if scope_path else sel
        elif ty == CSS_AT_RULE:
            params = tree.css_params[nid]
            at_str = f"@{tree.css_name[nid]}{' ' + params if params else ''}"
            current_scope = (
                f"{scope_path} > {at_str}" if scope_path else at_str)

        decls = tree.css_decls[nid]
        if decls:
            for prop, value in js_entries(decls):
                if not prop.startswith("--"):
                    continue
                final_scope = current_scope
                parent = tree.parent[nid]
                # reference: node.parent.type === 'css-root' — true for
                # standalone CSS trees AND for style-grafted top-level
                # nodes (dangling css-root parent; FLAG_CSS_TOP).
                is_top = tree.is_css_top(nid) or (
                    parent >= 0 and tree.type[parent] == CSS_ROOT)
                if not include_root and is_top:
                    sel = tree.css_selector[nid]
                    final_scope = ":root" if sel == ":root" else sel
                variables.append({
                    "name": prop, "value": value,
                    "scope": final_scope, "rule": nid,
                })
        for c in reversed(tree.children[nid]):
            stack.append((c, current_scope))
    return variables
