// Differential-test harness: runs the REFERENCE parser
// (/root/reference, read-only) over JSONL {id, html, special_tags?, ops?}
// from stdin and emits JSONL {id, dump, to_html, to_html_comments,
// ops: [...]} — the same normalized shapes
// tests/differential_common.py produces from the Python kernel.
// Used only to generate goldens / verify cross-runtime equivalence;
// no reference code is copied into the engine.
import { SimpleHtmlParser } from '/root/reference/src/simple-html-parser.js';
import * as readline from 'node:readline';

function walk(root) {
    // Pre-order list of [node, parentId]; grafted CSS children keep a
    // dangling .parent in the reference, so parents come from traversal.
    const out = [];
    const stack = [[root, -1]];
    while (stack.length > 0) {
        const [node, parentId] = stack.pop();
        const id = out.length;
        out.push([node, parentId]);
        const children = node.children || [];
        for (let i = children.length - 1; i >= 0; i--) {
            stack.push([children[i], id]);
        }
    }
    return out;
}

function dumpTree(nodes) {
    return nodes.map(([node, parentId]) => ({
        parent: parentId,
        type: node.type,
        name: node.name ?? '',
        attrs: node.attributes && Object.keys(node.attributes).length > 0
            ? node.attributes : null,
        content: node.content ?? '',
        comment_type: node.commentType ?? null,
        style_block: !!node.styleBlock,
        script_block: !!node.scriptBlock,
        css_selector: node.cssSelector ?? null,
        css_name: node.cssName ?? null,
        css_params: node.cssParams ?? null,
        css_decls: node.cssDeclarations ?? null,
    }));
}

function runOp(op, root, byId, idOf) {
    const ctx = byId[op.ctx ?? 0];
    const ids = (arr) => arr.map((n) => idOf.get(n) ?? -1);
    switch (op.op) {
        case 'qsa': return ids(ctx.querySelectorAll(op.sel));
        case 'qs': {
            const r = ctx.querySelector(op.sel);
            return r ? idOf.get(r) : null;
        }
        case 'find_by_attr': return ids(ctx.findAllByAttr(op.name));
        case 'find_by_tag': return ids(ctx.findAllByTag(op.name));
        case 'find_by_type': return ids(ctx.findAllByType(op.name));
        case 'nodes_by_type': return ids(ctx.getNodesByType(op.name));
        case 'comments':
            return ctx.getComments().map((c) => ({
                content: c.content ?? null,
                commentType: c.commentType ?? null,
                node: idOf.get(c.node) ?? -1,
            }));
        case 'get_tag': return ctx.getTag();
        case 'inner_html': return ctx.innerHtml(!!op.comments);
        case 'outer_html': return ctx.outerHtml(!!op.comments);
        case 'node_to_html': return ctx.toHtml(!!op.comments);
        case 'get_attribute': return ctx.getAttribute(op.name) ?? null;
        case 'css_to_string': return ctx.cssToString(op.options ?? {});
        case 'css_to_string_nodes': {
            const nodes = op.node_ids.map((i) => byId[i]);
            return ctx.cssToString(nodes, op.options ?? {});
        }
        case 'css_find_rules': {
            const o = op.options ?? {};
            const rules = ctx.cssFindRules(op.sel, o);
            if (o.shallow) {
                return rules.map((r) => ({
                    selector: r.cssSelector ?? null,
                    decls: r.cssDeclarations ?? null,
                    n_children: (r.children || []).length,
                }));
            }
            return ids(rules);
        }
        case 'css_find_at_rules': return ids(ctx.cssFindAtRules(op.name ?? null));
        case 'css_find_variable': return ctx.cssFindVariable(op.name);
        case 'css_find_variables':
            return ctx.cssFindVariables({ includeRoot: !!op.includeRoot })
                .map((v) => ({ name: v.name, value: v.value, scope: v.scope ?? null }));
        default: throw new Error(`unknown op ${op.op}`);
    }
}

const rl = readline.createInterface({ input: process.stdin, terminal: false });
const lines = [];
rl.on('line', (l) => { if (l.trim()) lines.push(l); });
rl.on('close', () => {
    for (const line of lines) {
        const { id, html, special_tags, ops } = JSON.parse(line);
        const parser = special_tags
            ? new SimpleHtmlParser(special_tags)
            : new SimpleHtmlParser();
        let result;
        try {
            const root = parser.parse(html);
            const nodes = walk(root);
            const byId = nodes.map(([n]) => n);
            const idOf = new Map(byId.map((n, i) => [n, i]));
            result = {
                id,
                dump: dumpTree(nodes),
                to_html: root.toHtml(false),
                to_html_comments: root.toHtml(true),
                ops: (ops || []).map((op) => {
                    try {
                        return { ok: runOp(op, root, byId, idOf) };
                    } catch (e) {
                        return { error: String(e && e.message || e) };
                    }
                }),
            };
        } catch (e) {
            result = { id, error: String(e && e.stack || e) };
        }
        process.stdout.write(`${JSON.stringify(result)}\n`);
    }
});
