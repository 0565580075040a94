"""Fixture corpus — the golden-checked HTML/CSS cases.

Inputs lifted from the reference test suites (/root/reference/test/*,
see FIXTURES.md §5) plus edge-case probes for the pinned quirks in
SURVEY.md §2.2.  Each case: {id, html, special_tags?, ops}.  Goldens
are generated ONCE by tools/make_goldens.py running the reference
parser under Node and committed to fixtures/goldens.jsonl; pytest
compares the Python kernel byte-for-byte (no Node needed at test time).
"""

COMPLEX_PAGE = """<div class="wrapper">
    <header id="header">
        <nav class="navigation">
            <ul>
                <li><a href="/home">Home</a></li>
                <li><a href="/about">About</a></li>
            </ul>
        </nav>
    </header>
    <main>
        <article class="post">
            <h1>Title</h1>
            <p class="content">Content here</p>
        </article>
    </main>
</div>"""

STYLE_PAGE = """<html><head><title>Doc Title</title>
<style>
:root { --primary-color: #007bff; --spacing: 1rem; }
.card { background: white; padding: 1rem; }
.card.active { border: 1px solid; }
.card { margin: 0; .title { font-size: 1.5rem; } }
@media (max-width: 768px) { .card { padding: 0.5rem; } }
@import url('styles.css');
/* top comment */
p { color: #333; }
P { font-weight: bold; }
</style>
</head><body>
<nav><a href="/x">boilerplate link</a></nav>
<p class="content">Main text &amp; entities stay raw.</p>
<script>var x = 1 < 2; if (x) { go(); }</script>
<footer>footer junk</footer>
</body></html>"""

CSS_ATRULES = """<style>
@keyframes fadeIn {
    0% { opacity: 0; }
    100% { opacity: 1; }
}
@media screen {
    @supports (display: grid) {
        @layer base {
            .grid { display: grid; }
        }
    }
}
@container sidebar (min-width: 400px) {
    .card { font-size: 2em; }
}
@scope (.light-scheme) {
    a { color: darkmagenta; }
}
@charset "utf-8";
@layer named { }
@layer base;
.rgb { color: rgb(255, 255, 255); transform: translateX(10px) rotate(45deg); }
li:not(.disabled) { cursor: pointer; }
</style>"""

EXTRACT_OPS = [
    {"op": "extract"},
    {"op": "extract", "mode": "density"},
    {"op": "extract", "mode": "density", "min_block_chars": 1},
    {"op": "extract", "mode": "density", "min_block_chars": 5,
     "max_link_density": 0.0},
]

_Q_OPS = EXTRACT_OPS + [
    {"op": "qsa", "sel": "p"},
    {"op": "qsa", "sel": "div"},
    {"op": "qsa", "sel": "a"},
    {"op": "qsa", "sel": "#header"},
    {"op": "qsa", "sel": ".content"},
    {"op": "qsa", "sel": ".card.primary"},
    {"op": "qsa", "sel": "[href]"},
    {"op": "qsa", "sel": '[href="/about"]'},
    {"op": "qsa", "sel": "[href='/about']"},
    {"op": "qsa", "sel": ".wrapper .content"},
    {"op": "qsa", "sel": "div div"},
    {"op": "qsa", "sel": "div p"},
    {"op": "qsa", "sel": "ul li a"},
    {"op": "qsa", "sel": "p#main.content"},
    {"op": "qsa", "sel": "p:not(.special)"},
    {"op": "qsa", "sel": ":not(.special)"},
    {"op": "qsa", "sel": "p, a"},
    {"op": "qsa", "sel": "a, p, a"},
    {"op": "qsa", "sel": "li a, .content"},
    {"op": "qs", "sel": "p"},
    {"op": "qs", "sel": "nosuch"},
    {"op": "find_by_attr", "name": "href"},
    {"op": "find_by_attr", "name": "class"},
    {"op": "find_by_tag", "name": "li"},
    {"op": "find_by_type", "name": "text"},
    {"op": "find_by_type", "name": "comment"},
    {"op": "find_by_type", "name": "script-block"},
    {"op": "nodes_by_type", "name": "text"},
    {"op": "nodes_by_type", "name": "tag-open"},
    {"op": "comments"},
    # getComments option flags (node.js:1287-1316) — key presence in
    # the emitted objects depends on the flags; both-false returns the
    # raw node (serialized as bare_node)
    {"op": "comments", "options": {"includeContent": False}},
    {"op": "comments", "options": {"includeType": False}},
    {"op": "comments",
     "options": {"includeContent": False, "includeType": False}},
    {"op": "comments",
     "options": {"includeContent": True, "includeType": True}},
]

_CSS_OPS = [
    {"op": "css_to_string"},
    {"op": "css_to_string", "options": {"combineDeclarations": False}},
    {"op": "css_to_string", "options": {"includeComments": True}},
    {"op": "css_to_string", "options": {"singleLine": True}},
    {"op": "css_to_string", "options": {"flattenNested": True}},
    {"op": "css_to_string",
     "options": {"includeBraces": False, "includeSelector": False}},
    {"op": "css_to_string", "options": {"includeNestedRules": False}},
    {"op": "css_to_string", "options": {"indent": 4}},
    {"op": "css_find_rules", "sel": ".card"},
    {"op": "css_find_rules", "sel": ".card",
     "options": {"includeCompound": False}},
    {"op": "css_find_rules", "sel": "p"},
    {"op": "css_find_rules", "sel": "P"},
    {"op": "css_find_rules", "sel": "card"},
    {"op": "css_find_rules", "sel": ".card", "options": {"shallow": True}},
    {"op": "css_find_at_rules"},
    {"op": "css_find_at_rules", "name": "media"},
    {"op": "css_find_variable", "name": "--primary-color"},
    {"op": "css_find_variable", "name": "spacing"},
    {"op": "css_find_variable", "name": "nope"},
    {"op": "css_find_variables"},
    {"op": "css_find_variables", "includeRoot": True},
]

CASES = [
    {"id": "basic-div", "html": "<div>Hello World</div>",
     "ops": [{"op": "qsa", "sel": "div"}, {"op": "inner_html", "ctx": 1}]},
    # getComments flags across ALL comment types in one doc (html
    # comment, js single+multi line, css comment) — key presence per
    # flag combination pinned against the reference
    # NB: <jhp>, not <script> — script is NOT in DEFAULT_SPECIAL_TAGS,
    # so only a special tag actually produces js-single-line /
    # js-multi-line comment NODES for the flag forms to filter
    # (leading '//' would hit the regex-at-position-0 quirk and emit
    # no comment node, so the single-line comment follows 'var x=1 ' —
    # a space prev-char is NOT regex context)
    {"id": "comment-flags",
     "html": ("<div><!-- top --><jhp>var x=1 // one\n/* two */y=2;"
              "</jhp><style>/* css note */ p { color: red; }"
              "</style><p>text</p><!--tail--></div>"),
     "ops": [
         {"op": "comments"},
         {"op": "comments", "options": {"includeContent": False}},
         {"op": "comments", "options": {"includeType": False}},
         {"op": "comments",
          "options": {"includeContent": False, "includeType": False}},
     ]},
    {"id": "nested", "html": "<div><p>Text</p></div>", "ops": _Q_OPS[:5]},
    {"id": "attrs",
     "html": '<div id="app" class="container" data-value="123"></div>',
     "ops": [{"op": "qsa", "sel": "#app"}, {"op": "qsa", "sel": ".container"},
             {"op": "qsa", "sel": '[data-value="123"]'},
             {"op": "get_attribute", "ctx": 1, "name": "data-value"},
             {"op": "get_tag", "ctx": 1}]},
    {"id": "text-preserve", "html": "<p>Hello World</p>", "ops": []},
    {"id": "voids",
     "html": '<div><img src="test.jpg"><br><input type="text"></div>',
     "ops": [{"op": "qsa", "sel": "img"}, {"op": "find_by_attr",
                                           "name": "src"}]},
    {"id": "comment", "html": "<div><!-- This is a comment --></div>",
     "ops": [{"op": "comments"}, {"op": "find_by_type", "name": "comment"}]},
    {"id": "ws-roundtrip", "html": "<div>\n    <p>Text</p>\n</div>",
     "ops": []},
    {"id": "indent-roundtrip",
     "html": "<table>\n    <tr>\n        <td>Cell</td>\n    </tr>\n</table>",
     "ops": []},
    {"id": "complex-page", "html": COMPLEX_PAGE, "ops": _Q_OPS},
    {"id": "malformed-unclosed-p", "html": "<div><p>Unclosed paragraph</div>",
     "ops": [{"op": "qsa", "sel": "p"}, {"op": "qsa", "sel": "div"}]},
    {"id": "style-css",
     "html": "<style>\n.card {\n    background: white;\n"
             "    padding: 1rem;\n}\n</style>",
     "ops": [{"op": "css_to_string"}, {"op": "css_find_rules",
                                       "sel": ".card"},
             {"op": "nodes_by_type", "name": "text"}]},
    {"id": "comment-toggle", "html": "<!-- Comment --><div>Content</div>",
     "ops": []},
    {"id": "q-multiclass",
     "html": '<div class="card primary active">x</div>'
             '<div class="card">y</div>',
     "ops": [{"op": "qsa", "sel": ".card.primary"},
             {"op": "qsa", "sel": ".card"},
             {"op": "qsa", "sel": "div.card.primary.active"}]},
    {"id": "q-scoped",
     "html": '<div id="a"><span class="text">A</span></div>'
             '<div id="b"><span class="text">B</span></div>',
     "ops": [{"op": "qsa", "ctx": 1, "sel": ".text"},
             {"op": "qs", "ctx": 1, "sel": ".text"}]},
    {"id": "raw-entities",
     "html": '<div data-value="hello&world" title="It\'s fine">'
             "a &amp; b &#39;c&#39;</div>",
     "ops": [{"op": "get_attribute", "ctx": 1, "name": "data-value"},
             {"op": "qsa", "sel": '[data-value="hello&world"]'}]},
    {"id": "style-page", "html": STYLE_PAGE, "ops": _Q_OPS + _CSS_OPS},
    {"id": "css-atrules", "html": CSS_ATRULES, "ops": _CSS_OPS + [
        {"op": "css_find_at_rules", "name": "keyframes"},
        {"op": "css_find_at_rules", "name": "layer"},
        {"op": "css_find_at_rules", "name": "charset"},
        {"op": "css_find_rules", "sel": "a"},
        {"op": "css_find_rules", "sel": ".grid"},
        {"op": "css_find_rules", "sel": "li:not(.disabled)",
         "options": {"includeCompound": False}},
    ]},
    {"id": "css-nested",
     "html": "<style>.card { background: white; .title "
             "{ font-size: 1.5rem; } }</style>",
     "ops": _CSS_OPS},
    {"id": "self-closing-slash", "html": '<br/><img src=x /><p>t</p>',
     "ops": [{"op": "qsa", "sel": "br"}, {"op": "qsa", "sel": "img"},
             {"op": "qsa", "sel": "p"}]},
    {"id": "empty-attr", "html": '<div class="" id="a">x</div>',
     "ops": [{"op": "get_attribute", "ctx": 1, "name": "class"},
             {"op": "qsa", "sel": "[class]"}]},
    {"id": "default-script", "html": "<script>if (a<b) {x()}</script>",
     "ops": [{"op": "qsa", "sel": "script"},
             {"op": "nodes_by_type", "name": "text"}]},
    {"id": "special-tag-js",
     "html": "<jhp>code() // comment\nmore(); /* multi\nline */ tail</jhp>",
     "ops": [{"op": "comments"}, {"op": "find_by_type",
                                  "name": "script-block"},
             {"op": "nodes_by_type", "name": "text"}]},
    {"id": "special-tag-strings",
     "html": "<jhp>var s = \"a//b\"; var r = /x\\/y/; t`//tpl`; "
             "// real\n</jhp>",
     "ops": [{"op": "comments"}]},
    {"id": "special-tag-unclosed-comment",
     "html": "<jhp>x(); /* never closed</jhp>",
     "ops": [{"op": "comments"}]},
    {"id": "special-tag-with-attrs",
     "html": '<jhp type="x">// not special</jhp>',
     "ops": [{"op": "comments"}, {"op": "qsa", "sel": "jhp"}]},
    {"id": "special-custom", "html": "<mytag>a // c\n</mytag>",
     "special_tags": ["mytag"], "ops": [{"op": "comments"}]},
    {"id": "unmatched-close", "html": "<div>a</span>b</div>", "ops": []},
    {"id": "nonterminated-comment", "html": "<!-- never closed", "ops": []},
    {"id": "nested-comment",
     "html": "<!-- outer <!-- inner --> tail -->", "ops": []},
    {"id": "case-sensitive", "html": "<DIV>x</DIV><div>y</div>",
     "ops": [{"op": "qsa", "sel": "div"}, {"op": "qsa", "sel": "DIV"}]},
    {"id": "uc-whitespace",
     # \u2028 / \ufeff are JS-whitespace but not Python \s (and
     # \x1c etc. the reverse): tag splitting and \S+ attr values must
     # use the exact JS charset.
     "html": ("<div\u2028id=x>a</div> <p\ufeffclass=y>b</p>"
              "<a href=u\u3000v t=\u00a0>c</a>"),
     "ops": [{"op": "qsa", "sel": "div"}, {"op": "qsa", "sel": "p"},
             {"op": "get_attribute", "ctx": 1, "name": "id"}]},
    {"id": "doctype", "html": "<!DOCTYPE html><html><body>hi</body></html>",
     "ops": [{"op": "qsa", "sel": "html"}]},
    {"id": "deep-nesting",
     "html": "".join(f'<d{i}>' for i in range(30)) + "core"
             + "".join(f'</d{i}>' for i in reversed(range(30))),
     "ops": [{"op": "qsa", "sel": "d29"}, {"op": "nodes_by_type",
                                           "name": "text"}]},
    {"id": "style-in-attr-quirk",
     "html": '<style a="</style>">x{y:z}</style>', "ops": []},
    {"id": "weird-comment-eats-opener", "html": "<!-->after", "ops": []},
    {"id": "close-with-space", "html": "<div>x</div >y", "ops": []},
    {"id": "unquoted-attrs", "html": "<a href=/home target=_blank>x</a>",
     "ops": [{"op": "qsa", "sel": "[href=/home]"},
             {"op": "get_attribute", "ctx": 1, "name": "href"}]},
    {"id": "dup-attrs", "html": '<p a="1" a="2" b>x</p>',
     "ops": [{"op": "get_attribute", "ctx": 1, "name": "a"},
             {"op": "get_attribute", "ctx": 1, "name": "b"}]},
    {"id": "multi-style",
     "html": "<style>.link { color: blue; }</style><div>mid</div>"
             "<style>.link { color: red; } p { margin: 0; }</style>",
     "ops": [{"op": "css_to_string"},
             {"op": "css_to_string", "options": {"combineDeclarations":
                                                 False}},
             {"op": "css_find_rules", "sel": ".link"}]},
    {"id": "style-unterminated", "html": "<style>.a{color:red}", "ops": []},
    {"id": "style-with-attrs",
     "html": '<style media="screen">.x { a: b; }</style>',
     "ops": [{"op": "css_to_string"}]},
]


# Every case additionally runs the frozen extraction spec (both
# profiles) — the flagship byte-identity gate.
for _case in CASES:
    for _op in EXTRACT_OPS:
        if _op not in _case["ops"]:
            _case["ops"] = list(_case["ops"]) + [_op]

# ---- manipulation + iterator cases (M1-M8, Q1) ----------------------------

MAN_PAGE = """<div id="wrap">
    <p class="a">alpha</p>
    <span class="b">beta</span>
    <div class="inner"><i>deep</i></div>
</div>
<ul id="list">
    <li class="x">one</li>
    <li class="y">two</li>
</ul>"""

CASES += [
    {"id": "man-create-basic", "html": '<div id="c"></div>',
     "ops": [{"op": "mutate", "steps": [
         {"act": "create_append", "sel": "#c", "tag": "p",
          "attrs": {"class": "new"}, "text": "Hello"},
         {"act": "create_append", "sel": "#c", "tag": "img",
          "attrs": {"src": "x.jpg"}},
         {"act": "create_append", "sel": "#c", "tag": "BR"},
         {"act": "create_append", "tag": "footer", "text": "end"},
     ]}]},
    {"id": "man-append-move", "html": MAN_PAGE,
     "ops": [{"op": "mutate", "steps": [
         {"act": "append_sel", "sel": "#list", "node_sel": ".a"},
         {"act": "append_sel", "sel": "#wrap", "node_sel": ".y"},
     ]}]},
    {"id": "man-insert-before", "html": MAN_PAGE,
     "ops": [{"op": "mutate", "steps": [
         {"act": "insert_before_new", "sel": ".b", "tag": "em",
          "text": "before-b"},
         {"act": "insert_before_sel", "sel": ".a", "node_sel": ".x"},
         {"act": "insert_before_sel", "sel": ".a", "node_sel": ".b"},
     ]}]},
    {"id": "man-insert-after", "html": MAN_PAGE,
     "ops": [{"op": "mutate", "steps": [
         {"act": "insert_after_new", "sel": ".a", "tag": "em",
          "text": "after-a"},
         {"act": "insert_after_sel", "sel": ".inner", "node_sel": ".x"},
     ]}]},
    {"id": "man-same-parent-move", "html": MAN_PAGE,
     "ops": [{"op": "mutate", "steps": [
         {"act": "insert_after_sel", "sel": ".inner", "node_sel": ".a"},
         {"act": "insert_before_sel", "sel": ".a", "node_sel": ".b"},
     ]}]},
    {"id": "man-replace", "html": MAN_PAGE,
     "ops": [{"op": "mutate", "steps": [
         {"act": "replace_with_new", "sel": ".b", "tag": "strong",
          "text": "replaced"},
     ]}]},
    {"id": "man-replace-parent-by-child", "html": MAN_PAGE,
     "ops": [{"op": "mutate", "steps": [
         {"act": "replace_with_sel", "sel": "#wrap",
          "node_sel": ".inner"},
     ]}]},
    {"id": "man-remove", "html": MAN_PAGE,
     "ops": [{"op": "mutate", "steps": [
         {"act": "remove", "sel": ".a"},
         {"act": "remove_close", "sel": ".inner"},
         {"act": "remove", "sel": "#list"},
     ]}]},
    {"id": "man-iah", "html": '<div id="c">Hello</div><img id="v">',
     "ops": [
         {"op": "mutate", "steps": [
             {"act": "iah", "sel": "#c", "position": "beforebegin",
              "html": "<p>BB</p>"},
             {"act": "iah", "sel": "#c", "position": "afterbegin",
              "html": "<span>AB</span><b>AB2</b>"},
             {"act": "iah", "sel": "#c", "position": "beforeend",
              "html": "<span>BE</span>"},
             {"act": "iah", "sel": "#c", "position": "afterend",
              "html": "<p>AE</p>"},
         ]},
         {"op": "mutate", "steps": [
             {"act": "iah", "sel": "#v", "position": "afterbegin",
              "html": "<p>boom</p>"},
         ]},
         {"op": "mutate", "steps": [
             {"act": "iah", "sel": "#v", "position": "badpos",
              "html": "x"},
         ]},
     ]},
    {"id": "man-attrs", "html": '<p id="t" class="one">x</p>',
     "ops": [{"op": "mutate", "steps": [
         {"act": "set_attr", "sel": "#t", "name": "data-x",
          "value": "1"},
         {"act": "update_attr", "sel": "#t", "name": "class",
          "value": "two"},
         {"act": "update_attr", "sel": "#t", "name": "class",
          "value": "one"},
         {"act": "remove_attr", "sel": "#t", "name": "id"},
     ]}]},
    {"id": "man-sequence", "html": MAN_PAGE,
     "ops": [{"op": "mutate", "steps": [
         {"act": "create_append", "sel": ".inner", "tag": "p",
          "text": "added"},
         {"act": "append_sel", "sel": ".inner", "node_sel": ".x"},
         {"act": "remove", "sel": ".y"},
         {"act": "iah", "sel": "#list", "position": "beforeend",
          "html": "<li class='z'>three</li>"},
         {"act": "replace_with_new", "sel": ".z", "tag": "li",
          "text": "final"},
         {"act": "set_attr", "sel": "#wrap", "name": "data-done",
          "value": "yes"},
     ]}]},
    {"id": "iter-plain", "html": MAN_PAGE,
     "ops": [{"op": "iterate"}]},
    {"id": "iter-remove-current", "html": MAN_PAGE,
     "ops": [{"op": "iterate",
              "remove": {"type": "tag-open", "name": "span"}}]},
    {"id": "iter-remove-text", "html": "<div><p>a</p><span>b</span></div>",
     "ops": [{"op": "iterate",
              "remove": {"type": "text", "content": "a"}}]},
    {"id": "iter-skip-noop", "html": "<div><p>a</p></div><i>c</i>",
     "ops": [{"op": "iterate",
              "remove": {"skip_at": "tag-open:div:"}}]},
    {"id": "visualize", "html": COMPLEX_PAGE, "ops": [
        {"op": "visualize"},
        {"op": "visualize", "numbers": True, "types": True},
        {"op": "visualize", "attrs": False, "content": False},
        {"op": "visualize", "preview_len": 8},
        {"op": "visualize", "ctx": 1},
    ]},
    {"id": "visualize-special",
     "html": "<jhp>x // c\n</jhp><style>.a{b:c}</style>",
     "ops": [{"op": "visualize", "types": True}]},
]

CASES += [
    {"id": "man-close-targets", "html": MAN_PAGE,
     "ops": [{"op": "mutate", "steps": [
         {"act": "iah_close", "sel": ".inner", "position": "beforebegin",
          "html": "<p>CBB</p>"},
         {"act": "iah_close", "sel": "#wrap", "position": "afterend",
          "html": "<p>CAE</p>"},
         {"act": "insert_before_close", "sel": ".a", "tag": "em",
          "text": "bc"},
         {"act": "insert_after_close", "sel": ".b", "tag": "em",
          "text": "ac"},
     ]}]},
    {"id": "css-combine-multi-style",
     "html": "<div>\n    <style>\n        .card { background: white; }"
             "\n        .button { color: blue; }\n    </style>\n"
             "    <section>\n        <style>\n            .card "
             "{ padding: 1rem; }\n            .link "
             "{ text-decoration: none; }\n        </style>\n"
             "    </section>\n</div>",
     "ops": [{"op": "css_to_string", "ctx": 1},
             {"op": "css_to_string", "ctx": 1,
              "options": {"combineDeclarations": False}}]},
    {"id": "css-combine-order",
     "html": "<style>\n.link { color: blue; }\np { margin: 10px; }\n"
             ".link { text-decoration: none; }\n.link { font-weight: "
             "bold; }\np { padding: 5px; }\n</style>",
     "ops": _CSS_OPS[:4]},
    {"id": "css-atrule-order-preserved",
     "html": "<style>\n.foo { color: red; }\n@media (max-width: 500px)"
             " { .bar { display: block; } }\n.foo { padding: 1rem; }\n"
             "</style>",
     "ops": [{"op": "css_to_string"},
             {"op": "css_to_string",
              "options": {"combineDeclarations": False}}]},
    {"id": "css-scope-to",
     "html": "<style>\n@scope (.card) to (.card-footer) {\n"
             "    .title { font-weight: bold; }\n    .body { color: "
             "#333; }\n}\n</style>",
     "ops": [{"op": "css_to_string"}]},
    {"id": "css-singleline-atrules",
     "html": "<style>\n@media (max-width: 600px) { .narrow { width: "
             "100%; } }\n@keyframes pulse { 50% { opacity: 0.5; } }\n"
             "</style>",
     "ops": [{"op": "css_to_string", "options": {"singleLine": True}},
             {"op": "css_to_string"}]},
]

CASES += [
    # custom specialTags configs (constructor arg, js:37): script AS a
    # special tag enables the JS-comment submachine for it; style in
    # the list is shadowed by the style branch (checked first, js:127)
    {"id": "special-script-config",
     "html": "<script>var x = 1; // inline\n/* block */ if(a<b){}</script>"
             "<p>after</p>",
     "special_tags": ["script"],
     "ops": [{"op": "comments"}, {"op": "nodes_by_type", "name": "text"},
             {"op": "find_by_type", "name": "script-block"}]},
    {"id": "special-script-with-attrs",
     "html": '<script type="module">// not special (has attrs)\n'
             "</script>",
     "special_tags": ["script"],
     "ops": [{"op": "comments"}, {"op": "qsa", "sel": "script"}]},
    {"id": "special-style-shadowed",
     "html": "<style>.a{b:c}</style><jhp>// x\n</jhp>",
     "special_tags": ["style", "jhp"],
     "ops": [{"op": "css_to_string"}, {"op": "comments"}]},
    {"id": "special-unterminated",
     "html": "<jhp>var x = 1; // never closed",
     "ops": [{"op": "find_by_type", "name": "script-block"},
             {"op": "nodes_by_type", "name": "text"}]},
]

# oracle-variant templates (sources/documents.py VARIANT_TEMPLATES):
# pin the exact pages the driver-oracle structure maps depend on —
# if the kernel ever diverges from the reference on these, goldens
# catch it before the closed-form oracles silently pin a wrong tree.
def _render_variant(tpl: str, doc_id, text, lang, source) -> str:
    return (tpl.replace("%1$s", str(doc_id)).replace("%2$s", text)
            .replace("%3$s", lang).replace("%4$s", source))


_VARIANT_TPLS = {
    "voids": '<html><body><p>a < b; %2$s</p><br/>'
             '<img src="/img/%1$s.png" alt="d%1$s"><hr>'
             '</section><input type="text" value="%3$s"></body></html>',
    "special": '<html><body><jhp>var x = %1$s; // note %4$s\n'
               '/* c */ if (x < 2) { x = x + 1; }</jhp>'
               '<script>let s = "%3$s"; // tail\n</script>'
               '<p>%2$s</p></body></html>',
    "malformed": '<div class="w"><p>Unclosed %2$s<span>s%1$s</div>'
                 '<b>b %3$s</i></b><p>tail %4$s',
}

CASES += [
    {"id": f"variant-{name}-{i}",
     "html": _render_variant(tpl, doc_id, text, lang, source),
     "ops": [{"op": "extract"}, {"op": "comments"},
             {"op": "nodes_by_type", "name": "text"}]}
    for name, tpl in sorted(_VARIANT_TPLS.items())
    for i, (doc_id, text, lang, source) in enumerate([
        (7, "hello world foo", "en", "src1"),
        (12345, "la vie est belle et longue", "fr", "another_source"),
    ])
]

# the doc_edit_pipeline driver-oracle script (operators/editing.py):
# pin kernel==reference for the EXACT step list the Spark operator
# applies, on rendered main-template instances.
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))
from simple_html_parser_spark.operators.editing import (  # noqa: E402
    EDIT_STEPS,
)
from simple_html_parser_spark.sources.documents import (  # noqa: E402
    HTML_TEMPLATE as _MAIN_TPL,
)

CASES += [
    {"id": f"edit-pipeline-{i}",
     "html": _render_variant(_MAIN_TPL, doc_id, text, lang, source),
     "ops": [{"op": "mutate", "steps": list(EDIT_STEPS)}]}
    for i, (doc_id, text, lang, source) in enumerate([
        (7, "hello world foo", "en", "src1"),
        (12345, "la vie est belle et longue", "fr", "another_source"),
    ])
]

# pin the kernel_query_api / css_query_api driver-oracle op lists
# against the reference (operators/queryapi.py).
from simple_html_parser_spark.operators.queryapi import (  # noqa: E402
    QUERY_OPS,
)
from simple_html_parser_spark.sources.documents import (  # noqa: E402
    TPL_CSSY as _CSSY_TPL,
)

_QOP_MAP = {
    "qsa": lambda a: {"op": "qsa", "sel": a},
    "qs": lambda a: {"op": "qs", "sel": a},
    "by_tag": lambda a: {"op": "find_by_tag", "name": a},
    "by_attr": lambda a: {"op": "find_by_attr", "name": a},
    "by_type": lambda a: {"op": "find_by_type", "name": a},
    "nodes_by_type": lambda a: {"op": "nodes_by_type", "name": a},
    "comments": lambda a: {"op": "comments"},
    "comments_no_content": lambda a: {
        "op": "comments", "options": {"includeContent": False}},
    "comments_no_type": lambda a: {
        "op": "comments", "options": {"includeType": False}},
    "comments_bare": lambda a: {
        "op": "comments",
        "options": {"includeContent": False, "includeType": False}},
}

CASES += [
    {"id": "query-api-main",
     "html": _render_variant(_MAIN_TPL, 7, "hello world foo", "en",
                             "src1"),
     "ops": [_QOP_MAP[op](arg) for op, arg in QUERY_OPS]},
    {"id": "css-query-api-cssy",
     "html": _render_variant(_CSSY_TPL, 7, "hello world foo", "en",
                             "src1"),
     "ops": [
         {"op": "css_find_at_rules"},
         {"op": "css_find_rules", "sel": ".a"},
         {"op": "css_find_rules", "sel": ".a",
          "options": {"includeCompound": False}},
         {"op": "css_find_rules", "sel": ".d"},
         {"op": "css_find_rules", "sel": ".d",
          "options": {"includeCompound": False}},
         {"op": "css_find_variables"},
         {"op": "css_find_variable", "name": "c"},
         {"op": "extract"},
     ]},
]

CASES += [
    # pin the doc_serialize_api op list (operators/queryapi.py):
    # get_tag/innerHtml/outerHtml on the main node (21) + toHtml with
    # comments (toString equivalence is covered by serialize goldens)
    {"id": "serialize-api-main",
     "html": _render_variant(_MAIN_TPL, 7, "hello world foo", "en",
                             "src1"),
     "ops": [
         {"op": "get_tag", "ctx": 21},
         {"op": "inner_html", "ctx": 21},
         {"op": "outer_html", "ctx": 21},
         {"op": "node_to_html", "ctx": 0, "comments": True},
     ]},
]

CASES += [
    # pin doc_visualize (S6) on the main template
    {"id": "visualize-main",
     "html": _render_variant(_MAIN_TPL, 7,
                             "hello world foo bar baz beyond twenty",
                             "en", "src1"),
     "ops": [{"op": "visualize"}]},
]
