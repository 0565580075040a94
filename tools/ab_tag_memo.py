"""Interleaved paired A/B for the tokenizer's open-tag memo
(_TAG_MEMO): parse+extract the bench-heavy pages with the memo ON and
OFF in alternating arms inside ONE process, and report the per-pair
CPU ratio (time.process_time — immune to scheduler noise, the same
estimator the r4/r5 tokenizer A/Bs used).

Also asserts the trees are byte-identical between arms on every page
(serialized structure + content + attrs), so the memo cannot change
semantics silently here even before the goldens/fuzz gates run.

    python3 tools/ab_tag_memo.py [n_pages] [pairs]
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import duckdb  # noqa: E402

from simple_html_parser_spark.kernel import extract as EX  # noqa: E402
from simple_html_parser_spark.kernel import tokenizer as TK  # noqa: E402


def bench_pages(n: int) -> list[str]:
    rows = duckdb.sql(
        "SELECT doc_id, text, lang, source FROM read_parquet("
        "'/root/testdata/sf0.1/documents.parquet') "
        f"WHERE doc_id % 17 = 3 LIMIT {n}").fetchall()
    out = []
    for d, t, _l, _s in rows:
        body = "".join(
            f'<p class="content">para {i} {t}</p>' for i in range(1, 41))
        navs = "".join(
            f'<li><a href="/t/{i}">tag {i}</a></li>'
            for i in range(1, 21))
        out.append(
            f"<html><head><title>Doc {d}</title>"
            "<style>.main { color: #222; } .nav { display: none; } "
            "@media print { .main { color: black; } }</style></head>"
            '<body><nav class="nav"><ul>' + navs +
            '</ul></nav><main class="main">' + f"<h1>Doc {d}</h1>" +
            body + "</main><footer>corpus footer</footer></body></html>")
    return out


def tree_dump(t) -> tuple:
    return (tuple(t.type), tuple(t.name), tuple(t.content),
            tuple(tuple(sorted(a.items())) if a else None
                  for a in t.attrs),
            tuple(t.parent), tuple(tuple(c) for c in t.children))


def run_arm(pages: list[str]) -> float:
    t0 = time.process_time()
    for p in pages:
        EX.extract(TK.parse_html(p))
    return time.process_time() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    pages = bench_pages(n)
    nbytes = sum(len(p) for p in pages)

    # semantic identity first: memo-on vs memo-off trees per page
    TK._TAG_MEMO.clear()
    on = [tree_dump(TK.parse_html(p)) for p in pages]
    saved_keylen = TK._TAG_MEMO_KEYLEN
    TK._TAG_MEMO_KEYLEN = -1
    TK._TAG_MEMO.clear()
    off = [tree_dump(TK.parse_html(p)) for p in pages]
    assert on == off, "memo changed tree semantics!"
    print(f"identity: {len(pages)} pages byte-identical", flush=True)

    ratios = []
    for i in range(pairs):
        TK._TAG_MEMO_KEYLEN = -1
        TK._TAG_MEMO.clear()
        w_off = run_arm(pages)
        TK._TAG_MEMO_KEYLEN = saved_keylen
        TK._TAG_MEMO.clear()
        w_on = run_arm(pages)
        ratios.append(w_off / w_on)
        print(f"pair {i}: off={w_off:.3f}s on={w_on:.3f}s "
              f"ratio={w_off / w_on:.3f} "
              f"({nbytes / w_on / 1e6:.1f} MB/s on)", flush=True)
    med = statistics.median(ratios)
    print(f"median off/on CPU ratio: {med:.3f} "
          f"({(med - 1) * 100:+.1f}% from the memo)")


if __name__ == "__main__":
    main()
