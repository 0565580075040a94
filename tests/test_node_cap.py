"""Node-cap safety valve."""
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from simple_html_parser_spark.kernel.tokenizer import (  # noqa: E402
    NodeCapExceeded, parse_html,
)


def test_cap_triggers():
    html = "<p>x</p>" * 10000
    with pytest.raises(NodeCapExceeded):
        parse_html(html, max_nodes=1000)


def test_cap_off_by_default():
    html = "<p>x</p>" * 10000
    assert len(parse_html(html).type) == 30001
