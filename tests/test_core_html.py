"""Golden HTML-render parity + parse round-trip tests.

Render goldens are literals from the reference's
tests/test_lineless_table_rec.py:197-256 (9 exact strings, incl. rowspan/
colspan, mid/end spans, invalid row/col elision).  The parser is ours (the
graft inverse); the round-trip law pins it to the same grammar.
"""

import pytest

from tablestructurerec_spark.core.html_parse import (
    extract_turn,
    find_table_fragments,
    parse_table_html,
    strip_boilerplate,
)
from tablestructurerec_spark.core.html_render import render_table_html

GOLDEN_CASES = [
    ([], {}, "<html><body><table></table></body></html>"),
    (
        [[0, 0, 0, 0]],
        {0: ["Cell 1"]},
        "<html><body><table><tr><td rowspan=1 colspan=1>Cell 1</td></tr></table></body></html>",
    ),
    (
        [[0, 0, 0, 0], [1, 1, 1, 1]],
        {0: ["Cell 1"], 1: ["Cell 2"]},
        "<html><body><table><tr><td rowspan=1 colspan=1>Cell 1</td><td></td></tr><tr><td></td><td rowspan=1 colspan=1>Cell 2</td></tr></table></body></html>",
    ),
    (
        [[0, 1, 0, 0]],
        {0: ["Row 1 Col 1", "Row 2 Col 1"]},
        "<html><body><table><tr><td rowspan=2 colspan=1>Row 1 Col 1<br>Row 2 Col 1</td></tr><tr></tr></table></body></html>",
    ),
    (
        [[0, 0, 0, 1]],
        {0: ["Col 1 Row 1", "Col 2 Row 1"]},
        "<html><body><table><tr><td rowspan=1 colspan=2>Col 1 Row 1<br>Col 2 Row 1</td></tr></table></body></html>",
    ),
    (
        [[0, 1, 0, 1]],
        {0: ["Row 1 Col 1", "Row 2 Col 1"]},
        "<html><body><table><tr><td rowspan=2 colspan=2>Row 1 Col 1<br>Row 2 Col 1</td></tr><tr></tr></table></body></html>",
    ),
    (
        [[0, 0, 0, 0], [0, 1, 1, 2]],
        {0: ["Cell 1"], 1: ["Row 2", "Col 2"]},
        "<html><body><table><tr><td rowspan=1 colspan=1>Cell 1</td><td rowspan=2 colspan=2>Row 2<br>Col 2</td></tr><tr><td></td></tr></table></body></html>",
    ),
    (
        [[0, 0, 0, 0], [1, 1, 1, 1], [0, 1, 2, 2]],
        {0: ["Cell 1"], 1: ["Cell 2"], 2: ["Row 1 Col 2", "Row 2 Col 2"]},
        "<html><body><table><tr><td rowspan=1 colspan=1>Cell 1</td><td></td><td rowspan=2 colspan=1>Row 1 Col 2<br>Row 2 Col 2</td></tr><tr><td></td><td rowspan=1 colspan=1>Cell 2</td></tr></table></body></html>",
    ),
    (
        [[0, 0, 0, 0], [1, 1, 0, 0], [1, 1, 1, 1], [0, 0, 1, 2]],
        {2: ["Row 3 Col 1", "Row 3 Col 2"]},
        "<html><body><table><tr><td rowspan=1 colspan=1>Row 3 Col 1<br>Row 3 Col 2</td></tr></table></body></html>",
    ),
]


@pytest.mark.parametrize("logic_points, cell_texts, expected", GOLDEN_CASES)
def test_render_table_html_golden(logic_points, cell_texts, expected):
    assert render_table_html(logic_points, cell_texts) == expected


@pytest.mark.parametrize("logic_points, cell_texts, expected", GOLDEN_CASES)
def test_parse_render_round_trip(logic_points, cell_texts, expected):
    """parse(render(x)) re-renders byte-identically."""
    logic, texts = parse_table_html(expected)
    assert render_table_html(logic, dict(enumerate(texts))) == expected


def test_parse_foreign_table():
    html = (
        "<table><tr><th>h1</th><th colspan=2>h2</th></tr>"
        "<tr><td>a</td><td rowspan='2'>b</td><td>c</td></tr>"
        "<tr><td>d</td><td>e</td></tr></table>"
    )
    logic, texts = parse_table_html(html)
    assert logic == [
        [0, 0, 0, 0],
        [0, 0, 1, 2],
        [1, 1, 0, 0],
        [1, 2, 1, 1],
        [1, 1, 2, 2],
        [2, 2, 0, 0],
        [2, 2, 2, 2],
    ]
    assert [t[0] for t in texts] == ["h1", "h2", "a", "b", "c", "d", "e"]


def test_find_and_strip():
    text = (
        "hello <nav>menu</nav> world "
        "<table><tr><td rowspan=1 colspan=1>X</td></tr></table> "
        "tail <script>evil()</script><!-- c -->"
    )
    frags = find_table_fragments(text)
    assert len(frags) == 1 and frags[0][2].startswith("<table>")
    main, tables = extract_turn(text)
    assert "menu" not in main and "evil" not in main
    assert "hello" in main and "world" in main and "tail" in main
    assert len(tables) == 1
    assert tables[0][0] == [[0, 0, 0, 0]]
    assert strip_boilerplate("a  \t b") == "a b"


def test_fast_parse_equivalent_to_stdlib_parser():
    """The fast tokenizer must produce byte-identical parses to the
    html.parser path on everything it accepts, and decline (falling back)
    on everything exotic."""
    import random

    from tablestructurerec_spark.core.html_parse import (
        _TableParser,
        _fast_feed,
        parse_table_html,
    )

    def stdlib_parse(h):
        p = _TableParser()
        p.feed(h)
        p.close()
        return p.cells

    rng = random.Random(11)
    cases = []
    # random renderer-normal-ish tables
    for _ in range(200):
        rows = []
        n_r, n_c = rng.randint(1, 4), rng.randint(1, 4)
        for r in range(n_r):
            tds = []
            for c in range(n_c):
                kind = rng.random()
                if kind < 0.15:
                    tds.append("<td></td>")
                elif kind < 0.3:
                    tds.append(f"<td rowspan={rng.randint(1,3)} colspan={rng.randint(1,3)}>x{r}{c}</td>")
                elif kind < 0.4:
                    tds.append(f"<td>line1<br>line2 {r}</td>")
                elif kind < 0.5:
                    tds.append(f'<TD ROWSPAN="2">quoted {c}</TD>')
                elif kind < 0.6:
                    tds.append(f"<th>head {c}</th>")
                else:
                    tds.append(f"<td>cell {r} {c}</td>")
            rows.append("<tr>" + "".join(tds) + "</tr>")
        cases.append("<table>" + "".join(rows) + "</table>")
    # hostile / exotic snippets (fast path may decline; result must match)
    cases += [
        "<table><tr><td>a<b>bold</b>c</td></tr></table>",
        "<table><tr><td nowrap>x</td></tr></table>",
        "<table><tr><td rowspan='2'>q</td></tr><tr></tr></table>",
        "<table><tr><td>a &amp; b</td></tr></table>",
        "<table><!-- c --><tr><td>x</td></tr></table>",
        "<table><tr><td>1 < 2</td></tr></table>",
        "<table><tr><td>a<br/>b</td></tr></table>",
        "<table border=1><tr><td rowspan=x>bad</td></tr></table>",
        "<table><tr><td><table><tr><td>inner</td></tr></table></td></tr></table>",
        "<table><tr><td>unclosed",
        "<table><td>no tr</td></table>",
        # trailing-slash shapes: html.parser folds '/' into an OPEN unquoted
        # attr value ('rowspan=2/' is an attr value, NOT a self-close) — the
        # fast path must decline or agree byte-for-byte
        "<table><tr><td rowspan=2/>x</td></tr></table>",
        "<table><tr><td colspan=2/>y</td></tr></table>",
        "<table><tr><td a=b/ c>z</td></tr></table>",
        "<table><tr><td/>w</td></tr></table>",
        '<table><tr><td a="x"/>v</td></tr></table>',
        "<table><tr><td rowspan=2 />u</td></tr></table>",
    ]
    n_fast = 0
    for h in cases:
        p = _TableParser()
        if _fast_feed(p, h):
            n_fast += 1
            assert p.cells == stdlib_parse(h), h
        assert parse_table_html(h) is not None  # fallback path never raises
    # the fast path must actually engage on the common grammar
    assert n_fast >= 150, n_fast


def test_implied_end_tags_place_cells_like_a_browser():
    """Valid HTML5 omits </td>/</tr>; cells must land on the same grid a
    browser renders (a new <tr> or </table> closes the open cell)."""
    from tablestructurerec_spark.core.html_parse import parse_table_html

    logic, texts = parse_table_html("<table><tr><td>a<td>b<tr><td>c<td>d</table>")
    assert logic == [[0, 0, 0, 0], [0, 0, 1, 1], [1, 1, 0, 0], [1, 1, 1, 1]]
    assert texts == [["a"], ["b"], ["c"], ["d"]]


def test_nested_table_stays_in_outer_fragment():
    """A nested <table> must not truncate the outer fragment; its text
    flattens into the enclosing cell."""
    from tablestructurerec_spark.core.html_parse import (
        find_table_fragments,
        parse_table_html,
    )

    t = ("x <table><tr><td>outer1<table><tr><td>inner</td></tr></table>"
         "</td><td>outer2</td></tr></table> y")
    frs = find_table_fragments(t)
    assert len(frs) == 1 and frs[0][2].endswith("</td></tr></table>")
    logic, texts = parse_table_html(frs[0][2])
    assert texts == [["outer1inner"], ["outer2"]]
    assert logic == [[0, 0, 0, 0], [0, 0, 1, 1]]


def test_mixed_case_table_tags_found():
    """The fragment finder's fast pre-check must accept everything the
    Spark-side has_table_col filter passes (case-insensitive)."""
    from tablestructurerec_spark.core.html_parse import (
        find_table_fragments,
        parse_table_html,
    )

    frs = find_table_fragments("<Table><TR><TD>x</TD></TR></Table>")
    assert len(frs) == 1
    assert parse_table_html(frs[0][2])[1] == [["x"]]
