"""Property-based tests (hypothesis) for the extraction kernels.

Invariants the golden cases can't exhaustively pin:
* render→parse→render is a fixpoint for ANY valid logical grid;
* the full per-table pipeline reproduces its input byte-for-byte for any
  grid produced by the grammar;
* recover_logic_points is jitter-invariant below the reference thresholds;
* reading_order returns a permutation and is idempotent.
"""

import random

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tablestructurerec_spark.core.geometry import reading_order
from tablestructurerec_spark.core.html_parse import parse_table_html, quads_from_logic_points
from tablestructurerec_spark.core.html_render import render_table_html
from tablestructurerec_spark.core.pipeline import classify_table_kind, process_table_html
from tablestructurerec_spark.core.recover import recover_logic_points


@st.composite
def grids(draw):
    """Random non-overlapping logical grid + texts (greedy grid fill)."""
    rng = random.Random(draw(st.integers(0, 10**9)))
    n_rows, n_cols = rng.randint(1, 6), rng.randint(1, 6)
    taken = [[False] * n_cols for _ in range(n_rows)]
    logic, texts = [], []
    for r in range(n_rows):
        c = 0
        while c < n_cols:
            if taken[r][c]:
                c += 1
                continue
            mc = 1
            while c + mc < n_cols and not taken[r][c + mc]:
                mc += 1
            cs = rng.randint(1, min(3, mc)) if rng.random() < 0.3 else 1
            rs = rng.randint(1, min(3, n_rows - r)) if rng.random() < 0.3 else 1
            for rr in range(r, r + rs):
                for cc in range(c, c + cs):
                    taken[rr][cc] = True
            logic.append([r, r + rs - 1, c, c + cs - 1])
            n_lines = rng.randint(1, 3)
            lines = [
                " ".join(rng.choice("aa bb cc dd ee".split()) for _ in range(rng.randint(0, 3)))
                for _ in range(n_lines)
            ]
            # empty-text cells spanning out of the render window make the
            # HTML ambiguous (renderer skip rule) — restrict empties to 1x1,
            # matching the synthesizer's grammar guarantee
            if "".join(lines) == "" and (rs > 1 or cs > 1):
                lines[0] = "aa"
            texts.append(lines)
            c += cs
    return logic, texts


@settings(max_examples=150, deadline=None)
@given(grids())
def test_render_parse_fixpoint(grid):
    logic, texts = grid
    html = render_table_html(logic, dict(enumerate(texts)))
    p_logic, p_texts = parse_table_html(html)
    assert render_table_html(p_logic, dict(enumerate(p_texts))) == html


@settings(max_examples=100, deadline=None)
@given(grids(), st.integers(0, 10**6))
def test_full_pipeline_reproduces_grammar_output(grid, seed):
    logic, texts = grid
    html = render_table_html(logic, dict(enumerate(texts)))
    res = process_table_html(html, table_seed=seed)
    assert res["pred_html"] == html


@settings(max_examples=100, deadline=None)
@given(grids(), st.integers(0, 10**6))
def test_recover_jitter_invariant(grid, seed):
    logic, _ = grid
    if classify_table_kind(logic) != "wired":
        return
    rng = random.Random(seed)
    quads = np.asarray(quads_from_logic_points(logic), dtype=float)
    jit = np.array(
        [[[rng.uniform(-3, 3), rng.uniform(-3, 3)] for _ in range(4)] for _ in quads]
    )
    assert recover_logic_points(quads + jit).tolist() == logic


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(0, 500, allow_nan=False),
            st.floats(0, 500, allow_nan=False),
            st.floats(1, 100, allow_nan=False),
            st.floats(1, 60, allow_nan=False),
        ),
        max_size=12,
    )
)
def test_reading_order_is_permutation_and_idempotent(raw):
    boxes = [[x, y, x + w, y + h] for x, y, w, h in raw]
    ordered, perm = reading_order([list(b) for b in boxes])
    assert sorted(perm) == list(range(len(boxes)))
    assert [boxes[i] for i in perm] == list(ordered)
    again, perm2 = reading_order([list(b) for b in ordered])
    assert list(again) == list(ordered)
    assert perm2 == list(range(len(ordered)))


# ---------------------------------------------------------------------------
# morphology invariants
# ---------------------------------------------------------------------------
@given(st.integers(0, 10**9), st.integers(2, 9))
@settings(max_examples=40, deadline=None)
def test_close_1d_idempotent_and_extensive(seed, k):
    """CLOSE is extensive (never removes foreground) and idempotent."""
    from tablestructurerec_spark.core.morphology import close_1d

    rng = np.random.default_rng(seed)
    m = rng.random((12, 24)) < 0.35
    c1 = close_1d(m, k, axis=1)
    assert (c1 | m).sum() == c1.sum()  # m ⊆ close(m)
    assert np.array_equal(close_1d(c1, k, axis=1), c1)


@given(st.integers(0, 10**9))
@settings(max_examples=25, deadline=None)
def test_label_components_partition_properties(seed):
    """Labels are dense 1..K in first-encounter order; 8-neighbors share."""
    from tablestructurerec_spark.core.wired_lines import label_components

    rng = np.random.default_rng(seed)
    m = rng.random((20, 30)) < 0.4
    lab = label_components(m)
    assert (lab > 0).sum() == m.sum() and not lab[~m].any()
    k = lab.max()
    if k:
        assert set(np.unique(lab)) == set(range(k + 1)) - ({0} - set(np.unique(lab)))
        # first occurrences appear in increasing label order
        firsts = [np.flatnonzero(lab.ravel() == i)[0] for i in range(1, k + 1)]
        assert firsts == sorted(firsts)
    # 8-connected neighbors always share a label
    ys, xs = np.nonzero(m)
    for dy, dx in ((0, 1), (1, 0), (1, 1), (1, -1)):
        ny, nx = ys + dy, xs + dx
        ok = (ny >= 0) & (ny < m.shape[0]) & (nx >= 0) & (nx < m.shape[1])
        both = ok & m[ny % m.shape[0], nx % m.shape[1]]
        assert (lab[ys[both], xs[both]] == lab[ny[both], nx[both]]).all()
