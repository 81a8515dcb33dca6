"""Distributional cross-execution against the reference's own line utilities.

The golden tests pin literal cases; this extracts the cv2-free functions
from /root/reference/wired_table_rec/utils/utils_table_line_rec.py by AST
(the module itself imports cv2/skimage at top level, absent here) and
checks exact agreement on hundreds of random inputs.  Skipped when the
reference snapshot is not mounted.
"""

import ast
import copy
import math
import os
import random

import numpy as np
import pytest

REF = "/root/reference/wired_table_rec/utils/utils_table_line_rec.py"

pytestmark = pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")

_WANTED = {
    "adjust_lines",
    "final_adjust_lines",
    "line_to_line",
    "fit_line",
    "point_line_cor",
    "sqrt",
}


@pytest.fixture(scope="module")
def ref_ns():
    tree = ast.parse(open(REF).read())
    ns = {"math": math, "np": np, "copy": copy}
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in _WANTED:
            exec(compile(ast.Module([node], []), "<ref>", "exec"), ns)
    assert _WANTED <= set(ns)
    return ns


def _rand_lines(rng, n, horizontal):
    out = []
    for _ in range(n):
        x = rng.uniform(0, 400)
        y = rng.uniform(0, 300)
        length = rng.uniform(30, 150)
        if horizontal:
            out.append((x, y, x + length, y + rng.uniform(-4, 4)))
        else:
            out.append((x, y, x + rng.uniform(-4, 4), y + length))
    return out


def test_adjust_lines_matches_reference(ref_ns):
    from tablestructurerec_spark.core.lines import adjust_lines

    rng = random.Random(0)
    for _ in range(300):
        lines = _rand_lines(rng, rng.randint(2, 8), rng.random() < 0.5)
        alph = rng.choice([15, 50, 100])
        ref_out = ref_ns["adjust_lines"]([tuple(l) for l in lines], alph=alph, angle=50)
        my_out = adjust_lines(lines, alph=alph, angle=50)
        assert [tuple(map(float, t)) for t in ref_out] == [
            tuple(map(float, t)) for t in my_out
        ]


def test_line_to_line_matches_reference(ref_ns):
    from tablestructurerec_spark.core.lines import line_to_line

    rng = random.Random(1)
    for _ in range(300):
        r = _rand_lines(rng, 1, True)[0]
        c = _rand_lines(rng, 1, False)[0]
        ref_out = ref_ns["line_to_line"](list(r), list(c), alpha=20, angle=30)
        my_out = line_to_line(list(r), list(c), alpha=20, angle=30)
        assert np.allclose(np.asarray(ref_out, float), np.asarray(my_out, float), atol=1e-9)


def test_final_adjust_lines_matches_reference(ref_ns):
    from tablestructurerec_spark.core.lines import final_adjust_lines

    rng = random.Random(2)
    for _ in range(100):
        rows = [list(l) for l in _rand_lines(rng, rng.randint(1, 5), True)]
        cols = [list(l) for l in _rand_lines(rng, rng.randint(1, 5), False)]
        ref_r, ref_c = ref_ns["final_adjust_lines"](copy.deepcopy(rows), copy.deepcopy(cols))
        my_r, my_c = final_adjust_lines(copy.deepcopy(rows), copy.deepcopy(cols))
        assert np.allclose(np.asarray(ref_r, float), np.asarray(my_r, float), atol=1e-9)
        assert np.allclose(np.asarray(ref_c, float), np.asarray(my_c, float), atol=1e-9)


def test_fit_line_and_side_match_reference(ref_ns):
    from tablestructurerec_spark.core.lines import fit_line, point_line_side

    rng = random.Random(3)
    for _ in range(300):
        p1 = (rng.uniform(0, 100), rng.uniform(0, 100))
        p2 = (rng.uniform(0, 100), rng.uniform(0, 100))
        assert np.allclose(ref_ns["fit_line"]([p1, p2]), fit_line([p1, p2]), atol=1e-12)
        a, b, c = fit_line([p1, p2])
        p = (rng.uniform(0, 100), rng.uniform(0, 100))
        assert np.isclose(
            ref_ns["point_line_cor"](np.array(p), a, b, c),
            point_line_side(p, a, b, c),
            atol=1e-9,
        )


def test_table_recover_matches_reference_on_synth_grids():
    """recover_logic_points vs the reference TableRecover (numpy-only module)
    on every multi-column table the synthetic grammar emits + jittered
    variants."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_tr", "/root/reference/wired_table_rec/table_recover.py"
    )
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    from tablestructurerec_spark.core.html_parse import (
        extract_turn,
        quads_from_logic_points,
    )
    from tablestructurerec_spark.core.recover import recover_logic_points
    from tablestructurerec_spark.sources.synthetic import _rows_for_conv

    rng = np.random.default_rng(4)
    n = div = 0
    for conv in range(120):
        for text in _rows_for_conv(42, conv, 6)["text"]:
            for lp, _texts in extract_turn(text)[1]:
                lp = np.asarray(lp)
                if not lp.size or lp[:, 3].max() == 0:
                    continue
                quads = np.asarray(quads_from_logic_points(lp), dtype=float)
                quads = quads + rng.uniform(-2.0, 2.0, size=quads.shape)
                mine = np.asarray(recover_logic_points(quads))
                _, reflp = ref.TableRecover()(quads.reshape(-1, 4, 2))
                n += 1
                if not np.array_equal(reflp, mine):
                    div += 1
    assert n > 200 and div == 0, (n, div)
