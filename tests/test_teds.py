from tablestructurerec_spark.core.html_render import render_table_html
from tablestructurerec_spark.core.teds import structure_similarity


def _html(logic, texts):
    return render_table_html(logic, dict(enumerate(texts)))


def test_identical_is_one():
    h = _html([[0, 0, 0, 0], [0, 1, 1, 1]], [["a"], ["b", "c"]])
    assert structure_similarity(h, h) == 1.0
    assert structure_similarity(h, h, with_text=True) == 1.0


def test_span_mistake_penalized():
    gold = _html([[0, 1, 0, 0], [0, 0, 1, 1], [1, 1, 1, 1]], [["a"], ["b"], ["c"]])
    pred = _html([[0, 0, 0, 0], [0, 0, 1, 1], [1, 1, 1, 1]], [["a"], ["b"], ["c"]])
    s = structure_similarity(pred, gold)
    assert 0 < s < 1  # 2 of 3 spans match


def test_text_variant_stricter():
    gold = _html([[0, 0, 0, 0]], [["x"]])
    pred = _html([[0, 0, 0, 0]], [["y"]])
    assert structure_similarity(pred, gold) == 1.0
    assert structure_similarity(pred, gold, with_text=True) == 0.0


def test_empty_cases():
    empty = "<html><body><table></table></body></html>"
    assert structure_similarity(empty, empty) == 1.0
    assert structure_similarity(empty, _html([[0, 0, 0, 0]], [["a"]])) == 0.0
