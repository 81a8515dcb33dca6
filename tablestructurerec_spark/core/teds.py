"""TEDS-style table-structure similarity (evaluation metric).

The reference evaluates with TEDS / TEDS-only-structure
(README_en.md:46-73, via the external TableRecognitionMetric package).  This
is a from-scratch, dependency-free *structure* variant over the engine's own
IR: both HTML tables parse to span grids; similarity is the F1 of exactly-
matching logical cells (same span rectangle; optionally same text), which
equals 1.0 iff the structures are identical — the property the evaluation
actually gates on.  It is NOT the original tree-edit-distance formulation;
it is monotone in the same mistakes (split/merged/shifted spans, dropped or
invented cells).
"""

from __future__ import annotations

from typing import Tuple

from .html_parse import parse_table_html

__all__ = ["structure_similarity", "structure_similarity_spans"]


def structure_similarity(pred_html: str, gold_html: str, with_text: bool = False) -> float:
    """Span-set F1 between two table HTML fragments (1.0 = identical)."""
    p_logic, p_texts = parse_table_html(pred_html)
    g_logic, g_texts = parse_table_html(gold_html)
    if with_text:
        p = {(tuple(lp), tuple(t)) for lp, t in zip(p_logic, p_texts)}
        g = {(tuple(lp), tuple(t)) for lp, t in zip(g_logic, g_texts)}
        return _span_f1(p, g)
    return structure_similarity_spans(p_logic, g_logic)


def structure_similarity_spans(p_logic, g_logic) -> float:
    """Structure-only F1 straight from span lists — for callers that already
    hold the logical cells (the extraction output carries ``logic_points``,
    so the distributed eval never re-parses its own ``pred_html``)."""
    return _span_f1({tuple(lp) for lp in p_logic}, {tuple(lp) for lp in g_logic})


def _span_f1(p: set, g: set) -> float:
    if not p and not g:
        return 1.0
    if not p or not g:
        return 0.0
    tp = len(p & g)
    if tp == 0:
        return 0.0
    precision = tp / len(p)
    recall = tp / len(g)
    return 2 * precision * recall / (precision + recall)
