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

__all__ = ["structure_similarity"]


def structure_similarity(pred_html: str, gold_html: str, with_text: bool = False) -> float:
    """Span-set F1 between two table HTML fragments (1.0 = identical)."""
    p_logic, p_texts = parse_table_html(pred_html)
    g_logic, g_texts = parse_table_html(gold_html)
    if not p_logic and not g_logic:
        return 1.0
    if not p_logic or not g_logic:
        return 0.0

    def keyset(logic, texts):
        if with_text:
            return {(tuple(lp), tuple(t)) for lp, t in zip(logic, texts)}
        return {tuple(lp) for lp in logic}

    p, g = keyset(p_logic, p_texts), keyset(g_logic, g_texts)
    tp = len(p & g)
    if tp == 0:
        return 0.0
    precision = tp / len(p)
    recall = tp / len(g)
    return 2 * precision * recall / (precision + recall)
