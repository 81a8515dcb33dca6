"""Logical-grid assembly and HTML rendering.

Reproduces (from scratch) the reference's table-reconstruction tail:
* grid merge of duplicate logical cells  — ref lineless_table_rec/main.py:199-238
* per-cell envelope/intermediate record  — ref lineless_table_rec/main.py:137-164
* blank-cell backfill                    — ref lineless_table_rec/main.py:240-253
* HTML rendering with span elision rules — ref utils_table_recover.py:409-475
* full-document wrapper                  — ref utils_table_recover.py:579-605

Golden-pinned by the 9 exact-HTML cases in the reference's
tests/test_lineless_table_rec.py:197-256 (twin test_wired_table_rec.py:247-306).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from .geometry import quad_to_box

__all__ = [
    "render_table_html",
    "merge_grid_duplicates",
    "cell_records_from_match",
    "backfill_empty_cells",
    "wrap_html_document",
]


def render_table_html(
    logic_points: Sequence[Sequence[int]], cell_texts: Dict[int, List[str]]
) -> str:
    """Render ``<html><body><table>...`` from logical spans + cell text lists.

    Contract (ref utils_table_recover.py:409-475), reproduced exactly —
    including its asymmetries, which the goldens pin:
    * the valid window is derived only from cells whose joined text is
      non-empty: rows **above** the first valid row are skipped but trailing
      rows are all kept; columns are clipped on **both** sides;
    * an empty grid slot renders ``<td></td>``;
    * a slot covered by a cell with no text entry renders **nothing at all**
      (no ``<td>``), silently narrowing that row;
    * a covered slot renders its cell only at the span origin, as
      ``<td rowspan=R colspan=C>`` with ``<br>``-joined text lines;
    * later cells overwrite earlier ones in overlapping grid slots.
    """
    n_rows = 0
    n_cols = 0
    for lp in logic_points:
        n_rows = max(n_rows, lp[1] + 1)
        n_cols = max(n_cols, lp[3] + 1)

    grid: List[List[Optional[tuple]]] = [[None] * n_cols for _ in range(n_rows)]
    first_valid_row = (1 << 16) - 1
    first_valid_col = (1 << 16) - 1
    last_valid_col = 0
    for idx, lp in enumerate(logic_points):
        r0, r1, c0, c1 = lp[0], lp[1], lp[2], lp[3]
        texts = cell_texts.get(idx)
        if texts and "".join(texts):
            first_valid_row = min(r0, first_valid_row)
            first_valid_col = min(c0, first_valid_col)
            last_valid_col = max(c1, last_valid_col)
        for r in range(r0, r1 + 1):
            for c in range(c0, c1 + 1):
                grid[r][c] = (idx, r0, r1, c0, c1)

    out = ["<html><body><table>"]
    for r in range(n_rows):
        if r < first_valid_row:
            continue
        row_frag = ["<tr>"]
        for c in range(n_cols):
            if c < first_valid_col or c > last_valid_col:
                continue
            slot = grid[r][c]
            if not slot:
                row_frag.append("<td></td>")
                continue
            idx, r0, r1, c0, c1 = slot
            texts = cell_texts.get(idx)
            if not texts:
                continue
            if r == r0 and c == c0:
                body = "<br>".join(texts)
                row_frag.append(
                    f"<td rowspan={r1 - r0 + 1} colspan={c1 - c0 + 1}>{body}</td>"
                )
        row_frag.append("</tr>")
        out.append("".join(row_frag))
    out.append("</table></body></html>")
    return "".join(out)


def cell_records_from_match(
    matched: Dict[int, list], logic_points, n_cells: int
) -> List[dict]:
    """Build the per-cell intermediate records from a cell→OCR match map.

    Contract (ref lineless_table_rec/main.py:137-164): cells with no OCR rows
    are dropped; each record carries the min/max envelope of its OCR quads
    (corners 0 and 2), the cell's logical span as a plain list, and the OCR
    rows flattened to ``[box_4_1, text]`` pairs.
    """
    records = []
    for i in range(n_cells):
        rows = matched.get(i)
        if not rows:
            continue
        records.append(
            {
                "t_box": [
                    min(r[0][0][0] for r in rows),
                    min(r[0][0][1] for r in rows),
                    max(r[0][2][0] for r in rows),
                    max(r[0][2][1] for r in rows),
                ],
                "t_logic_box": list(logic_points[i]),
                "t_ocr_res": [[quad_to_box(r[0]), r[1]] for r in rows],
            }
        )
    return records


def backfill_empty_cells(cell_quads, matched: Dict[int, list]) -> Dict[int, list]:
    """Give OCR-less cells a placeholder ``[[quad, "", 1]]`` entry.

    Contract: ref lineless_table_rec/main.py:240-253 (wired twin :180-193).
    """
    for i in range(len(cell_quads)):
        if not matched.get(i):
            matched[i] = [[cell_quads[i], "", 1]]
    return matched


def merge_grid_duplicates(records: List[dict]) -> List[dict]:
    """Merge cells that share an identical logical span; drop the duplicates.

    Contract (ref lineless_table_rec/main.py:199-238): scan records in order,
    fill a max_row×max_col grid; when a slot is already held by a record with
    the *same* logical box, fold the newcomer into it (concat OCR rows, union
    envelope) and delete the newcomer; records overlapping a *different*
    logical box leave the earlier occupant in place.
    """
    n_rows, n_cols = 0, 0
    for rec in records:
        n_rows = max(n_rows, rec["t_logic_box"][1] + 1)
        n_cols = max(n_cols, rec["t_logic_box"][3] + 1)
    grid: List[List[Optional[dict]]] = [[None] * n_cols for _ in range(n_rows)]
    dropped = set()
    for i, rec in enumerate(records):
        if i in dropped:
            continue
        r0, r1, c0, c1 = rec["t_logic_box"]
        for r in range(r0, r1 + 1):
            if i in dropped:
                continue
            for c in range(c0, c1 + 1):
                if i in dropped:
                    continue
                holder = grid[r][c]
                if not holder:
                    grid[r][c] = rec
                    continue
                if holder["t_logic_box"] == rec["t_logic_box"]:
                    holder["t_ocr_res"].extend(rec["t_ocr_res"])
                    dropped.add(i)
                    holder["t_box"] = [
                        min(holder["t_box"][0], rec["t_box"][0]),
                        min(holder["t_box"][1], rec["t_box"][1]),
                        max(holder["t_box"][2], rec["t_box"][2]),
                        max(holder["t_box"][3], rec["t_box"][3]),
                    ]
    return [records[i] for i in range(len(records)) if i not in dropped]


def wrap_html_document(table_html: str) -> str:
    """Wrap a ``<table>`` fragment in a styled standalone document.

    Contract: ref utils_table_recover.py:579-605 (same CSS knobs: collapsed
    borders, centered 8px-padded cells, shaded headers).
    """
    return (
        "\n    <!DOCTYPE html>\n"
        '    <html lang="zh-CN">\n'
        "    <head>\n"
        '    <meta charset="UTF-8">\n'
        "    <title>Complex Table Example</title>\n"
        "    <style>\n"
        "        table {\n"
        "            border-collapse: collapse;\n"
        "            width: 100%;\n"
        "        }\n"
        "        th, td {\n"
        "            border: 1px solid black;\n"
        "            padding: 8px;\n"
        "            text-align: center;\n"
        "        }\n"
        "        th {\n"
        "            background-color: #f2f2f2;\n"
        "        }\n"
        "    </style>\n"
        "    </head>\n"
        "    <body>\n"
        f"    {table_html}\n"
        "    </body>\n"
        "    </html>\n    "
    )
