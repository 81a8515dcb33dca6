"""Deterministic synthetic multi-turn transcripts (seeded, no external data).

Generates the input table from BASELINE.json's ``input_hint``:
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)``.  Turn text mixes prose, HTML boilerplate, and 0..k embedded
``<table>`` fragments rendered through OUR html grammar
(:func:`tablestructurerec_spark.core.html_render.render_table_html`) from
known logical fixtures — so the expected extraction output of every turn is
known by construction and per-turn text equality is decidable.

Conversation sizes are Zipfian to exercise skew handling / conv_id salting.
Generation is pure per (seed, conv) and executed distributed: the driver only
plans ``spark.range(n_convs)``; rows materialize in ``mapInPandas`` on
executors — no driver-side loop, scales to any row count.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta
from typing import Iterator, List

import numpy as np
import pandas as pd

from ..core.html_render import render_table_html

__all__ = ["TRANSCRIPT_SCHEMA", "synth_transcripts", "expected_tables_for_turn"]

# derived from the single canonical definition so the two cannot drift
from .transcripts import TRANSCRIPT_FIELDS as _FIELDS

TRANSCRIPT_SCHEMA = ", ".join(
    f"{n} {t.simpleString()}" for n, t in _FIELDS.items()
)

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu table cell row column span merge header footer value"
).split()

_ROLES = ("user", "assistant", "tool")
_TOOLS = (None, "search", "python", "browser")

_BOILERPLATE = (
    '<nav class="top">home | docs | pricing</nav>',
    "<script>var t = setInterval(tick, 1000);</script>",
    "<style>.cell { border: 1px solid; }</style>",
    "<footer>© example corp — all rights reserved</footer>",
    "<!-- tracking pixel -->",
    '<aside id="promo">subscribe now!</aside>',
)

_EPOCH = datetime(2025, 1, 1)


def _turn_rng(seed: int, conv: int, turn: int) -> random.Random:
    return random.Random((seed * 1_000_003 + conv) * 1_000_003 + turn)


def _prose(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def _random_table_fixture(rng: random.Random):
    """A random logical grid (with possible spans) + cell texts.

    Returns (logic_points, cell_texts) in reading order, spans non-overlapping
    by construction (greedy grid fill).
    """
    n_rows = rng.randint(1, 5)
    n_cols = rng.randint(1, 5)
    taken = [[False] * n_cols for _ in range(n_rows)]
    logic: List[List[int]] = []
    texts: List[List[str]] = []
    for r in range(n_rows):
        c = 0
        while c < n_cols:
            if taken[r][c]:
                c += 1
                continue
            max_cspan = 1
            while c + max_cspan < n_cols and not taken[r][c + max_cspan]:
                max_cspan += 1
            cspan = rng.randint(1, min(2, max_cspan)) if rng.random() < 0.2 else 1
            rspan = rng.randint(1, min(2, n_rows - r)) if rng.random() < 0.2 else 1
            for rr in range(r, r + rspan):
                for cc in range(c, c + cspan):
                    taken[rr][cc] = True
            logic.append([r, r + rspan - 1, c, c + cspan - 1])
            n_lines = rspan * cspan if rng.random() < 0.3 else 1
            texts.append([_prose(rng, rng.randint(1, 3)) for _ in range(n_lines)])
            c += cspan
    # occasionally leave a cell textless.  Only 1x1 cells may be textless:
    # an empty cell spanning OUT of the renderer's valid row/col window emits
    # no <td> at all (ref plot_html_table's skip rule,
    # utils_table_recover.py:458-460), making the HTML ambiguous — the same
    # lossiness the reference has; the oracle corpus must stay unambiguous.
    if logic and rng.random() < 0.3:
        unit_cells = [i for i, lp in enumerate(logic) if lp[0] == lp[1] and lp[2] == lp[3]]
        if unit_cells:
            texts[rng.choice(unit_cells)] = [""]
    return logic, texts


def _compose_turn(rng: random.Random):
    """(turn text, [embedded table html...]) — single source of truth so the
    oracle (:func:`expected_tables_for_turn`) replays identical draws."""
    parts = [_prose(rng, rng.randint(5, 30))]
    n_tables = rng.choices((0, 1, 2), weights=(5, 4, 1))[0]
    tables: List[str] = []
    for _ in range(n_tables):
        logic, texts = _random_table_fixture(rng)
        html = render_table_html(logic, dict(enumerate(texts)))
        tables.append(html)
        parts.append(rng.choice(_BOILERPLATE))
        parts.append(html)
        parts.append(_prose(rng, 5))
    parts.append(rng.choice(_BOILERPLATE))
    return " ".join(parts), tables


def expected_tables_for_turn(seed: int, conv: int, turn: int) -> List[str]:
    """The exact normalized table HTML this turn embeds (the oracle)."""
    return _compose_turn(_turn_rng(seed, conv, turn))[1]


def _turn_text(rng: random.Random) -> str:
    return _compose_turn(rng)[0]


def _conv_turn_count(seed: int, conv: int, mean_turns: int) -> int:
    """Zipfian-ish: a few conversations are huge, most are short."""
    rng = random.Random(seed * 7_368_787 + conv)
    z = rng.paretovariate(1.5)
    return max(1, min(int(z * mean_turns / 3), mean_turns * 50))


def _rows_for_conv(seed: int, conv: int, mean_turns: int) -> pd.DataFrame:
    n_turns = _conv_turn_count(seed, conv, mean_turns)
    recs = []
    for t in range(n_turns):
        rng = _turn_rng(seed, conv, t)
        role = _ROLES[t % 3] if rng.random() < 0.9 else rng.choice(_ROLES)
        text = _turn_text(_turn_rng(seed, conv, t))
        tool = rng.choice(_TOOLS) if role == "tool" else None
        recs.append(
            {
                "conv_id": f"conv-{conv:08d}",
                "turn_idx": np.int32(t),
                "role": role,
                "text": text,
                "tool": tool,
                "ts": _EPOCH + timedelta(seconds=conv * 7919 + t * 37),
            }
        )
    return pd.DataFrame(recs)


def synth_transcripts(spark, n_convs: int, mean_turns: int = 8, seed: int = 42):
    """Distributed deterministic transcripts DataFrame.

    ``spark.range`` plans the conv ids; each executor materializes its convs
    in pandas batches.  Deterministic w.r.t. (seed, n_convs, mean_turns)
    regardless of partitioning.
    """
    # 3x parallelism: Zipfian conv sizes make equal-count partitions unequal
    # in rows; over-partitioning lets the scheduler rebalance stragglers
    base = spark.range(0, n_convs).repartition(3 * max(spark.sparkContext.defaultParallelism, 1))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one concatenated frame per INPUT batch, not one ~8-row frame per
        # conversation: 128k convs would otherwise emit 128k miniature
        # Arrow record batches whose per-batch IPC framing dominates
        for pdf in batches:
            frames = [_rows_for_conv(seed, int(conv), mean_turns) for conv in pdf["id"].tolist()]
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return base.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
