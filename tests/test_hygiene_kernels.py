"""Direct kernel checks for the hygiene run-length aggregates: the Spark
expressions must equal a Python Counter ground truth on random inputs
(the DuckDB oracle checks end-to-end equality; this isolates the kernels)."""

import random
from collections import Counter

from pyspark.sql import functions as F

from tablestructurerec_spark.operators.hygiene import _dup_run_chars, _occurrence_max


def _truth_occurrence_max(arr):
    return max(Counter(arr).values()) if arr else 0


def _truth_dup_chars(arr):
    return sum(c * len(s) for s, c in Counter(arr).items() if c > 1)


def test_run_length_kernels_match_counter_truth(spark):
    rng = random.Random(20260817)
    vocab = ["a", "bb", "ccc", "dddd", "e", "ff f", ""]  # incl. empty string
    rows = []
    for i in range(300):
        n = rng.randrange(0, 30)
        rows.append((i, [rng.choice(vocab) for _ in range(n)]))
    df = spark.createDataFrame(rows, "id long, arr array<string>")
    got = {
        r.id: (r.occ, r.dup)
        for r in df.select(
            "id",
            _occurrence_max(F.col("arr")).alias("occ"),
            _dup_run_chars(F.array_sort("arr")).alias("dup"),
        ).collect()
    }
    for i, arr in rows:
        assert got[i][0] == _truth_occurrence_max(arr), (i, arr)
        assert got[i][1] == _truth_dup_chars(arr), (i, arr)


# ---------------------------------------------------------------------------
# corpus repeated-substring islands: planted duplicates vs python recompute
# ---------------------------------------------------------------------------
def _truth_islands(texts, w=32):
    """From-scratch reference: content-anchored windows (space + the
    codepoint class, mirroring hygiene._ANCHOR_MOD) -> global repeat
    count -> per-doc merged [s0, e1) islands."""
    from collections import Counter

    from tablestructurerec_spark.operators.hygiene import _ANCHOR_MOD

    wins = {}
    counts = Counter()
    for doc_id, t in texts:
        ws = []
        if len(t) >= w:
            for k in range(len(t) - w + 1):
                if k == 0 or t[k] == " " or ord(t[k]) % _ANCHOR_MOD == 0:
                    sub = t[k : k + w]
                    ws.append((k, sub))
                    counts[sub] += 1
        wins[doc_id] = ws
    islands = {}
    for doc_id, ws in wins.items():
        spans = sorted((st, st + w) for st, sub in ws if counts[sub] > 1)
        merged = []
        for st, en in spans:
            if merged and st <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], en)
            else:
                merged.append([st, en])
        if merged:
            islands[doc_id] = [tuple(m) for m in merged]
    return islands


def test_dup_islands_match_planted_duplicates(spark):
    from tablestructurerec_spark.operators.hygiene import _dup_islands

    rng = random.Random(42)
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789"

    def words(n_chars):
        # word-like text (space every ~5 chars) — the operator's documented
        # domain; the content anchor needs a space inside the first
        # _SPAN_W+1 chars of a repeated block to guarantee detection
        out = []
        while sum(len(w) + 1 for w in out) < n_chars:
            out.append("".join(rng.choice(alpha) for _ in range(rng.randrange(2, 9))))
        return " ".join(out)

    block = words(64)  # planted boilerplate
    texts = []
    for i in range(60):
        body = words(rng.randrange(10, 300))
        if i % 3 == 0:  # plant the shared block at a random offset
            pos = rng.randrange(0, max(1, len(body)))
            body = body[:pos] + " " + block + " " + body[pos:]
        if i == 7:  # intra-doc repetition: same 40 chars twice
            rep = body[:40]
            body = rep + body + rep
        texts.append((i, body))
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {}
    for r in _dup_islands(df).collect():
        got.setdefault(r.doc_id, []).append((r.s0, r.e1))
    got = {k: sorted(v) for k, v in got.items()}
    assert got == _truth_islands(texts)
    # semantic recall check (independent of the shared algorithm): every
    # doc carrying the planted block at an ARBITRARY offset must have an
    # island overlapping its copy — this is what the content-defined
    # anchoring buys (a position stride only catches offsets agreeing mod
    # the stride)
    for i, body in texts:
        if i % 3 == 0:
            pos = body.index(block)
            assert any(
                s0 < pos + len(block) and e1 > pos for s0, e1 in got.get(i, [])
            ), (i, pos)


def test_strip_repeated_removes_planted_boilerplate(spark, tmp_path):
    """End-to-end: write a corpus with a planted repeated block as a real
    documents table, run q_strip_repeated, and assert the block is gone
    from every planted doc while unplanted docs pass through unchanged."""
    import pandas as pd

    from tablestructurerec_spark.operators.hygiene import q_strip_repeated

    rng = random.Random(7)
    alpha = "abcdefghijklmnopqrstuvwxyz"

    def words(n_chars):
        out = []
        while sum(len(w) + 1 for w in out) < n_chars:
            out.append("".join(rng.choice(alpha) for _ in range(rng.randrange(2, 9))))
        return " ".join(out)

    block = words(80)
    rows = []
    for i in range(40):
        body = words(rng.randrange(60, 200))
        if i % 2 == 0:
            pos = rng.randrange(0, len(body))
            body = body[:pos] + " " + block + " " + body[pos:]
        rows.append({"doc_id": i, "text": body, "lang": "en", "source": "s",
                     "n_chars": len(body)})
    pdf = pd.DataFrame(rows)
    sf_dir = str(tmp_path)
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(pdf), f"{sf_dir}/documents.parquet")
    out = {r.doc_id: r for r in q_strip_repeated(spark, sf_dir).collect()}
    originals = {r["doc_id"]: r["text"] for r in rows}
    for i, text in originals.items():
        if i % 2 == 0:
            assert block not in out[i].clean_text, i
            # spans cover anchored windows only, so up to ~a window length
            # at each block edge can survive (before the first in-block
            # space / past the last window fit)
            assert out[i].removed_chars >= len(block) - 2 * 32, i
        else:
            # unplanted random word salad: may share short windows by
            # chance only if a 32-char run repeats — with 26^~27 content
            # that never happens, so it must pass through byte-identical
            assert out[i].clean_text == text, i
            assert out[i].removed_chars == 0, i


def test_span_clusters_planted_multidoc(spark):
    """Three docs share one exact 44-char block: one cluster, three members,
    exactly one keep_first (the (doc_id, s0)-minimal one)."""
    from tablestructurerec_spark.operators.hygiene import _span_clusters

    block = "this shared boilerplate block repeats often!"  # 44 chars, spaced
    assert len(block) == 44
    mk = lambda i, pre: (i, f"{pre} {block} tail unique to doc {i} " + "x" * i)
    docs = spark.createDataFrame(
        [
            mk(3, "zebra opening words here"),
            mk(7, "different lead in text ok"),
            mk(11, "third document preamble aa"),
            (20, "a wholly unique document with no repeats at all " + "z" * 40),
        ],
        "doc_id long, text string",
    )
    out = _span_clusters(docs).toPandas()
    assert set(out["doc_id"]) == {3, 7, 11}  # the unique doc emits nothing
    # the shared block resolves to one cluster covering all three docs
    top = out[out["n_members"] == 3]
    assert len(top) == 3 and top["cluster_id"].nunique() == 1
    keepers = top[top["keep_first"]]
    assert len(keepers) == 1 and keepers.iloc[0]["doc_id"] == 3
    # spans carry identical content (the cluster key's definition)
    texts = {r.doc_id: r.text for r in docs.collect()}
    contents = {
        texts[r.doc_id][int(r.s0) : int(r.e1)] for _, r in top.iterrows()
    }
    assert len(contents) == 1 and block in contents.pop()
