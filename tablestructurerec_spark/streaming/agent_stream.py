"""Real-time agent-loop monitoring — the streaming twin of
``tooluse.agent_loop_audit`` (an assistant stuck re-issuing the same tool
call is the pathology you want to ALERT on while the trace is being
ingested, not discover in tomorrow's batch audit).

Custom stateful operator (``applyInPandasWithState``, the
``stream_conversation_sessions`` precedent): state per conversation is
EIGHT SCALARS — ``(last_turn_idx, last_was_tool, last_tool, run_len,
max_run, n_loop_runs, n_tool_turns, n_disordered)`` — O(live
conversations), never O(turns).  Each trigger folds its rows through EXACTLY the batch
operator's run semantics (a run breaks when the previous turn is not a
tool turn or names a different tool, null-safe) and emits the
conversation's current verdict in update mode.

Ordering contract (stated, not assumed away): run detection is defined
over turn order, so the stream requires per-conversation STRICTLY
INCREASING ``turn_idx`` delivery ACROSS triggers (the standard shape when
a conversation maps to one Kafka partition); rows inside one trigger —
across ALL of the group's Arrow chunks, which arrive as an iterator in
arbitrary order — are gathered and sorted ONCE before folding, so
in-trigger disorder is handled exactly.  A row arriving with
``turn_idx <= last_turn_idx`` (a stale cross-trigger replay, or an
at-least-once re-delivery of an already-folded turn) cannot be folded
retroactively with scalar state — it is COUNTED in the emitted
``n_disordered`` column (an audit surface, not a silent wrong answer)
and skipped.

Equivalence to the batch audit (tested through real readStream runs,
including a checkpoint-restart split): for in-order delivery the emitted
final verdict per conversation equals ``agent_loop_audit``'s
``(max_run_len, n_loop_runs, is_looping)`` row exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tablestructurerec_spark.operators.tooluse import LOOP_LIMIT

__all__ = ["stream_agent_loop_alerts"]


def stream_agent_loop_alerts(
    stream_df: DataFrame, loop_limit: int = LOOP_LIMIT
) -> DataFrame:
    """Per-conversation loop verdicts over a streaming transcript frame
    ``(conv_id, turn_idx, role, tool, ...)`` — update output mode; emits
    only conversations with at least one tool turn so far."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    src = stream_df.select("conv_id", "turn_idx", "role", "tool")

    out_schema = (
        "conv_id string, n_tool_turns long, max_run_len long, "
        "n_loop_runs long, is_looping boolean, n_disordered long"
    )
    state_schema = (
        "last_turn_idx long, last_was_tool boolean, last_tool string, "
        "run_len long, max_run long, n_loop_runs long, n_tool_turns long, "
        "n_disordered long"
    )

    def fn(key, pdfs, state):
        import pandas as pd

        (conv_id,) = key
        if state.exists:
            (last_ti, last_was_tool, last_tool, run_len, max_run,
             n_loops, n_tool, n_dis) = state.get
        else:
            last_ti, last_was_tool, last_tool = -1, False, None
            run_len = max_run = n_loops = n_tool = n_dis = 0

        def seal_run():
            nonlocal n_loops
            if run_len >= loop_limit:
                n_loops += 1

        # a group's rows arrive as an ITERATOR of Arrow chunks in arbitrary
        # order — gather and sort ONCE per trigger (the extract_stream
        # sessionizer precedent); per-chunk sorting would misread a
        # conversation spanning two chunks as disordered (found in review)
        chunks = list(pdfs)
        batch = pd.concat(chunks) if chunks else pd.DataFrame()
        if len(batch):
            batch = batch.sort_values("turn_idx")
            for ti, role, tool in zip(
                batch["turn_idx"], batch["role"], batch["tool"]
            ):
                ti = int(ti)
                if ti <= last_ti:
                    n_dis += 1
                    continue
                is_tool = role == "tool"
                tool = None if pd.isna(tool) else tool
                if is_tool:
                    n_tool += 1
                    if last_was_tool and tool == last_tool:
                        run_len += 1
                    else:
                        seal_run()
                        run_len = 1
                    max_run = max(max_run, run_len)
                else:
                    seal_run()
                    run_len = 0
                last_ti, last_was_tool, last_tool = ti, is_tool, tool

        state.update((last_ti, bool(last_was_tool), last_tool, run_len,
                      max_run, n_loops, n_tool, n_dis))
        if n_tool == 0:
            return iter(())
        # the CURRENT open run counts toward the verdict exactly as the
        # batch audit would count it if the conversation ended here
        n_loops_now = n_loops + (1 if run_len >= loop_limit else 0)
        return iter(
            [
                pd.DataFrame(
                    {
                        # out schema pins string; accept any key type
                        "conv_id": [str(conv_id)],
                        "n_tool_turns": [n_tool],
                        "max_run_len": [max_run],
                        "n_loop_runs": [n_loops_now],
                        "is_looping": [n_loops_now > 0],
                        "n_disordered": [n_dis],
                    }
                )
            ]
        )

    return src.groupBy("conv_id").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
