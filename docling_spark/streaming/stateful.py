"""Custom stateful streaming operator: incremental conversation assembly.

The reference assembles a document once all its pages are in
(standard_pdf_pipeline.py:982-1048, reorder + concat). In a stream,
turns of a conversation arrive across micro-batches; this operator keeps
per-conversation state (turns seen so far) with
``applyInPandasWithState`` and emits the assembled conversation when the
conversation goes idle (processing-time timeout) — the streaming form of
``assemble_conversations``.

State: one row per conv_id holding parallel arrays (turn_idx, text) plus
a turn counter. Timeout: GroupStateTimeout.ProcessingTimeTimeout — an idle
conversation flushes after ``idle_ms``. Emitted rows are identical to the
batch assembler's output for the same turns (sorted by turn_idx at flush,
never by arrival order).

Scale notes: state is per-conversation and bounded by turn count; the
grouping key is conv_id, so a skewed conversation lands on one task —
acceptable because state updates are O(batch) appends; the heavy
extraction runs stateless BEFORE this operator.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("turn_idxs", T.ArrayType(T.IntegerType()), True),
        T.StructField("texts", T.ArrayType(T.StringType()), True),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("conversation_text", T.StringType(), True),
        T.StructField("n_turns", T.IntegerType(), True),
    ]
)


def _assemble(conv_id: str, idxs: list[int], texts: list[str],
              sep: str) -> pd.DataFrame:
    order = sorted(range(len(idxs)), key=lambda i: idxs[i])
    return pd.DataFrame(
        {
            "conv_id": [conv_id],
            "conversation_text": [sep.join(texts[i] for i in order)],
            "n_turns": [len(idxs)],
        }
    )


def make_assembler(idle_ms: int = 30_000, sep: str = "\n\n"):
    """Returns the (key, batches, state) function for applyInPandasWithState."""

    def assemble(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            (idxs, texts) = state.get
            state.remove()
            yield _assemble(conv_id, list(idxs), list(texts), sep)
            return
        idxs, texts = ([], []) if not state.exists else [list(x) for x in state.get]
        for pdf in pdfs:
            idxs.extend(int(v) for v in pdf["turn_idx"])
            texts.extend(str(v) for v in pdf["extracted_text"])
        state.update((idxs, texts))
        state.setTimeoutDuration(idle_ms)
        return
        yield  # pragma: no cover — generator form

    return assemble


def assemble_conversations_stream(
    extracted: DataFrame, idle_ms: int = 30_000, sep: str = "\n\n"
) -> DataFrame:
    """extracted turn stream → assembled-conversation stream (update mode)."""
    return (
        extracted.select("conv_id", "turn_idx", "extracted_text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            make_assembler(idle_ms, sep),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
