"""Custom stateful streaming operator via applyInPandasWithState.

The reference's only cross-message state is the per-connection session
step and the mirror's growing per-tag map (reference:
message/session.go:15-22, mirror/mirror.go:16). This operator is the
streaming-native upgrade: per-conversation state that survives across
micro-batches — tracking how many turns of each conversation have
arrived, the max turn_idx seen, and whether the conversation looks
complete (no gaps in 0..max), emitted as an update per batch.

State is a compact fixed-width tuple per conv_id; at 10^12-turn scale
state size is O(live conversations), not O(turns), and the state store
shards by the groupBy key exactly like the mirror's map-by-tag, minus
the global mutex (mirror/mirror.go:28-29).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "conv_id string, n_turns long, max_turn_idx int, complete boolean, "
    "batches int"
)
STATE_SCHEMA = "n_turns long, max_turn_idx int, batches int"


def _track(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    n, mx, batches = state.get if state.exists else (0, -1, 0)
    for pdf in pdfs:
        n += len(pdf)
        mx = max(mx, int(pdf["turn_idx"].max()))
        batches += 1
    state.update((n, mx, batches))
    # dense turn_idx contract (FIXTURES.md §1): complete ⇔ saw 0..max
    yield pd.DataFrame(
        [
            {
                "conv_id": conv_id,
                "n_turns": n,
                "max_turn_idx": mx,
                "complete": n == mx + 1,
                "batches": batches,
            }
        ]
    )


def conversation_progress(stream: DataFrame) -> DataFrame:
    """Per-conversation cumulative progress, updated each micro-batch."""
    return (
        stream.select("conv_id", "turn_idx")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _track,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
