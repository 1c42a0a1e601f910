"""Broadcast-join enrichment with role/tool metadata.

The reference has no lookup stage (capability gap, SURVEY.md §2 Part B);
the north_star mandates one. The lookup is tiny (~tens of rows) so it is
ALWAYS broadcast — at 10^12-turn scale this is the difference between a
map-side hash join (no shuffle of the fact table, plan shows
BroadcastHashJoin) and a catastrophic sort-merge shuffle of the whole
turns table. Left join: unmatched turns keep flowing with nulls — the
reference's handler drops nothing (reference: mirror/mirror.go:30-37).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_turns(
    turns: DataFrame,
    lookup: DataFrame,
    keys: tuple[str, ...] = ("role", "tool"),
) -> DataFrame:
    return turns.join(F.broadcast(lookup), on=list(keys), how="left")
