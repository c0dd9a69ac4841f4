"""Shared operator helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_group_stats(df: DataFrame, stats: DataFrame,
                     group_cols: list[str], how: str = "inner",
                     broadcast: bool = True) -> DataFrame:
    """Join per-group statistics back onto ``df`` with NULL-SAFE key
    equality, keeping ``df``'s key columns.

    ``groupBy`` emits a row for the NULL group, but a plain
    ``df.join(stats, group_cols)`` uses null-unsafe ``=`` and silently
    drops every row whose group key is NULL — an annotate-style operator
    would return fewer rows than it was given. ``eqNullSafe`` (``IS NOT
    DISTINCT FROM``) matches the NULL group to its own stats row instead.

    The stats side's key columns are renamed before the join and dropped
    after, so the output schema is ``df``'s columns plus the stats
    columns (no ambiguous duplicates). The stats side is broadcast by
    default — it is group-cardinality-sized by construction.
    """
    renames = {c: f"__k_{c}" for c in group_cols}
    s = stats
    for c, r in renames.items():
        s = s.withColumnRenamed(c, r)
    if broadcast:
        s = F.broadcast(s)
    cond = None
    for c, r in renames.items():
        e = df[c].eqNullSafe(s[r])
        cond = e if cond is None else cond & e
    return df.join(s, cond, how).drop(*renames.values())
