"""Skew-mitigation operators: salting for hot keys.

AQE's skew-join splitting (enabled in ``session.get_spark``) handles most
runtime skew; these explicit operators are for the cases AQE can't fix —
a groupBy where one key holds half the data (partial aggregation helps but
the final reduce still lands on one task for non-algebraic aggregates),
and a join where the hot side must be spread before the shuffle.

Both are pure DataFrame compositions: salt = deterministic hash-derived
bucket, so results are reproducible at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(n_salts: int, *cols: Column | str) -> Column:
    """Deterministic salt in [0, n_salts) from row content (xxhash64) —
    reproducible, unlike F.rand-based salting."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.pmod(F.xxhash64(*cs), F.lit(n_salts)).cast("int")


def salted_sum(df: DataFrame, keys: list[str], value_cols: list[str],
               n_salts: int = 16, salt_on: list[str] | None = None) -> DataFrame:
    """Two-phase salted SUM/COUNT aggregation.

    Phase 1 groups by (keys + salt) — the hot key's rows spread over
    ``n_salts`` reducers; phase 2 merges the ``n_salts`` partials per key.
    Counts ride along as ``n_rows``. Sums are decimal-routed so the
    two-phase result is bit-identical to a single-phase sum.

    Salt choice: by default the salt is position-derived
    (``monotonically_increasing_id``), which spreads a hot key uniformly
    even when its rows are byte-identical — the common skew shape of a
    constant/default value, where any content-derived hash would collapse
    to ONE salt and silently degrade to the unsalted plan. The salt only
    routes rows to partial aggregates; SUM/COUNT merge exactly (decimal
    arithmetic), so the RESULT is identical under any salt assignment —
    position-derived salting costs no determinism. Pass ``salt_on`` (a
    high-cardinality column set, e.g. a row id) when a content-derived,
    layout-independent salt is required.
    """
    if salt_on:
        salt = _salt(n_salts, *salt_on)
    else:
        salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                      F.lit(n_salts)).cast("int")
    salted = df.withColumn("__salt", salt)
    partial = (salted.groupBy(*keys, "__salt")
               .agg(F.count(F.lit(1)).alias("__n"),
                    *[F.sum(F.col(c).cast("decimal(28,6)")).alias(f"__s_{c}")
                      for c in value_cols]))
    return (partial.groupBy(*keys)
            .agg(F.sum("__n").alias("n_rows"),
                 *[F.round(F.sum(f"__s_{c}"), 2).cast("double").alias(f"sum_{c}")
                   for c in value_cols]))


def salted_latest(df: DataFrame, keys: list[str], ts_col: str,
                  tiebreak: str, n_salts: int = 16) -> DataFrame:
    """Skew-safe W1 dedup-latest: keep each key's row with the greatest
    ``(ts_col, tiebreak)`` via TWO-PHASE max-struct aggregation instead of
    a ``row_number`` window.

    The window form (reference ``etl_target_loader.py:118-124``) sorts a
    key's ENTIRE row set inside one task — AQE cannot split a skewed
    window partition, so a key holding 20% of the fact serializes 20% of
    the data through one core. Here phase 1 maxes per (key, salt) — the
    hot key's rows spread over ``n_salts`` reducers and collapse to one
    row each — and phase 2 merges ``n_salts`` candidate rows per key.
    max(struct) compares fields left-to-right, so with a per-key-unique
    ``tiebreak`` the surviving row is EXACTLY the window's
    ``ORDER BY ts DESC, tiebreak DESC`` rank-1 row (nulls sort smallest,
    matching the window's desc NULLS LAST). Same column set and order as
    the input.
    """
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                  F.lit(n_salts)).cast("int")
    rest = [c for c in df.columns if c not in keys]
    ordered = [ts_col, tiebreak] + [c for c in rest
                                    if c not in (ts_col, tiebreak)]
    s = F.struct(*[F.col(c) for c in ordered])
    partial = (df.withColumn("__salt", salt)
                 .groupBy(*keys, "__salt").agg(F.max(s).alias("__m")))
    final = partial.groupBy(*keys).agg(F.max("__m").alias("__m"))
    return final.select(*keys,
                        *[F.col(f"__m.{c}").alias(c) for c in ordered]) \
                .select(*df.columns)


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Skewed equi-join: salt the big side, replicate the small side once
    per salt value, join on (key, salt).

    Use when the small side is too large to broadcast AND the big side has
    hot keys; the replication factor is ``n_salts`` on the small side only.

    Only ``inner`` and ``left`` are supported: with ``right``/``full``,
    an unmatched small-side row exists in all ``n_salts`` replicas and
    would be emitted ``n_salts`` times — silent duplicate output.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: the "
            "small side is replicated per salt, so right/full would emit "
            "unmatched small-side rows once per replica")
    # salt from full row content — deterministic at any parallelism
    # (identical rows share a salt, which is harmless)
    big_s = big.withColumn("__salt", _salt(n_salts, *big.columns))
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    out = big_s.join(small_s, [key, "__salt"], how)
    return out.drop("__salt")
