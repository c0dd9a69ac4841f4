"""Time-series regularization: calendar spine generation + gap filling.

Beyond-reference surface; the reference's date dimension
(``etl_ods_loader.py`` date expansion) builds a calendar but its facts keep
their gaps — every downstream moving average / day-over-day comparison then
silently skips missing days. These operators densify a per-group daily
series and carry observations forward, the standard prep for
inventory-level / balance-style metrics.

Scale shape: the spine is generated per group with ``sequence()`` from the
group's own [min, max] — no driver-side date loop, no cross join against a
global calendar (which would explode sparse groups across the full global
span). One shuffle on the group key for the bounds, one co-partitioned
left join, one window for the forward fill.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .util import join_group_stats


def calendar_spine(df: DataFrame, group_cols: list[str],
                   date_col: str) -> DataFrame:
    """One row per (group, day) for every day in the group's own
    [min(date), max(date)] span — ``sequence(min, max, interval 1 day)``
    exploded, so each group densifies over exactly its active span."""
    bounds = (df.groupBy(*group_cols)
                .agg(F.min(date_col).alias("__lo"),
                     F.max(date_col).alias("__hi")))
    return (bounds.select(
        *group_cols,
        F.explode(F.sequence("__lo", "__hi",
                             F.expr("interval 1 day"))).alias(date_col)))


def gap_fill_forward(df: DataFrame, group_cols: list[str], date_col: str,
                     value_cols: list[str]) -> DataFrame:
    """Densify a per-group daily series and forward-fill (LOCF) the value
    columns across the introduced gaps.

    Output: one row per (group, day) over each group's span, with
    ``<v>_filled`` = last non-null observation at or before the day, and
    ``is_observed`` marking real rows. Observed-but-NULL values are also
    carried over, matching SQL ``last_value(v IGNORE NULLS)`` semantics.

    The forward-fill window is ``rowsBetween(unboundedPreceding, 0)`` per
    group ordered by day — one shuffle; with years of daily data per group
    the per-partition state is the group's span in days, small by
    construction.
    """
    spine = calendar_spine(df, group_cols, date_col)
    # null-safe on the group key: a NULL group has a spine (groupBy emits
    # the NULL-group bounds row) and must get its values back, not a
    # hollow all-NULL series
    joined = join_group_stats(spine, df.withColumn("__obs", F.lit(True)),
                              [*group_cols, date_col], how="left",
                              broadcast=False)
    w = (Window.partitionBy(*group_cols).orderBy(date_col)
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = [F.last(F.col(v), ignorenulls=True).over(w).alias(f"{v}_filled")
              for v in value_cols]
    return joined.select(*group_cols, date_col, *filled,
                         F.coalesce("__obs", F.lit(False)).alias("is_observed"))


def ewma(df: DataFrame, entity_col: str, order_cols: list[str],
         value_col: str, alpha: float = 0.2,
         segment_days: int | None = None) -> DataFrame:
    """Exponentially-weighted moving average per entity, final value:
    s_0 = x_0, s_t = (1-alpha)*s_{t-1} + alpha*x_t (pandas ewm
    adjust=False semantics).

    The recursion is inherently sequential per entity, so it runs as ONE
    in-row fold: collect the entity's ordered series into an array
    (one shuffle on the entity key), then ``aggregate()`` folds it
    left-to-right inside the row — no window re-scan per step, no Python.
    DuckDB's ``list_reduce`` folds in the identical order, so the result
    is bit-exact across engines (same IEEE ops, same sequence).

    Scale: per-entity series must fit one array (~millions of points is
    fine). For pathologically long entities pass ``segment_days=N``
    (VERDICT r12 task 5): the series folds per (entity, N-day time
    block) — bounded arrays at block grain — and blocks chain through
    the closed-form block transfer s_out = (1-α)^k·s_in + Σα(1-α)^{k-i}x_i
    (decay + zero-start contribution, both computed by the SAME
    sequential in-block fold), then one outer fold over the per-entity
    block summaries (2 doubles per block). Mathematically identical to
    the flat recursion; floating-point association differs at ~1 ulp, so
    the segmented twin is for scale, not for oracle replay. Requires
    ``order_cols[0]`` to be a timestamp/date column (it defines the
    blocks). Holt's level+trend recursion segments the same way with a
    2×2 affine transfer per block — :func:`holt_linear_segmented`.

    Returns (entity_col, n_points, ewma double round-6).
    """
    if segment_days is not None:
        return _ewma_segmented(df, entity_col, order_cols, value_col,
                               alpha, segment_days)
    ordered = (df.groupBy(entity_col)
               .agg(F.array_sort(F.collect_list(F.struct(
                       *[F.col(c) for c in order_cols],
                       F.col(value_col).cast("double").alias("__x"))))
                    .alias("__s")))
    xs = F.transform("__s", lambda s: s["__x"])
    fold = F.aggregate(
        F.slice(xs, 2, F.greatest(F.size(xs) - 1, F.lit(0))),
        F.element_at(xs, 1),
        lambda acc, x: acc * F.lit(1.0 - alpha) + x * F.lit(alpha))
    # decimal-routed final rounding (queries/util.py:round2 convention):
    # raw-double F.round and DuckDB round() disagree on exact .xx5
    # boundaries; rounding the decimal(28,8) image is engine-exact
    return ordered.select(
        entity_col, F.size("__s").alias("n_points"),
        F.round(fold.cast("decimal(28,8)"), 6).cast("double")
         .alias("ewma"))


def _ewma_segmented(df: DataFrame, entity_col: str, order_cols: list[str],
                    value_col: str, alpha: float,
                    segment_days: int) -> DataFrame:
    """Block-chained EWMA fold (see :func:`ewma` ``segment_days``).

    Shape: one shuffle to (entity, block) grain — each row holds ONLY its
    block's points — then one entity-grain aggregation over per-block
    summaries (first_fold for the opening block, decay + zero-start
    contrib for the rest), then an in-row fold over the ordered block
    array. Both aggregation rows are bounded: points-per-block by the
    block span, blocks-per-entity by series_span/segment_days.
    """
    a = float(alpha)
    block = F.floor(F.unix_timestamp(F.col(order_cols[0]))
                    / F.lit(segment_days * 86400)).alias("__blk")
    per_block = (df.groupBy(F.col(entity_col), block)
                 .agg(F.array_sort(F.collect_list(F.struct(
                         *[F.col(c) for c in order_cols],
                         F.col(value_col).cast("double").alias("__x"))))
                      .alias("__s")))
    xs = F.transform("__s", lambda s: s["__x"])
    tail = F.slice(xs, 2, F.greatest(F.size(xs) - 1, F.lit(0)))
    step = lambda acc, x: acc * F.lit(1.0 - a) + x * F.lit(a)  # noqa: E731
    summaries = per_block.select(
        entity_col, "__blk", F.size("__s").alias("__n"),
        # opening-block value: s0 = x0, recursion over the rest
        F.aggregate(tail, F.element_at(xs, 1), step).alias("__first"),
        # interior-block transfer: zero-start contribution + decay
        F.aggregate(xs, F.lit(0.0), step).alias("__contrib"),
        F.pow(F.lit(1.0 - a), F.size("__s")).alias("__decay"))
    chained = (summaries.groupBy(entity_col)
               .agg(F.sum("__n").alias("n_points"),
                    F.array_sort(F.collect_list(F.struct(
                        "__blk", "__first", "__contrib", "__decay")))
                    .alias("__b")))
    fold = F.aggregate(
        F.slice(F.col("__b"), 2,
                F.greatest(F.size("__b") - 1, F.lit(0))),
        F.element_at("__b", 1)["__first"],
        lambda acc, b: acc * b["__decay"] + b["__contrib"])
    return chained.select(
        entity_col, F.col("n_points").cast("int").alias("n_points"),
        F.round(fold.cast("decimal(28,8)"), 6).cast("double")
         .alias("ewma"))


def rolling_zscore_anomalies(df: DataFrame, entity_col: str,
                             order_cols: list[str], value_col: str,
                             lookback: int = 10, min_n: int = 5,
                             z_cut: float = 3.0) -> DataFrame:
    """Streaming-style anomaly detection: each point scored against the
    mean/stddev of its own trailing ``lookback`` points (current row
    EXCLUDED — the anomaly must not contaminate its own baseline).

    Moments come from decimal-domain Σx and Σx² over the frame, so the
    window aggregation is exact and engine-order-independent; the final
    μ/σ/z arithmetic drops to double with an identical expression shape
    on both engines. One window pass partitioned by entity — at 100 TB
    this is a single shuffle on the entity key.

    Returns the anomalous rows: (entity, order_cols..., value, zscore
    round-4) where the trailing baseline has ≥ ``min_n`` points, positive
    variance, and |z| > ``z_cut``.
    """
    w = (Window.partitionBy(entity_col).orderBy(*order_cols)
         .rowsBetween(-lookback, -1))
    xd = F.col(value_col).cast("decimal(18,6)")
    sx = F.sum(xd).over(w).cast("double")
    sxx = F.sum(xd * xd).over(w).cast("double")
    n = F.count(F.lit(1)).over(w)
    scored = df.select(
        entity_col, *order_cols, F.col(value_col),
        n.alias("__n"), sx.alias("__sx"), sxx.alias("__sxx"))
    mu = F.col("__sx") / F.col("__n")
    var = (F.col("__sxx") - F.col("__sx") * F.col("__sx") / F.col("__n")) \
        / (F.col("__n") - 1)
    z = (F.col(value_col) - mu) / F.sqrt(var)
    return (scored
            .where((F.col("__n") >= min_n) & (var > 0)
                   & (F.abs(z) > z_cut))
            .select(entity_col, *order_cols, value_col,
                    F.round(z.cast("decimal(28,8)"), 4).cast("double")
                     .alias("zscore")))


def holt_linear(df: DataFrame, entity_col: str, order_cols: list[str],
                value_col: str, alpha: float = 0.25, beta: float = 0.5,
                horizon: int = 3) -> DataFrame:
    """Holt double-exponential smoothing per entity (level + trend):
    l_t = α·x_t + (1-α)(l+t), t_t = β(l_t - l) + (1-β)t, initialized
    l₀ = x₀, t₀ = 0 — the classic short-horizon demand forecaster one
    step up from :func:`ewma`.

    Same scale shape as the EWMA fold: one shuffle on the entity, the
    sequential recursion runs as an in-row array fold with a STRUCT
    accumulator (level, trend). DuckDB's ``list_reduce`` over
    ``struct_pack`` folds in the identical order with identical IEEE
    expression shapes, so the oracle is exact — pick binary-exact
    α/β literals (0.25, 0.5) so ``1-α`` constants agree bit-for-bit.

    Returns (entity, n_points, level, trend, forecast round-6) where
    forecast = level + horizon·trend.
    """
    ordered = (df.groupBy(entity_col)
               .agg(F.array_sort(F.collect_list(F.struct(
                       *[F.col(c) for c in order_cols],
                       F.col(value_col).cast("double").alias("__x"))))
                    .alias("__s")))
    xs = F.transform("__s", lambda s: s["__x"])
    a, b = float(alpha), float(beta)

    def step(acc, x):
        lnew = F.lit(a) * x + F.lit(1.0 - a) * (acc["l"] + acc["t"])
        tnew = (F.lit(b) * ((F.lit(a) * x + F.lit(1.0 - a)
                             * (acc["l"] + acc["t"])) - acc["l"])
                + F.lit(1.0 - b) * acc["t"])
        return F.struct(lnew.alias("l"), tnew.alias("t"))

    fold = F.aggregate(
        F.slice(xs, 2, F.greatest(F.size(xs) - 1, F.lit(0))),
        F.struct(F.element_at(xs, 1).alias("l"), F.lit(0.0).alias("t")),
        step)
    return ordered.select(
        entity_col, F.size("__s").alias("n_points"),
        F.round(fold["l"], 6).alias("level"),
        F.round(fold["t"], 6).alias("trend"),
        F.round(fold["l"] + F.lit(float(horizon)) * fold["t"], 6)
         .alias("forecast"))


def holt_winters(df: DataFrame, entity_col: str, date_col: str,
                 value_col: str, season: int = 7, alpha: float = 0.25,
                 beta: float = 0.5, gamma: float = 0.25,
                 segment_days: int | None = None) -> DataFrame:
    """Additive Holt-Winters (level + trend + seasonal) per entity over
    its DAILY series — the triple-exponential step up from
    :func:`holt_linear`, the classic short-horizon forecaster for
    metrics with a weekly rhythm.

    Recursion (x_t = day t's value, m = season):
    l_t = α(x_t − s_{t−m}) + (1−α)(l + b);  b_t = β(l_t − l) + (1−β)b;
    s_t = γ(x_t − l_t) + (1−γ)s_{t−m}; init l₀ = x₀, b₀ = 0, s ≡ 0 (the
    simple deterministic init — no backcast fitting). One-step forecast
    = l + b + s at the next slot.

    Shape: ONE day-grain aggregation (decimal-routed daily sums), one
    entity shuffle, then the sequential recursion as an in-row fold with
    a STRUCT(l, b, s array[m], i) accumulator — the seasonal array
    updates via an index-aware ``transform``, so each step is O(m)
    expression work and the whole fold is O(days·m) per entity with no
    Python. Missing days are treated as gaps in the index (the fold runs
    over OBSERVED days in order; densify with gap_fill_forward first if
    strict calendar slots matter). Oracle = pinned golden: DuckDB's
    list_reduce mutates struct accumulator fields in place mid-step (the
    ts_holt_forecast finding), so it cannot replay a three-field
    recursion.

    For pathologically long entities pass ``segment_days=N``: the
    recursion is LINEAR in the (m+2)-dim state z = [l, b, s₀..s_{m−1}]ᵀ
    given each point's season slot, so a whole time block composes into
    ONE affine map z_out = A·z_in + c with A an (m+2)×(m+2) matrix —
    the seasonal generalization of :func:`holt_linear_segmented`'s 2×2
    transfer. Per-row memory drops from O(series) to
    O(max(days/block, blocks·(m+2)²)). Same trade as the other
    segmented twins: mathematically identical, FP association differs
    ~1 ulp — the scale twin, not the oracle-replay twin.

    Returns (entity, n_days, level, trend, seasonal_next, forecast) —
    all round-6 via the decimal route.
    """
    a, b, g = float(alpha), float(beta), float(gamma)
    m = int(season)
    daily = (df.groupBy(entity_col, F.to_date(date_col).alias("__d"))
             .agg(F.round(F.sum(F.col(value_col).cast("decimal(28,6)")),
                          2).cast("double").alias("__x")))
    if segment_days is not None:
        return _holt_winters_segmented(daily, entity_col, m, a, b, g,
                                       segment_days)
    ordered = (daily.groupBy(entity_col)
               .agg(F.array_sort(F.collect_list(F.struct("__d", "__x")))
                    .alias("__s")))
    xs = F.transform("__s", lambda s: s["__x"])
    fold = _hw_fold(xs, m, a, b, g)
    nxt = F.element_at(fold["s"], (fold["i"] % m) + 1)

    def r6(c):
        return F.round(c.cast("decimal(28,8)"), 6).cast("double")

    return ordered.select(
        entity_col, F.size("__s").alias("n_days"),
        r6(fold["l"]).alias("level"),
        r6(fold["b"]).alias("trend"),
        r6(nxt).alias("seasonal_next"),
        r6(fold["l"] + fold["b"] + nxt).alias("forecast"))


def _hw_fold(xs, m: int, a: float, b: float, g: float):
    """The flat Holt-Winters in-row fold over an ordered value array:
    STRUCT(l, b, s array[m], i) accumulator, seasonal slot updated via
    index-aware transform. Shared by the flat path (whole series) and
    the segmented path (opening block only)."""
    zeros = F.array_repeat(F.lit(0.0), m)
    init = F.struct(F.element_at(xs, 1).alias("l"),
                    F.lit(0.0).alias("b"),
                    zeros.alias("s"),
                    F.lit(1).alias("i"))

    def step(acc, x):
        j = acc["i"] % m                         # 0-based season slot
        shat = F.element_at(acc["s"], j + 1)
        lnew = (F.lit(a) * (x - shat)
                + F.lit(1.0 - a) * (acc["l"] + acc["b"]))

        def l_again():                           # inline recompute (holt
            return (F.lit(a) * (x - shat)        # pattern: acc fields are
                    + F.lit(1.0 - a) * (acc["l"] + acc["b"]))  # immutable)

        bnew = (F.lit(b) * (l_again() - acc["l"])
                + F.lit(1.0 - b) * acc["b"])
        snew = (F.lit(g) * (x - l_again()) + F.lit(1.0 - g) * shat)
        sarr = F.transform(
            acc["s"],
            lambda v, idx: F.when(idx == j, snew).otherwise(v))
        return F.struct(lnew.alias("l"), bnew.alias("b"),
                        sarr.alias("s"), (acc["i"] + 1).alias("i"))

    return F.aggregate(
        F.slice(xs, 2, F.greatest(F.size(xs) - 1, F.lit(0))), init, step)


def _holt_winters_segmented(daily: DataFrame, entity_col: str, m: int,
                            a: float, b: float, g: float,
                            segment_days: int) -> DataFrame:
    """Block-chained Holt-Winters (see :func:`holt_winters`
    ``segment_days``) — the (m+2)² affine transfer left unbuilt in r13
    (docs/SCALE.md's one remaining collect_list caveat).

    Per point at season slot j the recursion is z' = M_j·z + v_j·x over
    z = [l, b, s₀..s_{m−1}]ᵀ, where M_j is identity except three rows:
      l row:   (1−α)·l + (1−α)·b − α·s_j            (+ α·x)
      b row:   −αβ·l + ((1−β)+β(1−α))·b − αβ·s_j    (+ αβ·x)
      s_j row: −γ(1−α)·l − γ(1−α)·b + (γα+1−γ)·s_j  (+ γ(1−α)·x)
    Slot j advances with the GLOBAL observed-day index, so each block's
    starting phase φ = (days before it) comes from one cumulative-count
    window over the per-block counts — then every block folds its own
    (A, c) composition with i starting at φ, independent of the chain.

    Shape: one (entity, block) shuffle with day-grain arrays, one
    window for φ, one entity-grain aggregation over per-block
    summaries (the opening block's plain fold + interior blocks'
    (m+2)²+(m+2) doubles), then an in-row chain of O(blocks·(m+2)²)
    dot products. Every stage bounded at block or summary grain.
    """
    dim = m + 2
    c_bb = (1.0 - b) + b * (1.0 - a)
    blk = F.floor(F.datediff(F.col("__d"), F.lit("1970-01-01"))
                  / F.lit(segment_days)).alias("__blk")
    per_block = (daily.groupBy(F.col(entity_col), blk)
                 .agg(F.array_sort(F.collect_list(F.struct("__d", "__x")))
                      .alias("__s")))
    w = (Window.partitionBy(entity_col).orderBy("__blk")
         .rowsBetween(Window.unboundedPreceding, -1))
    phased = per_block.select(
        entity_col, "__blk", "__s",
        F.coalesce(F.sum(F.size("__s")).over(w), F.lit(0))
        .cast("int").alias("__phi"))
    xs = F.transform("__s", lambda s: s["__x"])

    ident_a = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda r: F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda t: F.when(r == t, F.lit(1.0)).otherwise(F.lit(0.0))))
    aff_init = F.struct(ident_a.alias("A"),
                        F.array_repeat(F.lit(0.0), dim).alias("c"),
                        F.col("__phi").alias("i"))

    def aff_step(acc, x):
        j = acc["i"] % m
        rl = F.element_at(acc["A"], 1)
        rb = F.element_at(acc["A"], 2)
        rs = F.element_at(acc["A"], j + 3)

        def combo(cl, cb, cs):
            t1 = F.zip_with(rl, rb,
                            lambda p, q: F.lit(cl) * p + F.lit(cb) * q)
            return F.zip_with(t1, rs, lambda p, r: p + F.lit(cs) * r)

        new_l = combo(1.0 - a, 1.0 - a, -a)
        new_b = combo(-(a * b), c_bb, -(a * b))
        new_s = combo(-(g * (1.0 - a)), -(g * (1.0 - a)), g * a + 1.0 - g)
        a2 = F.transform(
            acc["A"],
            lambda row, ridx: F.when(ridx == 0, new_l)
            .when(ridx == 1, new_b)
            .when(ridx == j + 2, new_s)
            .otherwise(row))
        cl_ = F.element_at(acc["c"], 1)
        cb_ = F.element_at(acc["c"], 2)
        cs_ = F.element_at(acc["c"], j + 3)

        def ccombo(cl, cb, cs, vx):
            return (F.lit(cl) * cl_ + F.lit(cb) * cb_ + F.lit(cs) * cs_
                    + F.lit(vx) * x)

        c2 = F.transform(
            acc["c"],
            lambda v, ridx: F.when(
                ridx == 0, ccombo(1.0 - a, 1.0 - a, -a, a))
            .when(ridx == 1, ccombo(-(a * b), c_bb, -(a * b), a * b))
            .when(ridx == j + 2, ccombo(-(g * (1.0 - a)),
                                        -(g * (1.0 - a)),
                                        g * a + 1.0 - g, g * (1.0 - a)))
            .otherwise(v))
        return F.struct(a2.alias("A"), c2.alias("c"),
                        (acc["i"] + 1).alias("i"))

    summaries = phased.select(
        entity_col, "__blk", F.size("__s").alias("__n"),
        # each block needs exactly ONE of the two folds — If() evaluates
        # only the taken branch at runtime, so the guards halve the
        # per-block expression work (the (m+2)² composition is the
        # dominant cost in the long-entity regime this path exists for)
        # opening block (φ=0): the plain recursion from l₀=x₀
        F.when(F.col("__phi") == 0,
               _hw_fold(xs, m, a, b, g)).alias("__first"),
        # interior block: the composed (A, c) over all its points,
        # phase-correct because i starts at this block's φ
        F.when(F.col("__phi") != 0,
               F.aggregate(xs, aff_init, aff_step)).alias("__aff"))
    chained = (summaries.groupBy(entity_col)
               .agg(F.sum("__n").cast("int").alias("n_days"),
                    F.array_sort(F.collect_list(F.struct(
                        "__blk", "__first", "__aff"))).alias("__b")))

    first = F.element_at("__b", 1)["__first"]

    def chain_step(acc, blk_):
        zvec = F.concat(F.array(acc["l"], acc["b"]), acc["s"])
        amat = blk_["__aff"]["A"]
        cvec = blk_["__aff"]["c"]

        def dot(i1b):  # z'[i] = A[i]·z + c[i], i1b is 1-based
            row = F.element_at(amat, i1b)
            return (F.aggregate(
                F.zip_with(row, zvec, lambda p, q: p * q),
                F.lit(0.0), lambda s_, v: s_ + v)
                + F.element_at(cvec, i1b))

        return F.struct(
            dot(F.lit(1)).alias("l"), dot(F.lit(2)).alias("b"),
            F.transform(F.sequence(F.lit(0), F.lit(m - 1)),
                        lambda k: dot(k + 3)).alias("s"))

    fold = F.aggregate(
        F.slice(F.col("__b"), 2, F.greatest(F.size("__b") - 1, F.lit(0))),
        F.struct(first["l"].alias("l"), first["b"].alias("b"),
                 first["s"].alias("s")),
        chain_step)
    nxt = F.element_at(fold["s"], (F.col("n_days") % m) + 1)

    def r6(c):
        return F.round(c.cast("decimal(28,8)"), 6).cast("double")

    return chained.select(
        entity_col, "n_days",
        r6(fold["l"]).alias("level"),
        r6(fold["b"]).alias("trend"),
        r6(nxt).alias("seasonal_next"),
        r6(fold["l"] + fold["b"] + nxt).alias("forecast"))


def holt_linear_segmented(df: DataFrame, entity_col: str,
                          order_cols: list[str], value_col: str,
                          alpha: float = 0.25, beta: float = 0.5,
                          horizon: int = 3,
                          segment_days: int = 30) -> DataFrame:
    """Block-chained twin of :func:`holt_linear` for pathologically long
    entities (the 2×2 matrix transfer the EWMA docstring promises).

    Holt's recursion is LINEAR in the state s = [l, b]ᵀ:
    s_t = M·s_{t−1} + v·x_t with M = [[1−α, 1−α], [−αβ, 1−β+β(1−α)]],
    v = [α, αβ]ᵀ — so a whole block of points composes into ONE affine
    map s_out = A·s_in + c, where (A, c) folds per block as
    (A, c) → (M·A, M·c + v·x). Blocks then chain with a second in-row
    fold over the per-entity block summaries (6 doubles each). Memory
    per row drops from O(series length) to O(max(points/block,
    blocks/entity)), same trade as the segmented EWMA: mathematically
    identical to the flat fold, FP association differs ~1 ulp, so this
    is the scale twin, not the oracle-replay twin.

    ``order_cols[0]`` must be a timestamp/date column (defines blocks).
    Returns the same schema as :func:`holt_linear`.
    """
    a, b = float(alpha), float(beta)
    m11, m12 = 1.0 - a, 1.0 - a
    m21, m22 = -(a * b), (1.0 - b) + b * (1.0 - a)
    v1, v2 = a, a * b
    block = F.floor(F.unix_timestamp(F.col(order_cols[0]))
                    / F.lit(segment_days * 86400)).alias("__blk")
    per_block = (df.groupBy(F.col(entity_col), block)
                 .agg(F.array_sort(F.collect_list(F.struct(
                         *[F.col(c) for c in order_cols],
                         F.col(value_col).cast("double").alias("__x"))))
                      .alias("__s")))
    xs = F.transform("__s", lambda s: s["__x"])

    def affine_step(acc, x):
        # (A, c) -> (M·A, M·c + v·x); A = [[a11,a12],[a21,a22]]
        return F.struct(
            (F.lit(m11) * acc["a11"] + F.lit(m12) * acc["a21"])
            .alias("a11"),
            (F.lit(m11) * acc["a12"] + F.lit(m12) * acc["a22"])
            .alias("a12"),
            (F.lit(m21) * acc["a11"] + F.lit(m22) * acc["a21"])
            .alias("a21"),
            (F.lit(m21) * acc["a12"] + F.lit(m22) * acc["a22"])
            .alias("a22"),
            (F.lit(m11) * acc["c1"] + F.lit(m12) * acc["c2"]
             + F.lit(v1) * x).alias("c1"),
            (F.lit(m21) * acc["c1"] + F.lit(m22) * acc["c2"]
             + F.lit(v2) * x).alias("c2"))

    ident = F.struct(F.lit(1.0).alias("a11"), F.lit(0.0).alias("a12"),
                     F.lit(0.0).alias("a21"), F.lit(1.0).alias("a22"),
                     F.lit(0.0).alias("c1"), F.lit(0.0).alias("c2"))
    tail = F.slice(xs, 2, F.greatest(F.size(xs) - 1, F.lit(0)))

    def holt_step(acc, x):
        lnew = (F.lit(a) * x
                + F.lit(1.0 - a) * (acc["l"] + acc["t"]))
        tnew = (F.lit(b) * ((F.lit(a) * x + F.lit(1.0 - a)
                             * (acc["l"] + acc["t"])) - acc["l"])
                + F.lit(1.0 - b) * acc["t"])
        return F.struct(lnew.alias("l"), tnew.alias("t"))

    summaries = per_block.select(
        entity_col, "__blk", F.size("__s").alias("__n"),
        # opening block: run the plain recursion from s0=(x0, 0)
        F.aggregate(tail,
                    F.struct(F.element_at(xs, 1).alias("l"),
                             F.lit(0.0).alias("t")),
                    holt_step).alias("__first"),
        # interior block: the composed affine map over ALL its points
        F.aggregate(xs, ident, affine_step).alias("__aff"))
    chained = (summaries.groupBy(entity_col)
               .agg(F.sum("__n").alias("n_points"),
                    F.array_sort(F.collect_list(F.struct(
                        "__blk", "__first", "__aff"))).alias("__b")))

    def chain_step(acc, blk):
        aff = blk["__aff"]
        return F.struct(
            (aff["a11"] * acc["l"] + aff["a12"] * acc["t"]
             + aff["c1"]).alias("l"),
            (aff["a21"] * acc["l"] + aff["a22"] * acc["t"]
             + aff["c2"]).alias("t"))

    fold = F.aggregate(
        F.slice(F.col("__b"), 2, F.greatest(F.size("__b") - 1, F.lit(0))),
        F.element_at("__b", 1)["__first"],
        chain_step)

    def r6(c):
        return F.round(c.cast("decimal(28,8)"), 6).cast("double")

    return chained.select(
        entity_col, F.col("n_points").cast("int").alias("n_points"),
        r6(fold["l"]).alias("level"),
        r6(fold["t"]).alias("trend"),
        r6(fold["l"] + F.lit(float(horizon)) * fold["t"])
         .alias("forecast"))
