"""Numeric cleaning operators for feature / metric columns.

Beyond-reference surface: outlier handling a training-data or analytics
pipeline applies before aggregation. Everything is two-pass DataFrame
composition — no UDFs, no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .util import join_group_stats


def winsorize(df: DataFrame, value_col: str,
              group_cols: list[str] | None = None,
              lo: float = 0.01, hi: float = 0.99,
              exact: bool = True,
              out_col: str | None = None) -> DataFrame:
    """Clip ``value_col`` into its per-group [p_lo, p_hi] percentile band
    (winsorization) — the standard heavy-tail guard before means/sums.

    Two passes: (1) percentile bounds per group — one shuffle on the group
    key, output is group-cardinality-sized; (2) broadcast the tiny bounds
    table back onto the fact and clip with ``least/greatest`` — a narrow,
    codegen'd map over the data, no second shuffle.

    ``exact=True`` uses ``percentile`` (exact rank interpolation; buffers a
    group's values in the agg state — right up to groups of ~10⁷ values).
    For larger groups pass ``exact=False`` for ``approx_percentile``
    (constant-memory sketch, rank error ≤ 1/10000) — same plan shape.
    """
    out_col = out_col or f"{value_col}_winsorized"
    v = F.col(value_col)
    if exact:
        bounds = [F.percentile(v, lo).alias("__lo"),
                  F.percentile(v, hi).alias("__hi")]
    else:
        bounds = [F.approx_percentile(v, lo, 10000).alias("__lo"),
                  F.approx_percentile(v, hi, 10000).alias("__hi")]
    if group_cols:
        pct = df.groupBy(*group_cols).agg(*bounds)
        joined = join_group_stats(df, pct, group_cols)
    else:
        pct = df.groupBy().agg(*bounds)
        joined = df.crossJoin(F.broadcast(pct))
    return (joined.withColumn(out_col,
                              F.least(F.greatest(v, F.col("__lo")),
                                      F.col("__hi")))
            .drop("__lo", "__hi"))


def zscore(df: DataFrame, value_col: str,
           group_cols: list[str] | None = None,
           out_col: str | None = None,
           ddof: int = 1) -> DataFrame:
    """Per-group standardization ``(x - mean) / std`` — the feature-scaling
    pass before scoring/thresholding mixed-scale metrics.

    The moments are accumulated in ``decimal(38,6)`` / ``decimal(38,12)``
    (sum and sum-of-squares), NOT double: float partial sums are
    shuffle-order-dependent, so at 32 partitions a double-summed mean
    would differ between runs/engines in the low bits. Decimal sums are
    exact and associative — the derived mean/std (and therefore the
    z-score) are bit-identical at any parallelism and match a sequential
    engine exactly. Same two-pass broadcast shape as :func:`winsorize`:
    one shuffle for group moments, then a broadcast join + codegen'd map.
    Groups with fewer than ``ddof + 1`` rows get NULL z-scores (std is
    undefined), never a divide-by-zero.
    """
    out_col = out_col or f"{value_col}_z"
    v = F.col(value_col)
    # decimal(18,6) operands: the product is decimal(37,12) — inside the
    # 38-digit cap, so the multiply is EXACT (a (28,6) operand would push
    # the product to precision 57 and trip Spark's precision-loss scale
    # reduction, silently truncating the sum of squares)
    dec = v.cast("decimal(18,6)")
    aggs = [F.sum(dec).alias("__s"),
            F.sum(dec * dec).alias("__ss"),
            F.count(v).alias("__n")]
    if group_cols:
        mom = df.groupBy(*group_cols).agg(*aggs)
        joined = join_group_stats(df, mom, group_cols)
    else:
        mom = df.groupBy().agg(*aggs)
        joined = df.crossJoin(F.broadcast(mom))
    n = F.col("__n").cast("double")
    s = F.col("__s").cast("double")
    ss = F.col("__ss").cast("double")
    mean = s / n
    var = (ss - s * s / n) / (n - F.lit(float(ddof)))
    z = F.when(F.col("__n") > ddof, (v - mean) / F.sqrt(var))
    return joined.withColumn(out_col, z).drop("__s", "__ss", "__n")


def quantile_bins(df: DataFrame, value_col: str, k: int,
                  group_cols: list[str] | None = None,
                  tiebreak_cols: list[str] | None = None,
                  out_col: str | None = None) -> DataFrame:
    """Assign each row its k-quantile bin (1..k) per group — equal-count
    bucketing (``ntile``) for difficulty curricula, stratified splits, and
    monotone feature binning.

    One window shuffle on the group key. The order is pinned with
    ``tiebreak_cols`` so ties at bin boundaries are deterministic (an
    unpinned ntile would assign boundary ties by partition arrival order —
    a silent parallelism dependence).
    """
    out_col = out_col or f"{value_col}_bin"
    order = [F.asc(value_col)] + [F.asc(c) for c in (tiebreak_cols or [])]
    part = group_cols or []
    w = Window.partitionBy(*part).orderBy(*order)
    return df.withColumn(out_col, F.ntile(k).over(w))


def equi_width_histogram(df: DataFrame, value_col: str, n_bins: int,
                         group_cols: list[str] | None = None) -> DataFrame:
    """Equal-width histogram of ``value_col``: bin index (0..n_bins-1),
    inclusive bin edges, and row count — the profiling primitive behind
    distribution dashboards and skew diagnosis at full-corpus scale.

    Two passes, both single-shuffle: global (or per-group) min/max — exact,
    order-independent — then ``floor((x-min)/width)`` binning + count.
    Edges derive from min/max only (no float summation), so bin membership
    is bit-stable across engines/parallelism. The top edge folds into the
    last bin (standard right-closed top bin).
    """
    v = F.col(value_col).cast("double")
    aggs = [F.min(v).alias("__mn"), F.max(v).alias("__mx")]
    if group_cols:
        mm = df.groupBy(*group_cols).agg(*aggs)
        joined = join_group_stats(df, mm, group_cols)
    else:
        mm = df.groupBy().agg(*aggs)
        joined = df.crossJoin(F.broadcast(mm))
    width = (F.col("__mx") - F.col("__mn")) / F.lit(float(n_bins))
    raw = F.floor((v - F.col("__mn")) / width)
    bin_idx = F.least(F.greatest(raw, F.lit(0)),
                      F.lit(n_bins - 1)).cast("int")
    keys = (group_cols or []) + ["bin"]
    return (joined.where(v.isNotNull())
            .withColumn("__w", width)
            .withColumn("bin", bin_idx)
            .groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 (F.first("__mn") + F.col("bin") * F.first("__w"))
                 .alias("bin_lo"),
                 (F.first("__mn") + (F.col("bin") + 1) * F.first("__w"))
                 .alias("bin_hi")))


def mad_outliers(df: DataFrame, value_col: str,
                 group_cols: list[str] | None = None,
                 threshold: float = 3.5,
                 out_col: str | None = None) -> DataFrame:
    """Robust outlier flags via the modified z-score
    ``0.6745 * (x - median) / MAD`` (Iglewicz–Hoaglin): unlike
    :func:`zscore`, one wild value cannot drag the center/scale it is
    judged against, so heavy-tailed metric columns get sane flags.

    Three passes, all group-keyed with a broadcast join back (the same
    winsorize shape twice): (1) per-group median, (2) per-group median of
    absolute deviations, (3) codegen'd flag map. ``median`` is Spark's
    exact interpolated median — identical arithmetic to DuckDB's
    ``median``/``quantile_cont(0.5)``, so the score is oracle-exact; for
    >10⁷-row groups swap in ``approx_percentile`` like winsorize does.
    Zero-MAD groups (over half the values identical) yield NULL scores,
    never a division by zero. Adds ``<v>_rz`` (rounded to 6) and
    ``is_outlier``.
    """
    out_col = out_col or f"{value_col}_rz"
    v = F.col(value_col)
    if group_cols:
        med = df.groupBy(*group_cols).agg(F.median(v).alias("__med"))
        j1 = join_group_stats(df, med, group_cols)
        mad = (j1.groupBy(*group_cols)
                 .agg(F.median(F.abs(v - F.col("__med"))).alias("__mad")))
        j2 = join_group_stats(j1, mad, group_cols)
    else:
        med = df.groupBy().agg(F.median(v).alias("__med"))
        j1 = df.crossJoin(F.broadcast(med))
        mad = j1.groupBy().agg(F.median(F.abs(v - F.col("__med"))).alias("__mad"))
        j2 = j1.crossJoin(F.broadcast(mad))
    rz = F.when(F.col("__mad") > 0,
                F.round(F.lit(0.6745) * (v - F.col("__med")) / F.col("__mad"),
                        6))
    return (j2.withColumn(out_col, rz)
              .withColumn("is_outlier",
                          F.coalesce(F.abs(F.col(out_col)) > threshold,
                                     F.lit(False)))
              .drop("__med", "__mad"))


def split_expectations(df, checks: list[tuple]):
    """DLT-style expectation routing: ``checks`` is an ordered list of
    (name, Column-predicate); every row either passes ALL checks (clean
    side) or is quarantined tagged with the FIRST failing check's name
    — the expect_or_quarantine pattern (Delta Live Tables / Great
    Expectations), so bad upstream rows never poison the table AND
    never silently vanish.

    One pass, no shuffle: the failure reason is a single chained
    ``when`` expression evaluated per row; both outputs are lazy
    filters over it. Returns (clean_df, quarantined_df) where the
    quarantine side carries ``dq_reason``.

    A predicate that evaluates to NULL (e.g. ``col > 0`` with col NULL)
    counts as a FAILURE — matching DLT's expect_or_quarantine, where an
    expectation that can't be proven true is a violation. Without the
    coalesce, ``F.when(~pred, ...)`` would not match on NULL and the row
    would silently land on the clean side.
    """
    from pyspark.sql import functions as F
    reason = F.lit(None).cast("string")
    for name, pred in reversed(checks):
        reason = F.when(~F.coalesce(pred, F.lit(False)),
                        F.lit(name)).otherwise(reason)
    tagged = df.withColumn("dq_reason", reason)
    clean = tagged.where(F.col("dq_reason").isNull()).drop("dq_reason")
    quarantined = tagged.where(F.col("dq_reason").isNotNull())
    return clean, quarantined


def fd_violations(df, fds: list[tuple]):
    """Functional-dependency profiling (the discovery-side complement of
    expectation gates): for each candidate FD ``(name, lhs_cols,
    rhs_cols)``, count determinant groups and the groups where the
    dependent is NOT functionally determined (>1 distinct RHS combo) —
    the Tane/metanome-style violation summary that tells a pipeline
    whether a "natural key" assumption actually holds before a MERGE or
    dedup keys on it.

    One aggregation per FD, shuffled on its own LHS (uniform key, map-
    side combined to (lhs, distinct-rhs-count) partials via the exact
    count-distinct), then a one-row summary per FD unioned into the
    report. NULL handling: count(DISTINCT ...) ignores all-NULL RHS
    tuples (SQL semantics, same on every engine); a group whose RHS is
    always NULL therefore counts 0 distinct values and never violates.

    Returns (fd, n_groups, n_violations, violation_pct double) — the
    pct is a plain int/int double division, deterministic everywhere.
    """
    from functools import reduce

    from pyspark.sql import functions as F
    parts = []
    for name, lhs, rhs in fds:
        per = (df.groupBy(*[F.col(c) for c in lhs])
               .agg(F.countDistinct(*[F.col(c) for c in rhs])
                    .alias("__nd")))
        parts.append(per.agg(
            F.lit(name).alias("fd"),
            F.count(F.lit(1)).alias("n_groups"),
            F.sum(F.when(F.col("__nd") > 1, 1).otherwise(0))
             .cast("long").alias("n_violations")).select(
            "fd", "n_groups", "n_violations",
            (F.col("n_violations") / F.col("n_groups"))
            .alias("violation_pct")))
    return reduce(lambda a, b: a.unionByName(b), parts)

def _melt_sides(ref, cur, cols: list[str], as_string: bool = False):
    """Melt the two snapshots' feature columns into ONE long
    ``(__f, __x, __side)`` frame — the single-scan shape that lets a
    whole feature list ride ONE downstream shuffle instead of one per
    feature (the r14 per-column fan-out: a 100-feature monitoring pass
    was 100 jobs; melted it is one scan per side + one count shuffle).

    Numeric features cast to double — order-preserving and injective
    for values with ≤ 15 significant digits (every rank/bucket
    statistic downstream depends only on ordering and tie structure,
    so the statistics are unchanged; a decimal(38,18)-precision
    feature would need a per-feature pass instead). Categorical
    features cast to string (per-feature injective). NULLs are dropped
    AFTER the melt so each feature's missingness is filtered
    independently (the module's NULL-as-missingness convention).
    """
    cast_to = "string" if as_string else "double"

    def melt(df, side):
        pairs = F.array(*[
            F.struct(F.lit(c).alias("__f"),
                     F.col(c).cast(cast_to).alias("__x"))
            for c in cols])
        return (df.select(F.explode(pairs).alias("s"))
                .select("s.__f", "s.__x")
                .where(F.col("__x").isNotNull())
                .withColumn("__side", F.lit(side)))

    return melt(ref, "r").unionByName(melt(cur, "c"))


def _edges_long(ref, num_cols: list[str], n_buckets: int):
    """Per-feature reference percentile edges as an n_features-row
    broadcastable frame ``(__f, __e1 .. __e{n_buckets-1})`` — ONE
    scalar aggregation with one percentile buffer per feature (the
    array-percentile form; the r14 shape held one buffer per feature
    PER QUANTILE), exploded driver-free into long form. Edges are
    computed on the native column type (percentile ignores NULLs and
    returns double — identical values to the per-column path, so
    existing oracles keep matching)."""
    qs = F.array(*[F.lit(i / n_buckets) for i in range(1, n_buckets)])
    wide = ref.agg(*[F.percentile(F.col(c), qs).alias(f"__a{j}")
                     for j, c in enumerate(num_cols)])
    rows = F.array(*[
        F.struct(F.lit(c).alias("__f"),
                 *[F.col(f"__a{j}")[i - 1].alias(f"__e{i}")
                   for i in range(1, n_buckets)])
        for j, c in enumerate(num_cols)])
    return wide.select(F.explode(rows).alias("s")).select("s.*")


def _bucket_expr(n_edges: int):
    """Range-bucket id against the broadcast ``__e1..__e{n_edges}``
    edge columns: sum of (x >= e_i) — a codegen'd map."""
    from functools import reduce

    return reduce(lambda acc, i: acc + F.when(
        F.col("__x") >= F.col(f"__e{i}"), 1).otherwise(0),
        range(1, n_edges + 1), F.lit(0))


def _guard_nonempty(result, features: list[str], op: str,
                    stat_col: str):
    """Enforce the 'both sides non-empty' precondition LAZILY: seed
    one row per requested feature (a feature whose rows were entirely
    NULL-filtered produces no aggregate row at all — the silent-NULL
    hole this closes), left-join the computed stats, and route the
    statistic through a runtime ``raise_error`` when either side's
    count is 0/absent. Zero extra Spark jobs: the check rides the
    result's own evaluation, unlike an eager ``isEmpty`` probe per
    feature."""
    seed = result.sparkSession.createDataFrame(
        [(f,) for f in features], "feature string")
    j = seed.join(result, "feature", "left")
    ok = ((F.coalesce(F.col("n_ref"), F.lit(0)) > 0)
          & (F.coalesce(F.col("n_cur"), F.lit(0)) > 0))
    msg = F.concat(
        F.lit(f"{op}: reference and/or current side is empty (after "
              "the NOT NULL missingness filter) for feature '"),
        F.col("feature"), F.lit("'"))
    guarded = F.when(ok, F.col(stat_col)).otherwise(F.raise_error(msg))
    others = [c for c in result.columns
              if c not in ("feature", stat_col)]
    return j.select("feature", guarded.alias(stat_col), *others)


def psi_drift(ref, cur, num_cols: list[str], cat_cols: list[str],
              n_buckets: int = 10):
    """Population Stability Index between a REFERENCE and a CURRENT
    snapshot — the standard ML-serving drift monitor (PSI < 0.1 stable,
    0.1–0.25 drifting, > 0.25 act). Numeric features bucket by the
    reference's own exact decile edges (so the reference is ~uniform by
    construction and drift shows as current-side mass imbalance);
    categorical features compare category proportions directly.
    Proportions are Laplace-smoothed ((c+1)/(n+k)) so an empty bucket
    never produces ln(0).

    Scale shape (single-pass): each side is scanned ONCE and melted to
    ``(feature, value)`` (:func:`_melt_sides`), all numeric features'
    reference edges come from ONE scalar aggregation
    (:func:`_edges_long`, broadcast back), and the whole feature list
    rides one (feature, bucket) count shuffle for the numeric branch
    plus one for the categorical — job count is O(1) in the number of
    features, not O(n_features) (the r14 loop). The categorical
    smoothing constant k (pooled distinct categories per feature) now
    derives lazily from the count frame itself instead of an eager
    ``distinct().count()`` job per column. Cross-engine exactness:
    bucket membership compares identical doubles (percentile ≡
    quantile_cont); each ln ratio rounds to 6 and each PSI term to 9
    before DECIMAL summation (the repo's logprob convention), so the
    report carries an exact SQL oracle.

    Both sides must be non-empty per feature (after the NULL filter):
    a violating feature raises at evaluation time instead of silently
    reporting NULL psi (:func:`_guard_nonempty`). NULL values are
    missingness, not distribution mass — excluded from both the bucket
    counts and the category table; monitor missingness separately via
    ``split_expectations``.

    Returns one row per feature: (feature, psi, n_ref, n_cur).
    """
    parts = []
    if num_cols:
        melted = _melt_sides(ref, cur, num_cols)
        edges = _edges_long(ref, num_cols, n_buckets)
        cnt = (melted.join(F.broadcast(edges), "__f")
               .select("__f", "__side",
                       _bucket_expr(n_buckets - 1).alias("__b"))
               .groupBy("__f", "__side", "__b")
               .agg(F.count(F.lit(1)).alias("__c")))
        parts.append(_psi_from_counts_by(
            cnt, k_expr=F.lit(float(n_buckets))))
    if cat_cols:
        # NULL categories are missingness, not a category: a NULL key
        # never equi-joins across sides, so keeping it would produce
        # two phantom one-sided buckets AND inflate k by one.
        cnt = (_melt_sides(ref, cur, cat_cols, as_string=True)
               .select("__f", "__side", F.col("__x").alias("__b"))
               .groupBy("__f", "__side", "__b")
               .agg(F.count(F.lit(1)).alias("__c")))
        parts.append(_psi_from_counts_by(cnt, k_expr=None))
    from functools import reduce

    res = reduce(lambda a, b: a.unionByName(b), parts)
    return _guard_nonempty(res, num_cols + cat_cols, "psi_drift",
                           "psi")


def ks_drift(ref, cur, num_cols: list[str],
             n_buckets: int = 32):
    """Two-sample Kolmogorov-Smirnov drift statistic per numeric
    feature — PSI's nonparametric sibling: D = max over pooled distinct
    values v of |F_ref(v) − F_cur(v)| (ECDFs evaluated after all ties
    at v, the standard discrete treatment). Unlike PSI it needs no
    binning choice and is sensitive to ANY distributional difference;
    the trade is no per-bucket attribution.

    Distributed shape (the exact-KS prefix-sum, single-pass across the
    feature list): melt both sides to ``(feature, value)`` — one scan
    per side — then ONE (feature, value) group-by for every feature's
    per-distinct-value side counts, range-bucket against the
    reference's percentile edges (one scalar agg for ALL features,
    broadcast), cumulative side-counts WITHIN each (feature, bucket)
    cell (parallel windows, bounded state) plus per-bucket offsets from
    a (feature, bucket)-grain totals frame (n_features × n_buckets
    rows — metadata-sized; its running sum partitions BY FEATURE, so
    there is no global single-partition step left). The maximized
    quantity is the INTEGER cross product |k_r·n_c − k_c·n_r| in
    decimal(38,0) — no floating point until the final divide — so the
    statistic is bit-exact on any engine and carries a recomputed SQL
    oracle. The double melt cast is order/tie-preserving for ≤ 15
    significant digits (:func:`_melt_sides`), which is what the rank
    statistic depends on. NULLs are missingness, excluded from both
    ECDFs; an empty side raises at evaluation time
    (:func:`_guard_nonempty`) instead of silently yielding NULL ks.

    Returns one row per feature: (feature, ks double round-6,
    n_ref, n_cur).
    """
    # a pure parallelization knob: the statistic is bucket-invariant,
    # so clamp rather than let n_buckets=1 produce an empty edges agg
    n_buckets = max(int(n_buckets), 2)
    scored = _scored_value_counts(ref, cur, num_cols, n_buckets)
    return _guard_nonempty(_ks_from_scored(scored), num_cols,
                           "ks_drift", "ks")


def _ks_from_scored(scored):
    """KS back half over a cumulative side-count frame (the
    :func:`_cum_value_counts_by` output), grouped per feature — shared
    by the batch operator and :func:`drift_report`."""
    dnum = F.abs(F.col("__kr") * F.col("__nc").cast("decimal(38,0)")
                 - F.col("__kc") * F.col("__nr").cast("decimal(38,0)"))
    # try_divide: the denominator is 0 only in the empty-side case the
    # caller's guard turns into a clean per-feature error (ANSI mode
    # would otherwise kill the aggregate first with DIVIDE_BY_ZERO)
    return (scored.groupBy("__f").agg(
        F.round(F.try_divide(
            F.max(dnum).cast("double"),
            F.any_value("__nr").cast("double")
            * F.any_value("__nc").cast("double"))
                .cast("decimal(28,8)"), 6).cast("double").alias("ks"),
        F.any_value("__nr").cast("long").alias("n_ref"),
        F.any_value("__nc").cast("long").alias("n_cur"))
        .withColumnRenamed("__f", "feature"))


def _scored_value_counts(ref, cur, num_cols: list[str],
                         n_buckets: int):
    """Shared KS/MWU front half: melt → ONE (feature, value) count
    shuffle → per-feature cumulative side counts via
    :func:`_cum_value_counts_by`."""
    melted = _melt_sides(ref, cur, num_cols)
    per_val = (melted.groupBy("__f", "__x")
               .agg(F.count(F.when(F.col("__side") == "r", 1))
                    .alias("__cr"),
                    F.count(F.when(F.col("__side") == "c", 1))
                    .alias("__cc")))
    edges = _edges_long(ref, num_cols, n_buckets)
    return _cum_value_counts_by(per_val, edges, n_buckets - 1)


def chisq_drift(ref, cur, cat_cols: list[str]):
    """Two-sample chi-square homogeneity statistic per CATEGORICAL
    feature — the drift-monitor trio's third member (PSI = binned
    divergence, KS = continuous nonparametric, chi² = the classic
    contingency-table test whose statistic scales with sample size, so
    it feeds a significance threshold where PSI feeds a fixed rule of
    thumb). χ² = Σ over the 2×k table of (O − E)²/E with
    E = row_total·col_total/n.

    Shape (single-pass): melt both sides — one scan each — then ONE
    (feature, category) count shuffle for the whole feature list, with
    per-feature row totals derived lazily from the count frame and
    broadcast back — k-sized frames everywhere after the first
    shuffle. Each cell term rounds to 9 and DECIMAL-sums (the PSI
    convention), so the report carries an exact SQL oracle. NULL
    categories are missingness, not categories (the module
    convention); an empty side raises at evaluation time
    (:func:`_guard_nonempty`) instead of silently reporting NULL chisq
    — closing the 0-expected-count divide this precondition guards.

    Returns one row per feature: (feature, chisq round-6, dof,
    n_ref, n_cur).
    """
    cnt = (_melt_sides(ref, cur, cat_cols, as_string=True)
           .groupBy("__f", F.col("__x").alias("__b"))
           .agg(F.count(F.when(F.col("__side") == "r", 1))
                .alias("__cr"),
                F.count(F.when(F.col("__side") == "c", 1))
                .alias("__cc")))
    return _guard_nonempty(_chisq_from_counts(cnt), cat_cols,
                           "chisq_drift", "chisq")


def _chisq_from_counts(cnt):
    """Chi-square homogeneity statistic from a feature-grain
    (__f, __b, __cr, __cc) category side-count table — shared by the
    batch operator and the streaming twin (whose current-side counts
    accumulate over micro-batches through the replay-idempotent delta
    sink). Per-feature totals derive lazily from the count frame and
    broadcast back; every frame after the input is k-sized."""
    tot = (cnt.groupBy("__f")
           .agg(F.sum("__cr").alias("__nr"),
                F.sum("__cc").alias("__nc"),
                F.count(F.lit(1)).alias("__k")))
    j = cnt.join(F.broadcast(tot), "__f")
    tj = (F.col("__cr") + F.col("__cc")).cast("double")
    n = (F.col("__nr") + F.col("__nc")).cast("double")
    er = F.col("__nr").cast("double") * tj / n
    ec = F.col("__nc").cast("double") * tj / n

    def term(o, e):
        # try_divide: e = n_side·t_j/n is 0 only when that side is
        # empty — the case _guard_nonempty raises on; ANSI mode would
        # otherwise abort the aggregate with a bare DIVIDE_BY_ZERO
        d = o.cast("double") - e
        return F.round(F.try_divide(d * d, e).cast("decimal(28,12)"),
                       9).cast("decimal(20,9)")

    return (j.groupBy("__f").agg(
        F.round((F.sum(term(F.col("__cr"), er))
                 + F.sum(term(F.col("__cc"), ec)))
                .cast("double").cast("decimal(28,8)"), 6)
         .cast("double").alias("chisq"),
        (F.any_value("__k") - 1).cast("int").alias("dof"),
        F.any_value("__nr").cast("long").alias("n_ref"),
        F.any_value("__nc").cast("long").alias("n_cur"))
        .withColumnRenamed("__f", "feature"))


def _cum_value_counts_by(per_val, edges_long, n_edges: int):
    """The distributed prefix-sum core shared by the rank statistics,
    FEATURE-GRAIN: from a per-feature per-distinct-value side-count
    table (``__f``, ``__x``, ``__cr``, ``__cc``) + an n_features-row
    edges frame with ``__e1..`` range boundaries per feature, produce
    one row per (feature, distinct value) carrying INCLUSIVE cumulative
    side counts ``__kr``/``__kc`` (decimal(38,0)) and the per-feature
    side totals ``__nr``/``__nc`` — in-cell window cumsums plus
    broadcast per-(feature, bucket) offsets. Every window partitions by
    feature (the offsets window runs over the n_features × n_buckets
    totals frame, partitioned BY FEATURE — no global single-partition
    step)."""
    bucketed = (per_val.join(F.broadcast(edges_long), "__f")
                .select("__f", "__x", "__cr", "__cc",
                        _bucket_expr(n_edges).alias("__b")))
    win = Window.partitionBy("__f", "__b").orderBy("__x")
    within = bucketed.select(
        "__f", "__b", "__x", "__cr", "__cc",
        F.sum("__cr").over(win).alias("__kr0"),
        F.sum("__cc").over(win).alias("__kc0"))
    totals = (bucketed.groupBy("__f", "__b")
              .agg(F.sum("__cr").alias("__tr"),
                   F.sum("__cc").alias("__tc")))
    owin = (Window.partitionBy("__f").orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, -1))
    offsets = totals.select(
        "__f", "__b",
        F.coalesce(F.sum("__tr").over(owin), F.lit(0)).alias("__or"),
        F.coalesce(F.sum("__tc").over(owin), F.lit(0)).alias("__oc"))
    ns = (per_val.groupBy("__f")
          .agg(F.sum("__cr").alias("__nr"),
               F.sum("__cc").alias("__nc")))
    return (within.join(F.broadcast(offsets), ["__f", "__b"])
            .join(F.broadcast(ns), "__f")
            .select("__f", "__x", "__cr", "__cc", "__nr", "__nc",
                    (F.col("__kr0") + F.col("__or"))
                    .cast("decimal(38,0)").alias("__kr"),
                    (F.col("__kc0") + F.col("__oc"))
                    .cast("decimal(38,0)").alias("__kc")))


def _cum_value_counts(per_val, edges, n_edges: int):
    """Single-feature compatibility wrapper over
    :func:`_cum_value_counts_by` (callers: the streaming KS/MWU twins,
    whose count tables accumulate over micro-batches): tags the
    (``__x``, ``__cr``, ``__cc``) table and the 1-row ``__e1..`` edges
    frame with a constant feature key and strips it from the output."""
    per_val_f = per_val.withColumn("__f", F.lit("_"))
    edges_f = edges.withColumn("__f", F.lit("_"))
    return (_cum_value_counts_by(per_val_f, edges_f, n_edges)
            .drop("__f"))


def _ks_from_value_counts(per_val, edges, n_edges: int, feature: str):
    """KS statistic from a per-distinct-value side-count table — the
    prefix-sum core (:func:`_cum_value_counts`) shared by the batch
    operator and the streaming twin (whose count table accumulates
    over micro-batches)."""
    scored = _cum_value_counts(per_val, edges, n_edges)
    dnum = F.abs(F.col("__kr") * F.col("__nc").cast("decimal(38,0)")
                 - F.col("__kc") * F.col("__nr").cast("decimal(38,0)"))
    return scored.agg(
        F.lit(feature).alias("feature"),
        F.round((F.max(dnum).cast("double")
                 / (F.any_value("__nr").cast("double")
                    * F.any_value("__nc").cast("double")))
                .cast("decimal(28,8)"), 6).cast("double").alias("ks"),
        F.any_value("__nr").cast("long").alias("n_ref"),
        F.any_value("__nc").cast("long").alias("n_cur"))


def _mwu_from_value_counts(per_val, edges, n_edges: int, feature: str):
    """Mann-Whitney U from a per-distinct-value side-count table —
    the single-feature composition the streaming twin uses: same
    prefix-sum core as :func:`_ks_from_value_counts`, MWU back half
    (:func:`_mwu_from_scored`)."""
    scored = _cum_value_counts_by(
        per_val.withColumn("__f", F.lit(feature)),
        edges.withColumn("__f", F.lit(feature)), n_edges)
    return _mwu_from_scored(scored)


def _mwu_from_scored(scored):
    """Mann-Whitney U + common-language AUC from a cumulative
    side-count frame (the :func:`_cum_value_counts_by` output),
    grouped per feature — shared by the batch operator and the
    streaming twin. Doubled midranks 2·K_incl − t + 1 keep every tie
    computation in decimal integers."""
    m2 = (F.lit(2) * (F.col("__kr") + F.col("__kc")).cast("long")
          - (F.col("__cr") + F.col("__cc")) + F.lit(1))
    r2_term = (F.col("__cc").cast("decimal(19,0)")
               * m2.cast("decimal(19,0)"))
    ncd = F.any_value("__nc").cast("decimal(19,0)")
    u2 = (F.sum(r2_term)
          - ncd * (ncd + F.lit(1).cast("decimal(19,0)")))
    # try_divide: 0 denominator only in the empty-side case the
    # caller's guard raises on (ANSI would abort the agg first)
    return (scored.groupBy("__f").agg(
        (u2.cast("double") / F.lit(2.0)).alias("u"),
        F.round(F.try_divide(
            u2.cast("double"),
            F.lit(2.0) * F.any_value("__nr").cast("double")
            * F.any_value("__nc").cast("double"))
                .cast("decimal(28,8)"), 6).cast("double")
         .alias("auc"),
        F.any_value("__nr").cast("long").alias("n_ref"),
        F.any_value("__nc").cast("long").alias("n_cur"))
        .withColumnRenamed("__f", "feature"))


def mwu_drift(ref, cur, num_cols: list[str], n_buckets: int = 32):
    """Two-sample MANN-WHITNEY U (Wilcoxon rank-sum) per numeric
    feature, with the common-language effect size — the rank
    statistic that answers "did the distribution SHIFT?" where KS
    answers "did it DIFFER anywhere?": auc = U/(n_ref·n_cur) is the
    probability a random current value exceeds a random reference
    value (ties count half), so 0.5 = no shift and the distance from
    0.5 is directly interpretable drift.

    Integer-exact ties: the t tied observations at a value share
    midrank C_prev + (t+1)/2; DOUBLED midranks 2·K_incl − t + 1 are
    integers (K_incl = pooled inclusive cumulative count), so the rank
    sum, 2U = 2R_cur − n_cur(n_cur+1), and the final division are
    computed from decimal(38,0) integers — bit-exact on any engine,
    recomputed SQL oracle. Same single-pass melted prefix-sum core as
    :func:`ks_drift` (:func:`_scored_value_counts` — one scan per
    side, one (feature, value) shuffle for the whole feature list);
    NULLs are missingness, excluded; an empty side raises at
    evaluation time (:func:`_guard_nonempty`).

    Returns one row per feature: (feature, u double, auc round-6,
    n_ref, n_cur).
    """
    n_buckets = max(int(n_buckets), 2)
    scored = _scored_value_counts(ref, cur, num_cols, n_buckets)
    return _guard_nonempty(_mwu_from_scored(scored), num_cols,
                           "mwu_drift", "auc")


def _psi_from_counts_by(cnt, k_expr):
    """PSI summaries from a feature-grain (__f, __side, __b, __c)
    count table: full-join the two sides over the (feature, bucket)
    key (either side may miss a bucket), Laplace-smooth with k =
    ``k_expr`` (a literal for the fixed numeric bucket count) or —
    when ``k_expr`` is None — the pooled per-feature distinct-category
    count derived LAZILY from the count frame itself (no eager
    distinct().count() job), round-then-DECIMAL-sum the terms, one
    output row per feature."""
    r = cnt.where(F.col("__side") == "r") \
           .select("__f", "__b", F.col("__c").alias("__cr"))
    c = cnt.where(F.col("__side") == "c") \
           .select("__f", "__b", F.col("__c").alias("__cc"))
    j = (r.join(c, ["__f", "__b"], "full")
         .select("__f", "__b",
                 F.coalesce("__cr", F.lit(0)).alias("__cr"),
                 F.coalesce("__cc", F.lit(0)).alias("__cc")))
    return _psi_from_cr_cc(j, k_expr)


def _psi_from_cr_cc(cnt, k_expr):
    """PSI back half over a (__f, __b, __cr, __cc) both-sides count
    table (the chisq count shape — buckets missing on one side carry a
    0, which a pooled-value derivation yields by construction):
    Laplace-smooth with k = ``k_expr`` or, when None, the per-feature
    pooled category count derived lazily from the frame itself."""
    ns = (cnt.groupBy("__f").agg(
        F.sum("__cr").alias("__nr"),
        F.sum("__cc").alias("__nc")))
    j = cnt.join(F.broadcast(ns), "__f")
    if k_expr is None:
        kf = (cnt.groupBy("__f")
              .agg(F.count(F.lit(1)).cast("double").alias("__k")))
        j = j.join(F.broadcast(kf), "__f")
        k_expr = F.col("__k")
    pr = (F.col("__cr") + F.lit(1.0)) / (F.col("__nr") + k_expr)
    pc = (F.col("__cc") + F.lit(1.0)) / (F.col("__nc") + k_expr)
    lnr = F.round(F.log(pc / pr), 6).cast("decimal(20,6)")
    term = F.round(((pc - pr) * lnr.cast("double"))
                   .cast("decimal(28,12)"), 9).cast("decimal(20,9)")
    return (j.groupBy("__f").agg(
        F.round(F.sum(term).cast("double").cast("decimal(28,8)"), 6)
         .cast("double").alias("psi"),
        F.any_value("__nr").cast("long").alias("n_ref"),
        F.any_value("__nc").cast("long").alias("n_cur"))
        .withColumnRenamed("__f", "feature"))


def _psi_from_counts(cnt, feature: str, k: int):
    """Single-feature PSI from a (__side, __b, __c) count table — the
    compatibility core the streaming PSI twin composes with its
    micro-batch-accumulated bucket counts: tags a constant feature key
    and delegates to :func:`_psi_from_counts_by`."""
    res = _psi_from_counts_by(cnt.withColumn("__f", F.lit(feature)),
                              k_expr=F.lit(float(k)))
    return res.select(F.lit(feature).alias("feature"), "psi",
                      "n_ref", "n_cur")


def embedding_energy_drift(ref, cur, id_col: str, vec_col: str,
                           strides: tuple = (1, 3, 7, 17),
                           n_buckets: int = 32):
    """EMBEDDING-SPACE drift monitor: a strided energy-distance
    estimator between two embedding samples — the scalar drift trio
    (PSI/KS/chi²/MWU) covers tabular features, but LLM-pipeline
    corpora drift in embedding space first; energy distance
    E = 2·E‖X−Y‖ − E‖X−X'‖ − E‖Y−Y'‖ is zero iff the distributions
    coincide and needs no binning, kernel bandwidth, or training.

    SUB-QUADRATIC by a deterministic strided pair design: each side's
    rows get a global rank r (0..n−1 by ``id_col``), and row r pairs
    with row (r+s) mod n for each stride s (within-side terms) and
    with the OTHER side's rank (r+s) mod n_other (cross term) — 
    |strides|·n pairs per term instead of n², all equi-joins on rank,
    no sampling RNG so the estimate is reproducible and carries a
    recomputed SQL oracle (row_number over the same id order).
    Global ranks come from the bucketed prefix-sum core
    (:func:`_cum_value_counts` over the distinct ids — in-bucket
    window cumsums + broadcast per-bucket offsets, no global
    single-partition pass); ``id_col`` must be unique per side.

    Exactness: vectors cast to double element-wise; each pair distance
    is sqrt(max(0, ‖a‖² − 2·a·b + ‖b‖²)) from sequential-fold dot
    products (the ``similarity.dot`` ≡ DuckDB ``list_dot_product``
    equivalence every embedding oracle in this repo already relies
    on), rounded to 6 and DECIMAL-summed; per-term means and the final
    statistic recompute identically in SQL. Self-pairs are excluded;
    stride collisions (s ≡ s' mod n) keep their duplicate weight on
    both engines. Each side needs ≥ 2 rows — violations raise at
    evaluation time (``try_mod`` keeps the degenerate modulo from
    aborting the plan first).

    Returns ONE row: (feature, energy, e_cross, e_ref, e_cur,
    n_ref, n_cur).
    """
    from .similarity import _as_double, dot

    def ranked(side):
        ids = side.select(F.col(id_col).alias("__x")) \
                  .withColumn("__cr", F.lit(1)) \
                  .withColumn("__cc", F.lit(0))
        qs = F.array(*[F.lit(i / n_buckets)
                       for i in range(1, n_buckets)])
        wide = side.agg(F.percentile(F.col(id_col), qs).alias("__a"))
        edges = wide.select(*[F.col("__a")[i - 1].alias(f"__e{i}")
                              for i in range(1, n_buckets)])
        scored = _cum_value_counts(ids, edges, n_buckets - 1)
        ranks = scored.select(
            F.col("__x").alias(id_col),
            (F.col("__kr").cast("long") - 1).alias("__r"),
            F.col("__nr").cast("long").alias("__n"))
        v = _as_double(F.col(vec_col))
        return (side.select(id_col, v.alias("__v"))
                .withColumn("__sq", dot(F.col("__v"), F.col("__v")))
                .join(ranks, id_col))

    sdf = ref.sparkSession.createDataFrame(
        [(int(s),) for s in strides], "__s long")
    a, b = ranked(ref), ranked(cur)

    def pair_mean(left, right, exclude_same_rank):
        # left row r targets right rank (r+s) mod n_right for each
        # stride — an equi-join on rank. Within a side the r==t
        # self-pair (possible once n ≤ stride) is excluded; across
        # sides equal ranks are legitimate pairs.
        n_right = right.agg(F.first("__n").alias("__nt"))
        keys = (left.crossJoin(F.broadcast(sdf))
                .crossJoin(F.broadcast(n_right))
                .select(F.col("__r").alias("__ra"),
                        F.col("__v").alias("__va"),
                        F.col("__sq").alias("__sqa"),
                        F.try_mod(F.col("__r") + F.col("__s"),
                                  F.col("__nt")).alias("__t")))
        if exclude_same_rank:
            keys = keys.where(F.col("__t") != F.col("__ra"))
        pj = keys.join(right.select(F.col("__r").alias("__t"),
                                    F.col("__v").alias("__vb"),
                                    F.col("__sq").alias("__sqb")),
                       "__t")
        d2 = F.greatest(
            F.lit(0.0),
            F.col("__sqa") - F.lit(2.0) * dot(F.col("__va"),
                                              F.col("__vb"))
            + F.col("__sqb"))
        dd = F.round(F.sqrt(d2), 6).cast("decimal(20,6)")
        return pj.agg(
            F.round(F.try_divide(F.sum(dd).cast("double"),
                                 F.count(F.lit(1)))
                    .cast("decimal(28,8)"), 6).cast("double")
            .alias("m"))

    e_cross = pair_mean(a, b, False).select(F.col("m").alias("e_cross"))
    e_ref = pair_mean(a, a, True).select(F.col("m").alias("e_ref"))
    e_cur = pair_mean(b, b, True).select(F.col("m").alias("e_cur"))
    nra = a.agg(F.count(F.lit(1)).alias("n_ref"))
    ncb = b.agg(F.count(F.lit(1)).alias("n_cur"))
    res = (e_cross.crossJoin(e_ref).crossJoin(e_cur)
           .crossJoin(nra).crossJoin(ncb)
           .select(
               F.lit(vec_col).alias("feature"),
               F.round((F.lit(2.0) * F.col("e_cross") - F.col("e_ref")
                        - F.col("e_cur")).cast("decimal(28,8)"), 6)
                .cast("double").alias("energy"),
               "e_cross", "e_ref", "e_cur",
               F.col("n_ref").cast("long").alias("n_ref"),
               F.col("n_cur").cast("long").alias("n_cur")))
    ok = (F.col("n_ref") > 1) & (F.col("n_cur") > 1)
    msg = F.concat(
        F.lit("embedding_energy_drift: each side needs at least 2 "
              "rows (got n_ref="), F.col("n_ref").cast("string"),
        F.lit(", n_cur="), F.col("n_cur").cast("string"), F.lit(")"))
    return res.select(
        "feature",
        F.when(ok, F.col("energy")).otherwise(F.raise_error(msg))
         .alias("energy"),
        "e_cross", "e_ref", "e_cur", "n_ref", "n_cur")


def drift_report(ref, cur, num_cols: list[str], cat_cols: list[str],
                 n_buckets: int = 32, psi_buckets: int = 10):
    """ONE-STOP drift report — every monitor statistic this module
    offers, computed from SHARED shuffles: a production monitoring
    pass wants PSI (binned attribution), KS (nonparametric
    difference), and MWU (directional shift) per numeric feature plus
    PSI and chi-square per categorical feature — and running the five
    operators separately would rebuild the same melted count frames
    five times. Here the whole numeric feature list rides ONE
    (feature, value) count shuffle that feeds all three numeric
    statistics (KS and MWU from the same cumulative frame — Spark
    reuses the exchange across the union branches; numeric PSI's
    decile buckets aggregate from the SAME per-value counts instead of
    re-scanning the rows), and the categorical list rides ONE
    (feature, category) count feeding both chi-square and categorical
    PSI. Two scans per side, two count shuffles, five statistics.

    Identical arithmetic to the single-statistic operators — asserted
    in tests — so the report carries an exact SQL oracle. NULLs are
    missingness (the module convention). A feature empty on either
    side raises at evaluation time via the seeded (feature, statistic)
    guard.

    Returns LONG format, one row per (feature, statistic):
    (feature, statistic, value double, n_ref, n_cur) with statistics
    ``psi | ks | mwu_u | mwu_auc`` (numeric) and
    ``psi | chisq | chisq_dof`` (categorical).
    """
    per_val = edges = pedges = cnt_cat = None
    if num_cols:
        n_buckets = max(int(n_buckets), 2)
        melted = _melt_sides(ref, cur, num_cols)
        per_val = (melted.groupBy("__f", "__x")
                   .agg(F.count(F.when(F.col("__side") == "r", 1))
                        .alias("__cr"),
                        F.count(F.when(F.col("__side") == "c", 1))
                        .alias("__cc")))
        edges = _edges_long(ref, num_cols, n_buckets)
        pedges = _edges_long(ref, num_cols, psi_buckets)
    if cat_cols:
        cnt_cat = (_melt_sides(ref, cur, cat_cols, as_string=True)
                   .groupBy("__f", F.col("__x").alias("__b"))
                   .agg(F.count(F.when(F.col("__side") == "r", 1))
                        .alias("__cr"),
                        F.count(F.when(F.col("__side") == "c", 1))
                        .alias("__cc")))
    return _drift_report_from_counts(per_val, edges, pedges, cnt_cat,
                                     num_cols, cat_cols, n_buckets,
                                     psi_buckets)


def _drift_report_from_counts(per_val, edges, pedges, cnt_cat,
                              num_cols, cat_cols,
                              n_buckets: int, psi_buckets: int):
    """Report back half shared by :func:`drift_report` (counts built
    from two live sides) and :func:`drift_vs_baseline` (reference
    counts/edges read back from a persisted baseline): all five
    statistics from the (feature, value) count frame + the (feature,
    category) count frame, seeded (feature, statistic) guard."""
    from functools import reduce

    def long_row(df, stat, col):
        return df.select(
            "feature", F.lit(stat).alias("statistic"),
            F.col(col).cast("double").alias("value"),
            "n_ref", "n_cur")

    parts = []
    seed_rows = []
    if num_cols:
        scored = _cum_value_counts_by(per_val, edges, n_buckets - 1)
        ks = _ks_from_scored(scored)
        mwu = _mwu_from_scored(scored)
        pcnt = (per_val.join(F.broadcast(pedges), "__f")
                .select("__f", _bucket_expr(psi_buckets - 1).alias("__b"),
                        "__cr", "__cc")
                .groupBy("__f", "__b")
                .agg(F.sum("__cr").alias("__cr"),
                     F.sum("__cc").alias("__cc")))
        psi_n = _psi_from_cr_cc(pcnt, F.lit(float(psi_buckets)))
        parts += [long_row(psi_n, "psi", "psi"),
                  long_row(ks, "ks", "ks"),
                  long_row(mwu, "mwu_u", "u"),
                  long_row(mwu, "mwu_auc", "auc")]
        seed_rows += [(f, s) for f in num_cols
                      for s in ("psi", "ks", "mwu_u", "mwu_auc")]
    if cat_cols:
        chi = _chisq_from_counts(cnt_cat)
        psi_c = _psi_from_cr_cc(cnt_cat, None)
        parts += [long_row(psi_c, "psi", "psi"),
                  long_row(chi, "chisq", "chisq"),
                  long_row(chi, "chisq_dof", "dof")]
        seed_rows += [(f, s) for f in cat_cols
                      for s in ("psi", "chisq", "chisq_dof")]
    res = reduce(lambda a, b: a.unionByName(b), parts)
    seed = res.sparkSession.createDataFrame(
        seed_rows, "feature string, statistic string")
    j = seed.join(res, ["feature", "statistic"], "left")
    ok = ((F.coalesce(F.col("n_ref"), F.lit(0)) > 0)
          & (F.coalesce(F.col("n_cur"), F.lit(0)) > 0))
    msg = F.concat(
        F.lit("drift_report: reference and/or current side is empty "
              "(after the NOT NULL missingness filter) for feature '"),
        F.col("feature"), F.lit("'"))
    return j.select(
        "feature", "statistic",
        F.when(ok, F.col("value")).otherwise(F.raise_error(msg))
         .alias("value"),
        "n_ref", "n_cur")


def persist_drift_baseline(ref, num_cols: list[str],
                           cat_cols: list[str], baseline_root: str,
                           n_buckets: int = 32,
                           psi_buckets: int = 10) -> None:
    """BUILD the frozen drift baseline once — the serving half of the
    monitoring story (the ANN modules' build-once/serve-many shape,
    applied to drift): production monitors compare live traffic
    against a TRAINING-TIME reference distribution, so re-scanning the
    reference corpus on every monitoring pass is wasted work that
    grows with the corpus. This persists the reference's SUFFICIENT
    STATISTICS — per-feature per-distinct-value counts, per-feature
    per-category counts, and both percentile edge frames — all
    metadata-sized relative to the corpus (bounded by distinct-value /
    category cardinality, never row count). One melt scan of the
    reference, total.

    :func:`drift_vs_baseline` then serves any number of monitoring
    passes from the artifact, scanning ONLY the live side — and
    returns bit-identical statistics to :func:`drift_report` on the
    original reference (asserted in tests).

    Layout under ``baseline_root``: ``value_counts/`` (__f, __x,
    __cr), ``cat_counts/`` (__f, __b, __cr), ``edges/`` and
    ``psi_edges/`` (the :func:`_edges_long` frames), ``features/``
    (feature, kind) — plus the bucket counts implied by the edge
    frames at serve time.
    """
    import os

    n_buckets = max(int(n_buckets), 2)
    spark = ref.sparkSession
    feats = [(f, "num") for f in num_cols] + [(f, "cat") for f in cat_cols]
    spark.createDataFrame(feats, "feature string, kind string") \
         .coalesce(1).write.mode("overwrite") \
         .parquet(os.path.join(baseline_root, "features"))
    if num_cols:
        melted = _melt_sides(ref, ref.limit(0), num_cols)
        (melted.where(F.col("__side") == "r")
         .groupBy("__f", "__x")
         .agg(F.count(F.lit(1)).alias("__cr"))
         .write.mode("overwrite")
         .parquet(os.path.join(baseline_root, "value_counts")))
        _edges_long(ref, num_cols, n_buckets) \
            .write.mode("overwrite") \
            .parquet(os.path.join(baseline_root, "edges"))
        _edges_long(ref, num_cols, psi_buckets) \
            .write.mode("overwrite") \
            .parquet(os.path.join(baseline_root, "psi_edges"))
    if cat_cols:
        (_melt_sides(ref, ref.limit(0), cat_cols, as_string=True)
         .where(F.col("__side") == "r")
         .groupBy("__f", F.col("__x").alias("__b"))
         .agg(F.count(F.lit(1)).alias("__cr"))
         .write.mode("overwrite")
         .parquet(os.path.join(baseline_root, "cat_counts")))


def drift_vs_baseline(spark, baseline_root: str, cur,
                      n_buckets: int = 32, psi_buckets: int = 10):
    """SERVE a monitoring pass against a persisted baseline
    (:func:`persist_drift_baseline`): melt the LIVE side only — one
    scan of the live data, the baseline contributes metadata-sized
    count/edge frames — full-join the live counts with the frozen
    reference counts, and compute the same five statistics as
    :func:`drift_report`, bit-identically (asserted in tests; the
    edges, bucket counts, and tie structure are exactly what the
    two-sided pass derives). ``n_buckets``/``psi_buckets`` must match
    the persist call (the stored edge frames carry that width).

    The feature list comes from the artifact's ``features/`` frame —
    a driver-side read of a feature-count-sized table (tens of rows),
    the only collect in the path.
    """
    import os

    n_buckets = max(int(n_buckets), 2)
    feats = spark.read.parquet(
        os.path.join(baseline_root, "features")).collect()
    num_cols = [r["feature"] for r in feats if r["kind"] == "num"]
    cat_cols = [r["feature"] for r in feats if r["kind"] == "cat"]
    per_val = edges = pedges = cnt_cat = None
    if num_cols:
        ref_cnt = spark.read.parquet(
            os.path.join(baseline_root, "value_counts"))
        cur_cnt = (_melt_sides(cur.limit(0), cur, num_cols)
                   .where(F.col("__side") == "c")
                   .groupBy("__f", "__x")
                   .agg(F.count(F.lit(1)).alias("__cc")))
        per_val = (ref_cnt.join(cur_cnt, ["__f", "__x"], "full")
                   .select("__f", "__x",
                           F.coalesce("__cr", F.lit(0)).alias("__cr"),
                           F.coalesce("__cc", F.lit(0)).alias("__cc")))
        edges = spark.read.parquet(os.path.join(baseline_root, "edges"))
        pedges = spark.read.parquet(
            os.path.join(baseline_root, "psi_edges"))
    if cat_cols:
        ref_cat = spark.read.parquet(
            os.path.join(baseline_root, "cat_counts"))
        cur_cat = (_melt_sides(cur.limit(0), cur, cat_cols,
                               as_string=True)
                   .where(F.col("__side") == "c")
                   .groupBy("__f", F.col("__x").alias("__b"))
                   .agg(F.count(F.lit(1)).alias("__cc")))
        cnt_cat = (ref_cat.join(cur_cat, ["__f", "__b"], "full")
                   .select("__f", "__b",
                           F.coalesce("__cr", F.lit(0)).alias("__cr"),
                           F.coalesce("__cc", F.lit(0)).alias("__cc")))
    return _drift_report_from_counts(per_val, edges, pedges, cnt_cat,
                                     num_cols, cat_cols, n_buckets,
                                     psi_buckets)


def drift_timeline(spark, baseline_root: str, cur, period,
                   n_buckets: int = 32, psi_buckets: int = 10):
    """WHEN did it start drifting? Per-PERIOD drift of the live side
    against a frozen :func:`persist_drift_baseline` artifact: the
    point-in-time monitors say THAT a feature moved; the timeline
    slices the live side by ``period`` (any Column over the live row —
    a day, a year, an ingest batch id) and reports every statistic per
    (period, feature), so the onset and trajectory are visible.

    Scale shape — the composite-key trick: period and feature fuse
    into one key (``period␟feature``), so the ENTIRE report machinery
    (:func:`_drift_report_from_counts` — melted counts, per-key
    prefix sums, bucket aggregation) runs unchanged at (period ×
    feature) grain: ONE scan of the live side and one count shuffle
    for the whole timeline, not one monitoring pass per period. The
    baseline's count/edge frames replicate per period via a broadcast
    join with the distinct-periods frame (timeline-length ×
    cardinality-bounded — metadata-sized). Each period's rows are
    BIT-EQUAL to :func:`drift_vs_baseline` on that period's slice
    (asserted in tests), which is itself bit-equal to the two-sided
    :func:`drift_report`.

    The distinct periods and the artifact's feature list are the only
    driver-side collects (timeline-length and feature-count rows).
    Period values must not contain the ``\\x1f`` separator.

    Returns (period string, feature, statistic, value double,
    n_ref, n_cur) — n_ref is the frozen baseline count (identical
    across periods), n_cur the period slice's count.
    """
    import os

    sep = "\x1f"
    n_buckets = max(int(n_buckets), 2)
    feats = spark.read.parquet(
        os.path.join(baseline_root, "features")).collect()
    num_cols = [r["feature"] for r in feats if r["kind"] == "num"]
    cat_cols = [r["feature"] for r in feats if r["kind"] == "cat"]
    cur_p = (cur.withColumn("__p", period.cast("string"))
             .where(F.col("__p").isNotNull()))
    periods_df = cur_p.select("__p").distinct()
    periods = sorted(r["__p"] for r in periods_df.collect())

    def replicate(df):
        # one baseline row per (period, original key): broadcast the
        # timeline-length periods frame, fuse the composite key
        return (df.crossJoin(F.broadcast(periods_df))
                .withColumn("__f", F.concat(F.col("__p"), F.lit(sep),
                                            F.col("__f")))
                .drop("__p"))

    def melt_cur(cols, as_string):
        cast_to = "string" if as_string else "double"
        pairs = F.array(*[
            F.struct(F.lit(c).alias("f"),
                     F.col(c).cast(cast_to).alias("x"))
            for c in cols])
        return (cur_p.select("__p", F.explode(pairs).alias("s"))
                .select(F.concat(F.col("__p"), F.lit(sep),
                                 F.col("s.f")).alias("__f"),
                        F.col("s.x").alias("__x"))
                .where(F.col("__x").isNotNull()))

    per_val = edges = pedges = cnt_cat = None
    if num_cols:
        ref_cnt = replicate(spark.read.parquet(
            os.path.join(baseline_root, "value_counts")))
        cur_cnt = (melt_cur(num_cols, as_string=False)
                   .groupBy("__f", "__x")
                   .agg(F.count(F.lit(1)).alias("__cc")))
        per_val = (ref_cnt.join(cur_cnt, ["__f", "__x"], "full")
                   .select("__f", "__x",
                           F.coalesce("__cr", F.lit(0)).alias("__cr"),
                           F.coalesce("__cc", F.lit(0)).alias("__cc")))
        edges = replicate(spark.read.parquet(
            os.path.join(baseline_root, "edges")))
        pedges = replicate(spark.read.parquet(
            os.path.join(baseline_root, "psi_edges")))
    if cat_cols:
        ref_cat = replicate(spark.read.parquet(
            os.path.join(baseline_root, "cat_counts")))
        cur_cat = (melt_cur(cat_cols, as_string=True)
                   .groupBy("__f", F.col("__x").alias("__b"))
                   .agg(F.count(F.lit(1)).alias("__cc")))
        cnt_cat = (ref_cat.join(cur_cat, ["__f", "__b"], "full")
                   .select("__f", "__b",
                           F.coalesce("__cr", F.lit(0)).alias("__cr"),
                           F.coalesce("__cc", F.lit(0)).alias("__cc")))
    comp_num = [f"{p}{sep}{c}" for p in periods for c in num_cols]
    comp_cat = [f"{p}{sep}{c}" for p in periods for c in cat_cols]
    res = _drift_report_from_counts(per_val, edges, pedges, cnt_cat,
                                    comp_num, comp_cat, n_buckets,
                                    psi_buckets)
    return res.select(
        F.substring_index("feature", sep, 1).alias("period"),
        F.substring_index("feature", sep, -1).alias("feature"),
        "statistic", "value", "n_ref", "n_cur")
