"""Graph operators for dup-cluster resolution.

Near-duplicate detection (``operators/dedup.py``) emits *pairs*; turning
pairs into keep/drop decisions needs the transitive closure — if A~B and
B~C, then {A,B,C} is one cluster even when A and C are not directly
similar. This module computes connected components over the pair graph
and labels every member with the cluster's canonical (minimum) id, the
standard final step of a corpus-dedup pipeline (cf. the MinHash dedup
stages of C4/RefinedWeb).

Spark-first design: min-label propagation WITH POINTER JUMPING as an
iterative sequence of DataFrame joins/aggregations. Each round first
takes the min label over graph neighbours, then shortcuts through the
label graph twice (``component ← component's component`` — path
halving, the core move of Kiveris et al.'s large-star contraction in
"Connected Components in MapReduce and Beyond"), so a chain of length d
resolves in O(log d) rounds instead of O(d) — plain propagation walks
one hop per round and chain-shaped dup clusters (A~B~C~… from
transitive near-dups) made round count, i.e. Spark-job count, the cost
driver at small scale. Each round is a constant number of shuffles
keyed on vertex id (uniform — doc ids), ``localCheckpoint`` truncates
the lineage so the plan does not grow with iterations, and convergence
is detected from the label-sum aggregate (labels only ever decrease, so
an unchanged sum IS the fixpoint — no extra join-and-count job).

Beyond-reference surface: the reference repo has no graph stage; its
dedup (ROW_NUMBER in ``etl_staging_loader.py``) never needs closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label each vertex of an undirected graph with min reachable id.

    Parameters
    ----------
    edges : DataFrame with two integer-ish vertex-id columns. Treated as
        undirected; duplicates/self-loops are fine.
    max_iter : hard cap on propagation rounds (raises if the graph has a
        component whose diameter exceeds it — a sign the input is not a
        dup-pair graph).

    Returns ``(id, component)`` where ``component`` is the minimum vertex
    id reachable from ``id``. Deterministic: the fixpoint is unique, so
    partitioning/scheduling cannot change the answer.
    """
    e = edges.select(F.col(src).cast("long").alias("a"),
                     F.col(dst).cast("long").alias("b"))
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b"))) \
           .where(F.col("a") != F.col("b")).distinct() \
           .localCheckpoint(eager=True)

    labels = sym.select(F.col("a").alias("id")).distinct() \
                .withColumn("component", F.col("id"))

    def shortcut(lbl):
        """Path halving: component ← min(component, component's component).
        Every component value is itself a vertex id present in lbl, so the
        self-join is total; labels are monotone non-increasing."""
        tgt = lbl.select(F.col("id").alias("__cid"),
                         F.col("component").alias("__cc"))
        return (lbl.join(tgt, lbl["component"] == tgt["__cid"])
                   .select("id", F.least("component", "__cc").alias("component")))

    # Fingerprint = (sum, count) of labels: every label change strictly
    # decreases some label with all others non-increasing, so the sum is
    # strictly monotone until the fixpoint — equality IS convergence, one
    # cheap aggregate instead of a join-and-count job per round.
    def fingerprint(lbl):
        row = lbl.agg(F.sum(F.col("component").cast("decimal(38,0)")).alias("s"),
                      F.count(F.lit(1)).alias("n")).collect()[0]
        return (row["s"], row["n"])

    labels = labels.localCheckpoint(eager=True)
    prev = fingerprint(labels)
    for it in range(max_iter):
        nbr_min = (sym.join(labels, sym["b"] == labels["id"])
                      .groupBy("a").agg(F.min("component").alias("nbr_min")))
        new_labels = (labels.join(nbr_min, labels["id"] == nbr_min["a"], "left")
                            .select(labels["id"],
                                    F.least("component",
                                            F.coalesce("nbr_min", "component"))
                                     .alias("component")))
        # Path-halving shortcuts only from round 2: dup-pair graphs are
        # usually near-clique (diameter 1-2), where the neighbor pass
        # alone converges in one round and each shortcut would add two
        # pure-overhead shuffle joins per round. Deep chains still get
        # the O(log d) contraction — they are exactly the graphs that
        # reach round 2.
        if it > 0:
            new_labels = shortcut(shortcut(new_labels))
        new_labels = new_labels.localCheckpoint(eager=True)
        cur = fingerprint(new_labels)
        labels = new_labels
        if cur == prev:
            return labels
        prev = cur
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "component diameter too large for a dup-pair graph")


def cluster_dedup(
    pairs: DataFrame,
    all_ids: DataFrame,
    id_col: str,
    left: str = "id_a",
    right: str = "id_b",
) -> DataFrame:
    """Full dedup decision from near-dup pairs: every document labeled
    with its cluster id and a keep flag (canonical = min id per cluster;
    documents in no pair keep themselves).

    ``all_ids`` supplies the singleton universe so the output covers the
    whole corpus, not just paired docs.
    """
    cc = connected_components(pairs, src=left, dst=right)
    ids = all_ids.select(F.col(id_col).cast("long").alias("id")).distinct()
    labeled = (ids.join(cc, "id", "left")
                  .select(F.col("id").alias(id_col),
                          F.coalesce("component", "id").alias("cluster_id")))
    return labeled.withColumn(
        "is_canonical", (F.col(id_col) == F.col("cluster_id")).cast("boolean"))


def canonical_by_score(labeled: DataFrame, id_col: str, cluster_col: str,
                       score_col: str) -> DataFrame:
    """Re-flag cluster members so the HIGHEST-scoring member is canonical
    (ties → lowest id) — the keep-the-best step after cluster resolution
    (keep-longest / keep-highest-quality are the standard corpus rules;
    min-id canonicals throw away the best copy whenever the best copy
    isn't the oldest). One window on the cluster id — same shuffle key the
    labeling already used, and ``WindowGroupLimit`` prunes past rank 1
    map-side."""
    w = Window.partitionBy(cluster_col).orderBy(F.desc(score_col),
                                                F.asc(id_col))
    return labeled.withColumn(
        "is_canonical", (F.row_number().over(w) == 1).cast("boolean"))
