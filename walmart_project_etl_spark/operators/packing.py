"""Sequence packing for LLM pre-training batches.

Pre-training consumes fixed-length token sequences; documents are
concatenated head-to-tail and split at ``capacity``-token boundaries
(the standard "concatenate-and-split" packing — no padding waste, a
document may straddle two sequences). This module computes that packing
INDEX distributively: which sequence each document starts in and at what
offset, without materializing token streams.

Beyond-reference surface (the reference has no training-data concepts);
deterministic by construction: group assignment is md5 of the doc key and
the intra-group order is the doc key itself, so any engine, any
parallelism, any rerun yields the identical packing.

Scale shape at 100 TB: one shuffle on the group id. Groups are
hash-uniform, so every window task sees ~|corpus|/n_groups rows; pick
``n_groups`` ≈ corpus_tokens / (executor_mem_tokens) to bound the running
sum's task size. No global sort, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from walmart_project_etl_spark.operators.sampling import hash_bucket


def pack_sequences(df: DataFrame, id_col: str, token_count_col: str,
                   capacity: int, n_groups: int = 256,
                   salt: str = "") -> DataFrame:
    """Concatenate-and-split packing index.

    Every document lands in a packing group (md5 hash bucket of its id);
    within the group, documents are laid head-to-tail in id order. A
    *sequence* is one ``capacity``-token window of that concatenation.
    Adds to each row:

    - ``pack_group``   — the hash group (long, [0, n_groups))
    - ``seq_id``       — index of the sequence this document STARTS in
    - ``seq_offset``   — token offset of the document within that sequence

    A document with ``seq_offset + n_tokens > capacity`` straddles into the
    following sequence(s) — exactly the semantics of GPT-style packed
    pre-training batches. The running sum is a single ordered window per
    group (map-side partial aggregation does not apply to running sums, but
    group tasks are hash-uniform and independently sized via ``n_groups``).
    """
    grp = hash_bucket(
        F.concat_ws("#", F.lit(salt), F.col(id_col).cast("string")),
        buckets=n_groups)
    w = Window.partitionBy("pack_group").orderBy(F.col(id_col))
    start = (F.sum(F.col(token_count_col)).over(w)
             - F.col(token_count_col)).cast("long")
    # integer `div`, not floor(double division): a group's running token
    # count can exceed 2^53, where double arithmetic would mis-bin docs
    return (df.withColumn("pack_group", grp)
              .withColumn("__start", start)
              .withColumn("seq_id", F.expr(f"__start div {int(capacity)}"))
              .withColumn("seq_offset", F.col("__start") % capacity)
              .drop("__start"))


def pack_bins_bfd(df: DataFrame, id_col: str, token_count_col: str,
                  capacity: int, n_groups: int = 256,
                  salt: str = "") -> DataFrame:
    """BEST-FIT-DECREASING bin packing — the no-straddle alternative to
    :func:`pack_sequences`: documents are never split across sequences
    (needed when attention must not cross document boundaries and
    truncation is unacceptable), at the cost of per-bin slack instead.

    Classic BFD (sort decreasing, place each doc in the FULLEST bin it
    still fits, else open a new one) is inherently sequential, so it
    runs per hash group: docs land in ``n_groups`` md5 buckets (same
    scheme as pack_sequences — group count sets task parallelism and
    bounds per-task state), and one Arrow-batched ``applyInPandas``
    packs each group independently. BFD is an 11/9·OPT+1
    approximation (Johnson 1973) INSIDE each group; grouping costs a
    little cross-group slack but is what makes the policy run on 100 TB
    — per-task memory is one group's (tokens, id) pairs, never the
    corpus.

    Deterministic: docs sort by (tokens DESC, id ASC); the fullest-bin
    tie breaks on the LOWEST bin id. Documents longer than ``capacity``
    are rejected (ValueError) — filter or chunk them first
    (``operators/text.py:chunk_text``).

    Adds ``pack_group``, ``bin_id`` (dense per group, fill order) and
    ``bin_fill`` (the bin's total tokens after packing).
    """
    import pandas as pd

    grp = hash_bucket(
        F.concat_ws("#", F.lit(salt), F.col(id_col).cast("string")),
        buckets=n_groups)
    work = df.withColumn("pack_group", grp)
    cols = work.columns

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        toobig = pdf[pdf[token_count_col] > capacity]
        if len(toobig):
            raise ValueError(
                f"pack_bins_bfd: {len(toobig)} document(s) exceed "
                f"capacity {capacity} (e.g. id "
                f"{toobig[id_col].iloc[0]!r}) — chunk or filter first")
        pdf = pdf.sort_values([token_count_col, id_col],
                              ascending=[False, True])
        fills: list[int] = []
        bin_of = []
        for tok in pdf[token_count_col]:
            best, best_fill = -1, -1
            for b, f in enumerate(fills):
                if f + tok <= capacity and f > best_fill:
                    best, best_fill = b, f
            if best < 0:
                best = len(fills)
                fills.append(0)
            fills[best] += int(tok)
            bin_of.append(best)
        pdf = pdf.assign(bin_id=bin_of,
                         bin_fill=[fills[b] for b in bin_of])
        return pdf

    from pyspark.sql.types import IntegerType, LongType
    out_schema = work.schema.add("bin_id", IntegerType()) \
                            .add("bin_fill", LongType())
    return (work.repartition(n_groups, "pack_group")
            .groupBy("pack_group")
            .applyInPandas(
                lambda pdf: pack(pdf)[[*cols, "bin_id", "bin_fill"]],
                out_schema))
