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
