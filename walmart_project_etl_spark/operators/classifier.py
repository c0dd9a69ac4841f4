"""Trainable linear quality classifier over text — the fastText-style
model-based filter real curation pipelines pair with the heuristic rules
(public recipe: CCNet / GPT-3 / LLaMA data work all gate web text with a
linear classifier over hashed bag-of-words features).

Scale split (the load-bearing design decision):

- **Training** runs on a BOUNDED sample (a labeled slice never bigger
  than a dimension table): hashed token counts are assembled into
  ``pyspark.ml`` sparse vectors through one Arrow hop and fit with
  ``LogisticRegression`` (LBFGS from a zero start — deterministic for a
  fixed input, no RNG in the path).
- **Inference** never touches the model object: the learned weights come
  back as a PLAIN PYTHON LIST and scoring is exploded-token relational
  algebra — explode → hash-bucket → broadcast-join the tiny weight
  table → groupBy(doc) sum → sigmoid. Pure JVM Columns, no UDF, no
  model server; at 100 TB the scoring pass is one explode + one shuffle
  on the doc id, exactly like the TF-IDF operator.

Hashing trick: bucket = ``xxhash64(token) % n_features`` — the SAME
expression in training and scoring, so there is no vocabulary object to
ship, just the weight vector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: split pattern shared by train/score — whitespace tokens, lowercased
_TOKEN_SPLIT = r"\s+"


def hashed_token_counts(df: DataFrame, id_col: str, text_col: str,
                        n_features: int) -> DataFrame:
    """(id, bucket, cnt): exploded hashed bag-of-words counts — the
    shared feature extraction for training and scoring."""
    toks = (df.select(F.col(id_col),
                      F.explode(F.split(F.lower(F.col(text_col)),
                                        _TOKEN_SPLIT)).alias("__t"))
            .where(F.col("__t") != ""))
    return (toks.groupBy(id_col,
                         F.pmod(F.xxhash64("__t"), F.lit(n_features))
                          .cast("int").alias("bucket"))
            .agg(F.count(F.lit(1)).cast("double").alias("cnt")))


def train_linear_classifier(train_df: DataFrame, id_col: str,
                            text_col: str, label_col: str,
                            n_features: int = 256,
                            reg_param: float = 0.01,
                            max_iter: int = 50) -> tuple[list[float], float]:
    """Fit logistic regression on hashed token counts; returns
    ``(weights, intercept)`` as plain Python values ready to ride into a
    Column-only scoring plan. ``label_col`` must be 0.0/1.0 doubles.

    Even the feature assembly is relational: an explicit-values pivot of
    the hashed counts into ``n_features`` columns, packed with
    ``array_to_vector`` — no UDF, no Python hop anywhere."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    counts = hashed_token_counts(train_df, id_col, text_col, n_features)
    wide = (counts.groupBy(id_col)
            .pivot("bucket", list(range(n_features)))
            .agg(F.first("cnt")))
    feats = wide.select(
        id_col,
        array_to_vector(F.array(*[F.coalesce(F.col(str(b)), F.lit(0.0))
                                  for b in range(n_features)]))
        .alias("features"))
    train = feats.join(
        train_df.select(id_col, F.col(label_col).cast("double")
                        .alias("label")), id_col).select("label", "features")
    lr = LogisticRegression(maxIter=max_iter, regParam=reg_param,
                            standardization=True)
    model = lr.fit(train)
    return [float(w) for w in model.coefficients], float(model.intercept)


def score_linear(df: DataFrame, id_col: str, text_col: str,
                 weights: list[float], intercept: float) -> DataFrame:
    """Corpus-scale scoring with literal weights: explode → hash-bucket →
    broadcast weight join → per-doc sum → sigmoid. Returns
    (id, score, prediction); docs with NO tokens score the bias alone.
    No UDF anywhere — the whole plan is JVM Columns."""
    spark = df.sparkSession
    n_features = len(weights)
    wtab = F.broadcast(spark.createDataFrame(
        [(i, w) for i, w in enumerate(weights) if w != 0.0],
        "bucket int, w double"))
    counts = hashed_token_counts(df, id_col, text_col, n_features)
    margins = (counts.join(wtab, "bucket")
               .groupBy(id_col)
               .agg(F.sum(F.col("cnt") * F.col("w")).alias("__m")))
    out = (df.select(id_col).join(margins, id_col, "left")
           .select(F.col(id_col),
                   (F.lit(1.0)
                    / (F.lit(1.0)
                       + F.exp(-(F.coalesce(F.col("__m"), F.lit(0.0))
                                 + F.lit(intercept))))).alias("score")))
    return out.select(id_col, F.round("score", 6).alias("score"),
                      (F.col("score") >= 0.5).cast("int").alias("prediction"))
