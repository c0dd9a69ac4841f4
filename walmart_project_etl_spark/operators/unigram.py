"""Unigram-LM subword tokenizer: distributed training + encoding.

The OTHER public tokenizer family next to BPE (Kudo 2018, "Subword
Regularization" — the SentencePiece ``unigram`` model): hold a vocabulary
of candidate pieces with log-probabilities, segment each word by Viterbi
(max total piece log-prob), re-estimate piece probabilities from the
segmentation counts, prune, repeat. This implementation runs HARD
(Viterbi) EM rather than the paper's forward-backward soft EM, and prunes
by count rank rather than likelihood loss — the deterministic,
rank-stable simplification; both choices are documented here because they
change the learned vocabulary, not just its arrival order.

Scale shape — same trick as ``operators/bpe.py``: tokenizer training is a
DISTINCT-WORD problem. One corpus-scale map-side-combined groupBy builds
the (word, freq) table; seeding explodes each distinct word's substrings
in-row (O(len·max_len) per word); every EM round runs Viterbi over
distinct words only, through ONE Arrow-batched pandas UDF whose closure
carries the current piece table (≤ vocab_size entries — bounded model
state, broadcast with the task like BPE's merge rules). Encoding
tokenizes distinct words once and broadcast-joins the word→pieces map
back to the corpus: one corpus scan total, ever.

Determinism (what lets sf0.01 outputs pin as goldens): integer freq
sums, fixed tie-breaks everywhere — seed and prune rank by (count DESC,
piece ASC); Viterbi scans split points left-to-right with strict
improvement, so equal-score splits keep the earliest; log-probs round
to 6 between rounds.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import _words

#: log-prob floor for single-character fallback pieces absent from the
#: current vocabulary — keeps every word segmentable at every round.
UNK_LOGP = -20.0


def _seed_vocab(words: DataFrame, max_piece_len: int,
                seed_size: int) -> DataFrame:
    """Candidate pieces: every substring (length ≤ max_piece_len) of
    every distinct word, freq-weighted by occurrence; in-row position
    explode, one uniform groupBy. Keeps ALL single characters (coverage
    guarantee) + the top ``seed_size`` multi-char pieces by
    (freq DESC, piece ASC)."""
    # lengths are capped at the remaining word tail so substring()
    # truncation can never emit the same piece twice from one start
    subs = words.select(
        "freq",
        F.explode(F.flatten(F.transform(
            F.sequence(F.lit(0), F.length("w") - 1),
            lambda i: F.transform(
                F.sequence(F.lit(1),
                           F.least(F.lit(max_piece_len),
                                   F.length("w") - i)),
                lambda n: F.substring(F.col("w"), i + 1, n)))))
        .alias("piece"))
    counts = subs.groupBy("piece").agg(F.sum("freq").alias("cnt"))
    chars = counts.where(F.length("piece") == 1)
    multi = (counts.where(F.length("piece") > 1)
             .orderBy(F.desc("cnt"), F.asc("piece")).limit(seed_size))
    return chars.unionByName(multi)


def _viterbi_counts(words: DataFrame, pieces: dict[str, float],
                    max_piece_len: int) -> DataFrame:
    """One hard-EM E-step: Viterbi-segment each distinct word under the
    current piece log-probs (Arrow-batched over the distinct-word
    table), emit (piece, cnt=Σ word freq) usage counts."""
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("array<string>")
    def segment(ws: pd.Series) -> pd.Series:
        out = []
        for w in ws:
            n = len(w)
            best = [-math.inf] * (n + 1)
            back = [0] * (n + 1)
            best[0] = 0.0
            for i in range(1, n + 1):
                for j in range(max(0, i - max_piece_len), i):
                    p = w[j:i]
                    lp = pieces.get(p)
                    if lp is None:
                        if i - j > 1:
                            continue
                        lp = UNK_LOGP            # char fallback
                    s = best[j] + lp
                    if s > best[i]:              # strict: earliest j ties
                        best[i], back[i] = s, j
            toks, i = [], n
            while i > 0:
                toks.append(w[back[i]:i])
                i = back[i]
            out.append(toks[::-1])
        return pd.Series(out)

    return (words.select("freq", F.explode(segment("w")).alias("piece"))
            .groupBy("piece").agg(F.sum("freq").alias("cnt")))


def unigram_train(df: DataFrame, text_col: str = "text",
                  vocab_size: int = 512, rounds: int = 2,
                  max_piece_len: int = 6,
                  seed_size: int | None = None) -> DataFrame:
    """Train the unigram-LM vocabulary: seed → (Viterbi E-step, count
    M-step, rank prune) × ``rounds``. Returns (piece, logprob round-6),
    ≤ vocab_size rows, single characters always retained.

    The per-round model state (piece → logprob) is collected to a dict
    of ≤ max(seed, vocab) entries — bounded like BPE's merge table, NOT
    corpus-sized — and ships inside the segmenting UDF's closure.
    """
    words = _words(df, text_col).localCheckpoint(eager=False)
    vocab = _seed_vocab(words, max_piece_len,
                        seed_size or 4 * vocab_size)
    for _ in range(rounds):
        total = vocab.agg(F.sum("cnt")).collect()[0][0]
        pieces = {r["piece"]: round(math.log(r["cnt"] / total), 6)
                  for r in vocab.collect()}
        counts = _viterbi_counts(words, pieces, max_piece_len)
        chars = (vocab.select("piece").where(F.length("piece") == 1)
                 .join(counts, "piece", "left")
                 .select("piece", F.coalesce("cnt", F.lit(1)).alias("cnt")))
        multi = (counts.where(F.length("piece") > 1)
                 .orderBy(F.desc("cnt"), F.asc("piece"))
                 .limit(max(0, vocab_size
                            - chars.count())))
        vocab = chars.unionByName(multi).localCheckpoint(eager=False)
    total = vocab.agg(F.sum("cnt")).collect()[0][0]
    return vocab.select(
        "piece",
        F.round(F.log(F.col("cnt") / F.lit(float(total))), 6)
         .alias("logprob"))


def unigram_encode(df: DataFrame, vocab: DataFrame,
                   text_col: str = "text", id_col: str = "doc_id",
                   max_piece_len: int = 6,
                   broadcast_words_max: int | None = 50_000_000) -> DataFrame:
    """Tokenize a corpus with a trained vocabulary: Viterbi over the
    DISTINCT words once, then one join maps every word occurrence to its
    pieces — the tokenization-cache shape; the only corpus-scale work is
    the final scan.

    Join strategy is SIZE-GATED (VERDICT r12 task 4): the word→count map
    is normally broadcast (distinct vocabularies are bounded, corpora are
    not), but a web-scale corpus can exceed the executor-memory broadcast
    ceiling (~100M distinct words ≈ gigabytes). When the distinct-word
    count exceeds ``broadcast_words_max`` the hint is dropped and the map
    joins by plain shuffle hash/SMJ on the word key — same result, one
    extra corpus shuffle. The gate costs one count over the already-
    aggregated distinct-word frame, trivial next to the Viterbi pass;
    pass ``broadcast_words_max=None`` to skip the gate and always
    broadcast. (The BPE twin, bpe.bpe_encode, never forces the hint —
    AQE picks broadcast vs shuffle from the actual map size at runtime.)

    Returns (id_col, n_words, n_tokens, pieces_per_word round-6).
    """
    from pyspark.sql.pandas.functions import pandas_udf

    pieces = {r["piece"]: r["logprob"] for r in vocab.collect()}
    words = _words(df, text_col).select("w")

    @pandas_udf("int")
    def n_tokens_of(ws: pd.Series) -> pd.Series:
        out = []
        for w in ws:
            n = len(w)
            best = [-math.inf] * (n + 1)
            back = [0] * (n + 1)
            best[0] = 0.0
            for i in range(1, n + 1):
                for j in range(max(0, i - max_piece_len), i):
                    p = w[j:i]
                    lp = pieces.get(p)
                    if lp is None:
                        if i - j > 1:
                            continue
                        lp = UNK_LOGP
                    s = best[j] + lp
                    if s > best[i]:
                        best[i], back[i] = s, j
            k, i = 0, n
            while i > 0:
                k += 1
                i = back[i]
            out.append(k)
        return pd.Series(out)

    wmap = words.select("w", n_tokens_of("w").alias("__nt"))
    if broadcast_words_max is not None \
            and words.count() > broadcast_words_max:
        join_side = wmap          # shuffle join: vocab exceeds the ceiling
    else:
        join_side = F.broadcast(wmap)
    toks = (df.select(
                F.col(id_col),
                F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                                  r"\s+")).alias("w"))
            .where(F.col("w") != ""))
    return (toks.join(join_side, "w")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.sum("__nt").alias("n_tokens"),
                 F.round(F.sum("__nt") / F.count(F.lit(1)), 6)
                  .alias("pieces_per_word")))
