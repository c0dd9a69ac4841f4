"""Deduplication operators.

``latest_per_key`` is the reference's only dedup (W1 window dedup before
MERGE/SCD2, ``etl_target_loader.py:118-124`` etc.). The rest is the
training-data-pipeline surface: exact, MinHash-LSH, SimHash, and n-gram
Jaccard near-duplicate detection over a document corpus — all expressed as
compositions of built-in DataFrame ops (shingle → hash → band → bucket join),
no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


# --------------------------------------------------------------- W1: window dedup

def latest_per_key(df: DataFrame, keys: list[str],
                   order_by: list[Column]) -> DataFrame:
    """Keep one row per key by ranking order (reference W1,
    ``etl_target_loader.py:118-124, 172-178, 221-227, 268-274, 312-316,
    494-498``): ``ROW_NUMBER() OVER (PARTITION BY k ORDER BY ...) = 1``.

    One shuffle on the key; AQE handles skewed keys. Deterministic only if
    ``order_by`` is a total order within each key — callers append a
    tie-breaker column when the reference's ordering is ambiguous.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (df.withColumn("__rn", F.row_number().over(w))
              .where(F.col("__rn") == 1)
              .drop("__rn"))


# --------------------------------------------------------------- exact dedup

def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Exact-content dedup: md5 the content, keep the lowest id per digest.

    Hash-groupBy — one shuffle keyed on a 128-bit digest, uniformly
    distributed so no skew at any scale. Returns the surviving rows.
    """
    digest = F.md5(F.col(content_col).cast("string"))
    w = Window.partitionBy(digest).orderBy(F.col(id_col))
    return (df.withColumn("__rn", F.row_number().over(w))
              .where(F.col("__rn") == 1)
              .drop("__rn"))


def incremental_exact_dedup(batch: DataFrame, corpus: DataFrame,
                            id_col: str, content_col: str) -> DataFrame:
    """Dedup a NEW batch against an EXISTING corpus — the shape every
    continuously-ingested corpus needs (recrawls, daily dumps): never
    re-compare the whole corpus against itself, only the delta against the
    index.

    Drops batch rows whose content digest already exists in the corpus,
    then exact-dedups within the batch itself (keep lowest id per digest).
    Scale shape: the corpus side reduces to a DISTINCT digest set (one
    uniform 128-bit-key shuffle — in production this set is the persisted
    dedup index, maintained incrementally, so the corpus scan disappears
    entirely); the batch side is one anti-join plus one window, both keyed
    on the digest. Batch ≪ corpus, so AQE broadcasts the batch side of the
    anti-join when it fits.
    """
    digest = F.md5(F.col(content_col).cast("string"))
    seen = corpus.select(digest.alias("__d")).distinct()
    b = batch.withColumn("__d", digest)
    fresh = b.join(seen, "__d", "left_anti")
    w = Window.partitionBy("__d").orderBy(F.col(id_col))
    return (fresh.withColumn("__rn", F.row_number().over(w))
                 .where(F.col("__rn") == 1)
                 .drop("__rn", "__d"))


# --------------------------------------------------------------- shingling

def char_shingles(col: Column | str, k: int = 5) -> Column:
    """Distinct character k-grams of a string, as an array<string>.

    Pure Column expression: ``transform(sequence(...))`` over substring —
    no UDF, no explode needed until the caller wants one row per shingle.
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.greatest(F.length(c) - (k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(c, i, k)))


def word_ngrams(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-grams (space-joined) of a whitespace-tokenized string.

    Built by zipping the token array against its own n−1 shifted copies
    (``zip_with`` + ``slice``) rather than ``transform(sequence)`` over
    per-gram ``slice``+``array_join``: expressions referenced inside a
    higher-order-function lambda are re-evaluated PER ELEMENT (no
    common-subexpression elimination across the lambda boundary), so the
    old shape re-ran the regex tokenizer once per gram — the single
    hottest expression in corpus dedup. This shape evaluates the split
    O(n) times per row instead of O(tokens). Documents shorter than n
    tokens produce one gram holding the whole text (matching the SQL
    oracles' ``slice``-beyond-end behaviour)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.trim(c), r"\s+")
    grams = toks
    for i in range(1, n):
        # shifted copy [i+1 ..]; zip pads the tail with NULL and concat
        # propagates it, so incomplete tail grams null out
        shifted = F.slice(toks, i + 1,
                          F.greatest(F.size(toks) - i, F.lit(0)))
        grams = F.zip_with(grams, shifted,
                           lambda x, y: F.concat(x, F.lit(" "), y))
    full = F.filter(grams, lambda g: g.isNotNull())
    return F.array_distinct(
        F.when(F.size(toks) < n, F.array(F.array_join(toks, " ")))
         .otherwise(full))


# --------------------------------------------------------------- MinHash + LSH

def minhash_signature(shingles: Column, num_hashes: int = 64, seed: int = 42) -> Column:
    """MinHash signature as a pure Column expression: for each of
    ``num_hashes`` hash families, the min xxhash64(shingle, family_seed)
    over the shingle set (array<bigint> of length num_hashes).

    NOTE: fine for small shingle sets / tests; for corpus-scale signature
    computation prefer :func:`minhash_signatures` — the nested
    per-family×per-shingle lambda here makes Catalyst evaluate a huge
    expression tree per row, while the exploded groupBy form hashes each
    shingle once per family in straight-line codegen.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda h: F.array_min(
            F.transform(shingles, lambda s: F.xxhash64(s, h + F.lit(seed)))))


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       shingle_k: int = 5, num_hashes: int = 64,
                       seed: int = 42) -> DataFrame:
    """Corpus-scale MinHash: explode distinct shingles to one row each,
    hash per family, aggregate per-document minimums into the signature
    array — one shuffle on the doc id, each shingle hashed exactly
    ``num_hashes`` times, whole-stage codegen throughout. This is the shape
    that survives 100 TB (the pure-Column variant re-expands the shingle
    array per family)."""
    exploded = df.select(
        F.col(id_col),
        F.explode(char_shingles(text_col, shingle_k)).alias("__shingle"))
    # Hash the variable-length shingle STRING once; derive the per-family
    # values by re-hashing the resulting fixed-width long (a specialized
    # ~2ns hashLong vs a UTF8 traversal per family — ~2× on the signature
    # stage, which dominates the whole pipeline). The (a·x+b) universal
    # family would be cheaper still but long-multiply overflow throws
    # under ANSI mode (on by default in Spark 4).
    hashed = exploded.select(
        F.col(id_col),
        F.xxhash64(F.col("__shingle"), F.lit(seed)).alias("__h0"))
    mins = [F.min(F.xxhash64(F.col("__h0"), F.lit(h))).alias(f"__m{h}")
            for h in range(num_hashes)]
    agg = hashed.groupBy(id_col).agg(*mins)
    return agg.select(F.col(id_col),
                      F.array(*[F.col(f"__m{h}") for h in range(num_hashes)])
                       .alias("sig"))


def minhash_lsh_candidates(df: DataFrame, id_col: str, sig_col: str,
                           bands: int = 16, rows_per_band: int = 4) -> DataFrame:
    """LSH banding: split each signature into ``bands`` bands of
    ``rows_per_band`` values, hash each band, and self-join on
    (band_index, band_hash) to emit candidate pairs (id_a < id_b).

    The shuffle key is the band hash — uniformly distributed, so the
    self-join co-partitions cleanly at any corpus size; only documents
    sharing a band collide, keeping the join output near-linear for
    non-pathological corpora.
    """
    sig_len = bands * rows_per_band
    # fail loudly if the signature is narrower than bands*rows_per_band —
    # F.slice would silently yield short band arrays whose hashes collide
    # across all docs (near-all-pairs candidate explosion)
    guard = F.when(F.size(F.col(sig_col)) < sig_len,
                   F.raise_error(F.concat(
                       F.lit(f"minhash_lsh_candidates: signature shorter than "
                             f"bands*rows_per_band={sig_len}: "),
                       F.size(F.col(sig_col)).cast("string")))
                   ).otherwise(F.col(sig_col))
    banded = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.slice(guard, b * rows_per_band + 1, rows_per_band),
                    b))).alias("band", "band_hash"))
    left = banded.alias("l")
    right = banded.alias("r")
    return (left.join(right,
                      (F.col("l.band") == F.col("r.band"))
                      & (F.col("l.band_hash") == F.col("r.band_hash"))
                      & (F.col("l.doc") < F.col("r.doc")))
            .select(F.col("l.doc").alias("id_a"), F.col("r.doc").alias("id_b"))
            .distinct())


def minhash_dedup(df: DataFrame, id_col: str, text_col: str,
                  shingle_k: int = 5, num_hashes: int = 64,
                  bands: int = 16, rows_per_band: int = 4,
                  threshold: float = 0.8, seed: int = 42) -> DataFrame:
    """Full MinHash near-dup pipeline: shingle → signature → LSH candidates →
    signature-similarity filter. Returns pairs (id_a, id_b, est_jaccard ≥
    threshold). Estimated Jaccard = fraction of matching signature slots.
    """
    sigs = minhash_signatures(df, id_col, text_col, shingle_k, num_hashes, seed)
    # Reused by candidates + both re-rank joins; lazy localCheckpoint, not
    # persist — a persisted returned-lazy-plan is never unpersisted by
    # callers and would pin cache-manager storage per invocation (the
    # ADVICE r4 leak class), while a checkpointed RDD is GC-released.
    # Trade-off: localCheckpoint truncates lineage into UNREPLICATED
    # executor-local blocks, so losing an executor mid-job fails the job
    # (no recompute path). Fine on a stable cluster / local mode; on
    # spot/preemptible fleets prefer reliable checkpointing or
    # persist-with-unpersist at a scope that owns the terminal action.
    sigs = sigs.localCheckpoint(eager=False)
    cand = minhash_lsh_candidates(sigs, id_col, "sig", bands, rows_per_band)
    a = sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    b = sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    # estimated Jaccard = fraction of matching signature slots
    matches = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                              lambda v: v))
    return (cand.join(a, "id_a").join(b, "id_b")
            .select("id_a", "id_b",
                    (matches / F.lit(num_hashes)).alias("est_jaccard"))
            .where(F.col("est_jaccard") >= threshold))


# --------------------------------------------------------------- SimHash

def simhash64(tokens: Column, num_bits: int = 64) -> Column:
    """64-bit SimHash of a token array, as a bigint.

    For each bit position, sum ±1 weighted by each token's xxhash64 bit;
    bit set iff the sum is positive. One JVM-side ``aggregate`` pass over the
    token array accumulates all 64 signed bit-counts at once (``zip_with``
    against the per-token bit vector), then a Python-level fold assembles the
    signature — bit positions are Python int literals because
    ``F.shiftright``'s ``numBits`` only accepts ints, not Columns.
    """
    bits = list(range(num_bits))
    zeros = F.array(*[F.lit(0).cast("long") for _ in bits])

    def token_bits(h: Column) -> Column:
        return F.array(*[
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1))
             .otherwise(F.lit(-1)).cast("long")
            for b in bits])

    counts = F.aggregate(
        F.transform(tokens, lambda t: F.xxhash64(t)),
        zeros,
        lambda acc, h: F.zip_with(acc, token_bits(h), lambda a, x: a + x))

    sig = F.lit(0).cast("long")
    for b in bits:
        # bit 63 of a signed long is the sign bit: 1<<63 overflows, use min-long
        weight = -(1 << 63) if b == 63 else (1 << b)
        sig = sig + F.when(F.element_at(counts, b + 1) > 0,
                           F.lit(weight).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus-scale SimHash: explode tokens, hash each once, aggregate the
    64 signed bit-counts as plain SUM aggregates, fold into the signature.
    One shuffle on the doc id, straight-line codegen — the per-row
    array-aggregate variant (:func:`simhash64`) evaluates a 64-wide
    zip_with per token inside one giant expression."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    exploded = (df.select(F.col(id_col).alias("doc"),
                          F.explode(toks).alias("__t"))
                .select("doc", F.xxhash64("__t").alias("__h")))
    sums = [F.sum(F.when(F.shiftright(F.col("__h"), b).bitwiseAND(F.lit(1)) == 1,
                         F.lit(1)).otherwise(F.lit(-1))).alias(f"__b{b}")
            for b in range(64)]
    agg = exploded.groupBy("doc").agg(*sums)
    sig = F.lit(0).cast("long")
    for b in range(64):
        weight = -(1 << 63) if b == 63 else (1 << b)
        sig = sig + F.when(F.col(f"__b{b}") > 0,
                           F.lit(weight).cast("long")).otherwise(F.lit(0).cast("long"))
    return agg.select("doc", sig.alias("sig"))


def hamming64(a: Column | str, b: Column | str) -> Column:
    """Hamming distance between two 64-bit signatures (bit_count of XOR)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.bit_count(ca.bitwiseXOR(cb))


def simhash_dedup(df: DataFrame, id_col: str, text_col: str,
                  max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup pairs: signature + banded blocking on 16-bit chunks.

    Two signatures within ``max_hamming`` ≤ 3 of each other must agree on at
    least one of the four 16-bit chunks (pigeonhole) — so the self-join runs
    on (chunk_index, chunk_value) blocks, never all-pairs.
    """
    sigs = simhash_signatures(df, id_col, text_col)
    chunked = sigs.select(
        "doc", "sig",
        F.posexplode(F.array(*[
            F.shiftright(F.col("sig"), i * 16).bitwiseAND(F.lit(0xFFFF))
            for i in range(4)  # Python ints — shiftright numBits must be int
        ])).alias("chunk", "chunk_val"))
    l, r = chunked.alias("l"), chunked.alias("r")
    pairs = (l.join(r, (F.col("l.chunk") == F.col("r.chunk"))
                    & (F.col("l.chunk_val") == F.col("r.chunk_val"))
                    & (F.col("l.doc") < F.col("r.doc")))
             .select(F.col("l.doc").alias("id_a"), F.col("r.doc").alias("id_b"),
                     hamming64(F.col("l.sig"), F.col("r.sig")).alias("hamming"))
             .distinct())
    return pairs.where(F.col("hamming") <= max_hamming)


# --------------------------------------------------------------- embedding cosine

def embedding_cosine_pairs(df: DataFrame, id_col: str, vec_col: str,
                           threshold: float = 0.95) -> DataFrame:
    """Embedding-based near-duplicate pairs: (id_a, id_b, cosine_sim) for
    all pairs with cosine ≥ threshold.

    This is the EXACT all-pairs baseline (O(N²) — oracle-checkable and fine
    up to ~10⁵ vectors); at corpus scale generate candidates with
    ``similarity.lsh_ann_topk``'s banding and re-rank only bucket-mates.
    """
    from walmart_project_etl_spark.operators.similarity import _as_double, cosine

    v = df.select(F.col(id_col), _as_double(vec_col).alias("__v"))
    a = v.select(F.col(id_col).alias("id_a"), F.col("__v").alias("__va"))
    b = v.select(F.col(id_col).alias("id_b"), F.col("__v").alias("__vb"))
    pairs = (a.join(b, F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b",
                     F.round(cosine(F.col("__va"), F.col("__vb")), 6)
                      .alias("cosine_sim")))
    return pairs.where(F.col("cosine_sim") >= threshold)


def embedding_lsh_candidates(df: DataFrame, id_col: str, vec_col: str,
                             dim: int = 64, n_planes: int = 64,
                             n_bands: int = 8, probe_bits: int = 1,
                             seed: int = 42) -> DataFrame:
    """Candidate pairs for :func:`embedding_lsh_pairs` (pre-rerank).

    Self-join on per-band LSH codes: ``n_bands`` rows per vector keyed by
    (band, code) over 2^(n_planes/n_bands) buckets per band — 256 at the
    64/8 default, so a random (non-dup) pair collides in a band with
    probability ~2^-bpb and the candidate set stays near-linear in corpus
    size instead of all-pairs. Multi-probe (left side only) additionally
    joins codes within Hamming distance ``probe_bits``, trading a constant
    factor (1 + bpb per band at 1 bit) for recall on lower-similarity
    pairs. Exposed separately so tests can pin candidate-count scaling.
    """
    from walmart_project_etl_spark.operators.similarity import (
        _as_double, _probe_codes, rh_band_codes)

    assert n_planes % n_bands == 0
    bits_per_band = n_planes // n_bands
    v = df.select(F.col(id_col).alias("doc"), _as_double(vec_col).alias("__v"))
    codes = rh_band_codes(F.col("__v"), dim, n_planes, n_bands, seed)
    banded = (v.select("doc", "__v", codes.alias("__codes"))
              .select("doc", "__v",
                      F.posexplode(F.col("__codes")).alias("band", "code")))
    probed = banded.select(
        "doc", "__v", "band",
        F.explode(_probe_codes(F.col("code"), bits_per_band, probe_bits))
         .alias("code"))
    l, r = probed.alias("l"), banded.alias("r")
    return (l.join(r, (F.col("l.band") == F.col("r.band"))
                   & (F.col("l.code") == F.col("r.code"))
                   & (F.col("l.doc") < F.col("r.doc")))
            .select(F.col("l.doc").alias("id_a"), F.col("r.doc").alias("id_b"),
                    F.col("l.__v").alias("__va"), F.col("r.__v").alias("__vb"))
            .dropDuplicates(["id_a", "id_b"]))


def embedding_lsh_pairs(df: DataFrame, id_col: str, vec_col: str,
                        threshold: float = 0.3, dim: int = 64,
                        n_planes: int | None = None, n_bands: int = 8,
                        probe_bits: int = 1, seed: int = 42) -> DataFrame:
    """Embedding near-dup pairs via random-hyperplane LSH banding — the
    100 TB scale path for :func:`embedding_cosine_pairs`.

    Candidates come from :func:`embedding_lsh_candidates` (band-code
    self-join — near-linear, never all-pairs) and are re-ranked by EXACT
    cosine, so precision is 1.0 (every emitted pair is a true pair
    ≥ threshold); recall < 1 by design. By default the band width is
    derived FROM ``threshold`` (``lsh_params_for_threshold``: widest band
    whose analytic recall at the threshold is ≥ 0.95 — narrow 2-bit bands
    at 0.3, wide 7-bit bands at 0.9), so callers at any threshold keep
    ≥ ~0.95 recall and low-threshold calls pay their candidate cost
    visibly rather than silently losing pairs to a wide-band default.
    Scale callers should pass ``similarity.lsh_params_for(N)`` output
    explicitly (candidate linearity beats the last few recall points at
    100 TB) — tests pin both operating points.
    """
    from walmart_project_etl_spark.operators.similarity import (
        cosine, lsh_params_for_threshold)

    if n_planes is None:
        n_planes, n_bands = lsh_params_for_threshold(threshold, n_bands)
    cand = embedding_lsh_candidates(df, id_col, vec_col, dim=dim,
                                    n_planes=n_planes, n_bands=n_bands,
                                    probe_bits=probe_bits, seed=seed)
    return (cand.select("id_a", "id_b",
                        F.round(cosine(F.col("__va"), F.col("__vb")), 6)
                         .alias("cosine_sim"))
            .where(F.col("cosine_sim") >= threshold))


# --------------------------------------------------------------- n-gram Jaccard

def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        k: int = 3, threshold: float = 0.5,
                        unit: str = "char") -> DataFrame:
    """EXACT n-gram Jaccard pairs ≥ threshold, via prefix filtering
    (Bayardo et al. AllPairs / Xiao et al. PPJoin) instead of the naive
    explode-and-self-join-on-shingle.

    ``unit`` picks the shingle alphabet: ``"char"`` (character k-grams)
    or ``"word"`` (whitespace-token k-grams — what C4/RefinedWeb-style
    corpus dedup uses). Prefix filtering is only as selective as the
    shingle space is diverse: on a low-entropy corpus (tiny vocabulary,
    e.g. templated/synthetic text) character k-grams are shared by nearly
    every document and the candidate set degenerates toward all-pairs no
    matter how the prefix is chosen, while word k-grams keep the space
    ~vocabulary^k and the join linear. Prefer ``unit="word"`` for natural-
    language dedup; ``"char"`` remains for fuzzy short-string matching.

    The naive plan's shuffle key is the shingle, and hot shingles (" the ")
    appear in nearly every document — a quadratic fan-out (82M joined rows
    from 338k shingle occurrences on a 1.5k-doc fixture) that becomes THE
    scale killer at corpus size. Prefix filtering keeps the result exact
    while killing the blowup:

    1. Order all shingles globally RAREST-FIRST (document frequency, then
       shingle — a strict total order).
    2. Index only each document's first ``n − ⌈t·n⌉ + 1`` shingles in that
       order (its *prefix*). Theorem: two sets with Jaccard ≥ t must share
       at least one element lying in BOTH prefixes — so the prefix join
       loses no true pair, and its join keys are by construction the
       RAREST shingles of each doc, so hot-shingle fan-out never happens.
    3. Verify candidates exactly: re-join the two full shingle arrays by
       doc id (linear, uniform key) and compute the true intersection with
       ``array_intersect`` — same jaccard arithmetic as before, so the
       output is bit-identical to the naive plan and the DuckDB oracle.

    Shingles are 64-bit-hashed (xxhash64) immediately after extraction:
    every downstream key and array element is a long, not a string —
    ~3× cheaper frequency agg, prefix join, and per-candidate
    intersection, and a smaller shuffle. Set semantics are preserved
    (distinct strings → distinct hashes) up to 2⁻⁶⁴-probability
    collisions, the same tolerance every hash-keyed operator here
    accepts; output values are hash-independent so the DuckDB oracle
    still matches exactly.

    Every stage is a linear shuffle (shingle-frequency agg, per-doc window,
    candidate join on rare keys, two id-keyed verify joins); nothing is
    all-pairs. For billion-doc corpora prefer ``minhash_dedup``
    (probabilistic) — this operator is the exact variant.
    """
    shingle_fn = {"char": char_shingles, "word": word_ngrams}[unit]
    sh = df.select(F.col(id_col).alias("doc"),
                   F.transform(shingle_fn(text_col, k),
                               lambda x: F.xxhash64(x)).alias("shingles"))
    # The shingle table feeds FOUR consumers (frequency agg, prefix
    # window, and both sides of the verify join); none of them shares an
    # exchange, so without materialization the shingling subtree — the
    # single most expensive map in the pipeline — is recomputed once per
    # consumer (~4× wall on a 6.7k-doc corpus). A lazy localCheckpoint
    # computes it once into executor-local storage and is released when
    # the plan is garbage-collected (unlike DataFrame.persist, which pins
    # an entry in the cache manager that returned-lazy-plan callers never
    # unpersist — the ADVICE r4 leak). Trade-off: the blocks are
    # unreplicated and lineage is gone, so executor loss fails the job;
    # on spot/preemptible fleets use reliable checkpointing instead.
    sized = (sh.select("doc", F.size("shingles").alias("n_sh"), "shingles")
               .localCheckpoint(eager=False))
    exploded = sized.select("doc", "n_sh", F.explode("shingles").alias("shingle"))

    freq = exploded.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    w = Window.partitionBy("doc").orderBy(F.asc("__df"), F.asc("shingle"))
    prefix_len = (F.col("n_sh")
                  - F.ceil(F.lit(float(threshold)) * F.col("n_sh")).cast("int")
                  + F.lit(1))
    prefix = (exploded.join(freq, "shingle")
              .withColumn("__pos", F.row_number().over(w))
              .where(F.col("__pos") <= prefix_len)
              .select("doc", "shingle", "__pos", "n_sh"))
    # PPJoin candidate pruning, both exact (no true pair can be lost):
    # - LENGTH filter: jaccard ≥ t forces t ≤ na/nb ≤ 1/t, checked on the
    #   prefix rows so pruned pairs never materialize;
    # - POSITIONAL filter: a true pair's FIRST common shingle (in the
    #   global rarest-first order) sits in both prefixes at positions
    #   (i, j), and every other common shingle lies after it on both
    #   sides, so overlap ≤ 1 + min(na−i, nb−j); jaccard ≥ t needs
    #   overlap ≥ ⌈t·(na+nb)/(1+t)⌉ — rows violating the bound cannot be
    #   the first match of a qualifying pair. On low-entropy corpora this
    #   cuts the candidate set ~an order of magnitude before the
    #   per-candidate array intersection (the CPU-bound verify stage).
    t_lit = F.lit(float(threshold))
    ln, rn = F.col("l.n_sh"), F.col("r.n_sh")
    min_overlap = F.ceil(t_lit / (1.0 + float(threshold)) * (ln + rn))
    pos_bound = (F.least(ln - F.col("l.__pos"), rn - F.col("r.__pos"))
                 + F.lit(1))
    cand = (prefix.alias("l")
            .join(prefix.alias("r"), (F.col("l.shingle") == F.col("r.shingle"))
                  & (F.col("l.doc") < F.col("r.doc"))
                  & (ln >= F.ceil(t_lit * rn)) & (rn >= F.ceil(t_lit * ln))
                  & (pos_bound >= min_overlap))
            .select(F.col("l.doc").alias("id_a"), F.col("r.doc").alias("id_b"))
            .distinct())
    # The verify stage is CPU-bound (an array intersection per candidate)
    # on byte-light rows, so AQE's size-based coalescing would starve it —
    # spread candidates over every core explicitly.
    cand = cand.repartition(df.sparkSession.sparkContext.defaultParallelism)

    a = sized.select(F.col("doc").alias("id_a"), F.col("n_sh").alias("na"),
                     F.col("shingles").alias("__sa"))
    b = sized.select(F.col("doc").alias("id_b"), F.col("n_sh").alias("nb"),
                     F.col("shingles").alias("__sb"))
    # Size filter (Jaccard ≥ t forces t ≤ na/nb ≤ 1/t) prunes before the
    # per-row intersection — free in the fixture's uniform-length corpus,
    # a large cut on real length-skewed ones.
    verified = (cand.join(a, "id_a").join(b, "id_b")
                .where((F.col("na") >= F.ceil(F.lit(float(threshold))
                                              * F.col("nb")))
                       & (F.col("nb") >= F.ceil(F.lit(float(threshold))
                                                * F.col("na"))))
                .withColumn("inter", F.size(F.array_intersect("__sa", "__sb"))))
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (verified.select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
            .where(F.col("jaccard") >= threshold))


# --------------------------------------------------------------- record linkage

def fuzzy_blocked_pairs(df: DataFrame, id_col: str, name_col: str,
                        block_len: int = 16, max_edit: int = 2) -> DataFrame:
    """Record-linkage near-duplicate pairs: entities whose normalized names
    are within ``max_edit`` Levenshtein distance, compared ONLY inside
    blocking buckets (shared normalized prefix of ``block_len`` chars).

    The blocking self-join is the standard linkage shape at scale: the
    shuffle key is the block, comparisons are block-local (never all-pairs),
    and edit distance — O(len²) per pair — runs on the small candidate set.
    Prefix blocking misses prefix-divergent duplicates by design; swap the
    block expression for soundex/key-collapse blocking without touching the
    join. Returns (id_a, id_b, edit_distance), id_a < id_b.
    """
    norm = F.lower(F.trim(F.col(name_col)))
    b = df.select(F.col(id_col).alias("doc"), norm.alias("__n"),
                  F.substring(norm, 1, block_len).alias("__blk"))
    l, r = b.alias("l"), b.alias("r")
    return (l.join(r, (F.col("l.__blk") == F.col("r.__blk"))
                   & (F.col("l.doc") < F.col("r.doc")))
            .select(F.col("l.doc").alias("id_a"),
                    F.col("r.doc").alias("id_b"),
                    F.levenshtein(F.col("l.__n"), F.col("r.__n"))
                     .cast("long").alias("edit_distance"))
            .where(F.col("edit_distance") <= max_edit))


# --------------------------------------------------------------- decontamination

def decontaminate(corpus: DataFrame, benchmark: DataFrame, id_col: str,
                  text_col: str, n: int = 8) -> DataFrame:
    """Remove training documents that overlap an evaluation benchmark.

    A corpus document is *contaminated* if any of its word ``n``-grams
    appears in any benchmark document (the standard n-gram–overlap
    decontamination rule; n≈8–13 words). Returns the clean corpus rows.

    Scale shape: benchmark sets are tiny (thousands of eval questions), so
    the distinct benchmark gram set is explicitly ``broadcast`` — the
    corpus side is ONE scan with a broadcast left-anti probe per exploded
    gram, then a semi-join collapse back to doc granularity. Corpus-side
    shuffle: only the ``distinct`` on contaminated doc ids (bounded by the
    contamination count, not the corpus).
    """
    bench_grams = (benchmark
                   .select(F.explode(word_ngrams(text_col, n)).alias("__g"))
                   .distinct())
    corpus_grams = corpus.select(F.col(id_col),
                                 F.explode(word_ngrams(text_col, n)).alias("__g"))
    contaminated = (corpus_grams
                    .join(F.broadcast(bench_grams), "__g", "left_semi")
                    .select(id_col).distinct())
    return corpus.join(contaminated, id_col, "left_anti")


def contamination_scores(corpus: DataFrame, benchmark: DataFrame,
                         id_col: str, text_col: str, n: int = 8) -> DataFrame:
    """Graded contamination: per document, the fraction of its DISTINCT
    word ``n``-grams that appear anywhere in the benchmark.

    :func:`decontaminate` is binary (one shared gram → drop); real
    curation wants the graded signal — a 2% overlap is boilerplate, an
    80% overlap is a leaked eval question — so the threshold becomes a
    policy decision on this score, not a property of the operator.

    Same scale shape as decontaminate: the tiny distinct benchmark gram
    set is broadcast, the corpus is ONE exploded scan, and both the hit
    count and the total collapse in a single groupBy on the doc id (the
    semi-join flag rides the exploded rows — no second corpus scan).
    Returns ``(id, n_grams, n_contaminated, contamination_frac)``.
    """
    bench_grams = (benchmark
                   .select(F.explode(word_ngrams(text_col, n)).alias("__g"))
                   .distinct())
    corpus_grams = corpus.select(F.col(id_col),
                                 F.explode(word_ngrams(text_col, n))
                                 .alias("__g"))
    flagged = (corpus_grams
               .join(F.broadcast(bench_grams.withColumn("__hit", F.lit(1))),
                     "__g", "left"))
    return (flagged.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_grams"),
                 F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
                  .alias("n_contaminated"))
            .withColumn("contamination_frac",
                        F.col("n_contaminated") / F.col("n_grams")))


# --------------------------------------------------------------- line-level dedup

def dedup_lines(df: DataFrame, id_col: str, text_col: str,
                delim: str = "\n", min_count: int = 2,
                keep_first: bool = False) -> DataFrame:
    """Corpus-wide line-level dedup (CCNet/RefinedWeb boilerplate removal):
    drop every line whose exact content appears in ``min_count`` or more
    documents — cookie banners, nav bars, "subscribe" footers — and
    reassemble each document from its surviving lines in original order.

    ``keep_first=True`` instead keeps the single earliest occurrence
    (lowest doc id, then line index) of each duplicated line — the exact
    CCNet rule — rather than dropping all copies.

    Scale shape (one linear pipeline, no all-pairs anything):

    1. ``posexplode`` the split text → one row per (doc, line_idx, line).
    2. Line-frequency ``groupBy`` on the md5 of the line — a uniform
       128-bit shuffle key, so the classic skew trap (the empty line
       appearing in every document) never concentrates rows: the AGGREGATE
       is what collapses hot lines, after map-side partial aggregation.
    3. Join the per-line doc-frequency (and, for ``keep_first``, the
       corpus-wide first occurrence) back onto the exploded rows by
       digest, filter, and ``collect_list(sort_array(struct(idx, line)))``
       per doc to reassemble.

    Returns ``(id_col, text_clean, n_lines, n_dropped)``; documents whose
    every line was dropped keep an empty string.
    """
    c = F.col
    # F.split takes a Java REGEX; ``delim`` is a literal separator here
    # (reassembly uses array_join, which is literal) — quote it so '|',
    # '.', '\t'-like delimiters split on the right boundaries. \Q..\E is
    # java.util.regex.Pattern.quote's scheme, incl. the embedded-\E fixup.
    delim_re = "\\Q" + delim.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    lines = (df.select(c(id_col), F.posexplode(F.split(c(text_col), delim_re))
                       .alias("__idx", "__line"))
               .withColumn("__d", F.md5(c("__line"))))
    freq = (lines.groupBy("__d")
            .agg(F.count_distinct(c(id_col)).alias("__docs"),
                 F.min(F.struct(c(id_col).alias("__fid"),
                                c("__idx").alias("__fidx"))).alias("__first")))
    joined = lines.join(freq, "__d")
    if keep_first:
        survives = (c("__docs") < min_count) | (
            (c(id_col) == c("__first.__fid")) & (c("__idx") == c("__first.__fidx")))
    else:
        survives = c("__docs") < min_count
    flagged = joined.select(c(id_col), "__idx", "__line",
                            survives.alias("__keep"))
    return (flagged.groupBy(id_col)
            .agg(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.when(c("__keep"),
                                    F.struct(c("__idx"), c("__line"))))),
                         lambda s: s["__line"]),
                     delim).alias("text_clean"),
                 F.count(F.lit(1)).alias("n_lines"),
                 F.sum(F.when(~c("__keep"), 1).otherwise(0)).alias("n_dropped")))


def decontaminate_semantic(corpus: DataFrame, benchmark: DataFrame,
                           id_col: str, vec_col: str,
                           threshold: float = 0.85, dim: int = 64,
                           n_planes: int | None = None, n_bands: int = 8,
                           probe_bits: int = 1, seed: int = 42) -> DataFrame:
    """SemDeDup-style SEMANTIC decontamination: drop corpus documents
    whose embedding is cosine-≥-threshold to ANY benchmark embedding —
    catches the paraphrased/reformatted eval leakage that n-gram
    :func:`decontaminate` cannot see.

    Scale shape mirrors ``lsh_ann_topk`` but cross-table: both sides get
    per-band hyperplane codes; multi-probe bit flips go on the BENCHMARK
    side only (eval sets are thousands of rows — probing there is free;
    probing the 100 TB corpus side would multiply its index). Candidates
    come from the (band, code) equi-join, are verified by exact cosine,
    and collapse to a distinct contaminated-id set (bounded by the
    contamination count) that anti-joins the corpus — one corpus scan,
    no all-pairs, recall < 1 by LSH design (threshold-derived band width
    keeps analytic recall ≥ 0.95; see ``lsh_params_for_threshold``).
    """
    from walmart_project_etl_spark.operators.similarity import (
        _as_double, _probe_codes, cosine, lsh_params_for_threshold,
        rh_band_codes)

    if n_planes is None:
        n_planes, n_bands = lsh_params_for_threshold(threshold, n_bands)
    bpb = n_planes // n_bands

    def banded(df: DataFrame, out_id: str | None, probes: int,
               vec_alias: str) -> DataFrame:
        v = _as_double(vec_col)
        codes = rh_band_codes(v, dim, n_planes, n_bands, seed)
        ids = [F.col(id_col).alias(out_id)] if out_id else []
        out = (df.select(*ids, v.alias(vec_alias), codes.alias("__codes"))
               .select(*([out_id] if out_id else []), vec_alias,
                       F.posexplode("__codes").alias("band", "code")))
        if probes:
            out = out.select(*([out_id] if out_id else []), vec_alias, "band",
                             F.explode(_probe_codes(F.col("code"), bpb,
                                                    probes)).alias("code"))
        return out

    cb = banded(corpus, "__cid", probes=0, vec_alias="__vec")
    bb = banded(benchmark, None, probes=probe_bits, vec_alias="__bvec")
    contaminated = (cb.join(bb, ["band", "code"])
                    .where(F.round(cosine(F.col("__vec"), F.col("__bvec")), 6)
                           >= threshold)
                    .select(F.col("__cid").alias(id_col))
                    .distinct())
    return corpus.join(contaminated, id_col, "left_anti")


def ngram_containment_pairs(df: DataFrame, id_col: str, text_col: str,
                            k: int = 3, threshold: float = 0.9,
                            unit: str = "word") -> DataFrame:
    """EXACT n-gram CONTAINMENT pairs: |A∩B| / min(|A|,|B|) ≥ threshold.

    Containment is the subset/quote detector Jaccard cannot be: a
    document that fully embeds another inside twice as much new text has
    containment ~1.0 but Jaccard ~0.5 — the shape of boilerplate-wrapped
    reposts and doc-in-doc quotation, which a Jaccard threshold high
    enough to be precise always misses.

    Prefix filtering adapts (AllPairs theorem with α = ⌈t·min(na,nb)⌉):
    only the SMALLER side of a qualifying pair is guaranteed a prefix
    hit, so the candidate join is prefix × FULL index (whichever side is
    smaller contributes its prefix; pair normalization by (least,
    greatest) + distinct covers both orientations). The full side makes
    hot shingles more visible than in the Jaccard join — still bounded
    by Σ df_prefix(s)·df_full(s), fine for discriminative (word) shingle
    units; avoid ``unit="char"`` on low-entropy corpora. Verification is
    the exact array intersection, so output values are engine-exact.
    """
    shingle_fn = {"char": char_shingles, "word": word_ngrams}[unit]
    sh = df.select(F.col(id_col).alias("doc"),
                   F.transform(shingle_fn(text_col, k),
                               lambda x: F.xxhash64(x)).alias("shingles"))
    sized = (sh.select("doc", F.size("shingles").alias("n_sh"), "shingles")
               .localCheckpoint(eager=False))  # see ngram_jaccard_pairs
    exploded = sized.select("doc", "n_sh",
                            F.explode("shingles").alias("shingle"))

    freq = exploded.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    w = Window.partitionBy("doc").orderBy(F.asc("__df"), F.asc("shingle"))
    # α ≥ ⌈t·n_self⌉ when self is the smaller side → own-size prefix
    prefix_len = (F.col("n_sh")
                  - F.ceil(F.lit(float(threshold)) * F.col("n_sh")).cast("int")
                  + F.lit(1))
    prefix = (exploded.join(freq, "shingle")
              .withColumn("__pos", F.row_number().over(w))
              .where(F.col("__pos") <= prefix_len)
              .select("doc", "shingle"))
    cand = (prefix.alias("l")
            .join(exploded.alias("r"),
                  (F.col("l.shingle") == F.col("r.shingle"))
                  & (F.col("l.doc") != F.col("r.doc")))
            .select(F.least("l.doc", "r.doc").alias("id_a"),
                    F.greatest("l.doc", "r.doc").alias("id_b"))
            .distinct())
    cand = cand.repartition(df.sparkSession.sparkContext.defaultParallelism)

    a = sized.select(F.col("doc").alias("id_a"), F.col("n_sh").alias("na"),
                     F.col("shingles").alias("__sa"))
    b = sized.select(F.col("doc").alias("id_b"), F.col("n_sh").alias("nb"),
                     F.col("shingles").alias("__sb"))
    verified = (cand.join(a, "id_a").join(b, "id_b")
                .withColumn("inter",
                            F.size(F.array_intersect("__sa", "__sb"))))
    containment = F.col("inter") / F.least("na", "nb")
    return (verified.select("id_a", "id_b",
                            F.round(containment, 6).alias("containment"))
            .where(F.col("containment") >= threshold))


def cross_doc_dup_window_score(df: DataFrame, id_col: str, text_col: str,
                               n: int = 16) -> DataFrame:
    """Cross-document duplicated-WINDOW scoring — the corpus-level
    signal behind substring-granular dedup (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", ACL 2022: exact
    duplication lives at the ~50-token-span level, not whole documents):
    per document, the fraction of its token ``n``-gram windows whose
    content occurs MORE THAN ONCE anywhere in the corpus. High scores
    flag boilerplate-heavy or partially-copied documents that whole-doc
    exact dedup misses.

    Shape: rolling windows come from one ``sequence`` + ``slice`` +
    ``md5`` transform per doc (pure Columns, O(tokens) rows after
    explode), then TWO uniform-key shuffles: a global window-hash count
    and the per-doc rollup — never all-pairs, never skewed (md5 keys).
    Documents shorter than ``n`` tokens score 0 over 0 windows. Exact
    and engine-portable: md5 of the space-joined window reproduces in
    any SQL engine.
    """
    tk = F.split(F.regexp_replace(F.col(text_col), r"^\s+|\s+$", ""),
                 r"\s+")
    base = df.select(F.col(id_col), tk.alias("__tk"))
    wins = (base.where(F.size("__tk") >= n)
            .select(id_col,
                    F.explode(F.transform(
                        F.sequence(F.lit(1), F.size("__tk") - (n - 1)),
                        lambda i: F.md5(F.concat_ws(
                            " ", F.slice("__tk", i, n))))).alias("__h")))
    counts = wins.groupBy("__h").agg(F.count(F.lit(1)).alias("__c"))
    per_doc = (wins.join(counts, "__h")
               .groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("n_windows"),
                    F.sum((F.col("__c") > 1).cast("long"))
                     .alias("n_dup_windows")))
    out = (df.select(id_col).join(per_doc, id_col, "left")
           .select(id_col,
                   F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
                   F.coalesce("n_dup_windows", F.lit(0))
                    .alias("n_dup_windows")))
    # decimal-routed rounding so the fraction is bit-identical on any
    # engine (same recipe as queries/util.round2)
    frac = (F.col("n_dup_windows") / F.col("n_windows")) \
        .cast("decimal(28,8)")
    score = F.when(F.col("n_windows") > 0,
                   F.round(frac, 6).cast("double")) \
             .otherwise(F.lit(0.0))
    return out.withColumn("dup_score", score)


def semdedup(df: DataFrame, id_col: str, vec_col: str, cluster_col: str,
             threshold: float = 0.3) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster-based SEMANTIC dedup of a
    corpus against ITSELF — cluster the embeddings, compare pairs only
    WITHIN a cluster, and inside every near-duplicate neighborhood keep
    the item with the LOWEST cosine to its cluster centroid (the
    paper's rule: the least-prototypical copy carries the most extra
    information). Returns (id, cluster, centroid_sim, kept).

    Clustering is one Lloyd refinement seeded by ``cluster_col``:
    decimal-exact centroids per seed group (:func:`similarity.
    embedding_centroids`), then every vector re-assigned to its
    argmax-cosine centroid (ties → smaller cluster id). Any assignment
    plugs in — more Lloyd rounds at scale are this same broadcast-join
    shape repeated — and the single deterministic round keeps the whole
    operator exactly reproducible on any engine (rounded-double
    centroids, round-6 cosines), so the driver oracle recomputes it in
    SQL rather than pinning.

    Scale shape: centroid build is one posexplode + (cluster, dim)
    aggregation; assignment is corpus × broadcast(k centroids) — one
    map-side pass, no shuffle beyond the rn=1 window on the id; the
    pair join is cluster-blocked (never all-pairs — k-means blocking is
    what makes SemDeDup tractable at 100 TB) and each unordered pair is
    scored ONCE, with exactly one side dominated per edge. A doc is
    dropped iff ANY ≥-threshold neighbor has a (lower, then smaller-id)
    centroid-sim — neighborhood-local minima survive, which is
    engine-order-independent (no iterative tie-breaking).
    """
    av = _semdedup_assign(df, id_col, vec_col, cluster_col)
    a = av.select(F.col(id_col).alias("__ida"),
                  F.col("cluster").alias("__cla"),
                  F.col("centroid_sim").alias("__csa"),
                  F.col("__v").alias("__va"))
    b = av.select(F.col(id_col).alias("__idb"),
                  F.col("cluster").alias("__clb"),
                  F.col("centroid_sim").alias("__csb"),
                  F.col("__v").alias("__vb"))
    # Explicit cluster-keyed partitioning for the pair join: on a small
    # corpus AQE coalesces the tiny shuffle to ONE partition and the
    # O(Σ cluster²) pair scoring runs single-core; an explicit
    # numPartitions is never coalesced, and the join reuses it (same
    # hash partitioning) instead of adding an exchange. Result is
    # partitioning-independent (per-pair arithmetic only).
    n_p = av.sparkSession.sparkContext.defaultParallelism
    a = a.repartition(n_p, F.col("__cla"))
    b = b.repartition(n_p, F.col("__clb"))
    pairs = a.join(b, (F.col("__cla") == F.col("__clb"))
                   & (F.col("__ida") < F.col("__idb")))
    return _semdedup_resolve(av, pairs, id_col, threshold)


def _semdedup_assign(df: DataFrame, id_col: str, vec_col: str,
                     cluster_col: str) -> DataFrame:
    """Shared SemDeDup clustering step: (id, cluster, centroid_sim,
    __v) after one deterministic Lloyd refinement seeded by
    ``cluster_col`` (decimal-exact centroids, round-6 cosines,
    argmax ties to the smaller cluster id)."""
    from walmart_project_etl_spark.operators.similarity import (
        _as_double, cosine, embedding_centroids)

    v = df.select(F.col(id_col), _as_double(vec_col).alias("__v"))
    # parallelism floor for the N×k scoring scan (see semdedup pair join)
    n_p = v.sparkSession.sparkContext.defaultParallelism
    if v.rdd.getNumPartitions() < n_p:
        v = v.repartition(n_p, F.col(id_col))
    cent = embedding_centroids(df, cluster_col, vec_col)
    carr = (cent.groupBy(cluster_col)
            .agg(F.transform(
                F.array_sort(F.collect_list(
                    F.struct("dim_idx", "centroid"))),
                lambda s: s["centroid"]).alias("__c"))
            .select(F.col(cluster_col).alias("cluster"), "__c"))
    scored = (v.crossJoin(F.broadcast(carr))
              .select(id_col, "cluster",
                      F.round(cosine(F.col("__v"), F.col("__c")), 6)
                       .alias("centroid_sim")))
    w = Window.partitionBy(id_col).orderBy(F.col("centroid_sim").desc(),
                                           F.col("cluster").asc())
    assign = (scored.withColumn("__rn", F.row_number().over(w))
              .where(F.col("__rn") == 1).drop("__rn"))
    # the assignment frame feeds BOTH pair-join sides and the final
    # resolve — checkpoint it so the centroid build + UDF codes + window
    # run once, not three times (see ngram_jaccard_pairs rationale)
    return assign.join(v, id_col).localCheckpoint(eager=False)


def _semdedup_resolve(av: DataFrame, pairs: DataFrame, id_col: str,
                      threshold: float) -> DataFrame:
    """Shared SemDeDup keep-rule: verify candidate pairs by exact
    cosine ≥ threshold, drop the (higher centroid_sim, then higher id)
    side of every surviving edge, return (id, cluster, centroid_sim,
    kept)."""
    from walmart_project_etl_spark.operators.similarity import cosine

    pairs = pairs.where(
        F.round(cosine(F.col("__va"), F.col("__vb")), 6) >= threshold)
    dominated = F.when(
        (F.col("__csa") < F.col("__csb"))
        | ((F.col("__csa") == F.col("__csb"))
           & (F.col("__ida") < F.col("__idb"))),
        F.col("__idb")).otherwise(F.col("__ida"))
    dropped = pairs.select(dominated.alias(id_col)).distinct() \
                   .withColumn("__dropped", F.lit(True))
    return (av.join(dropped, id_col, "left")
            .select(id_col, "cluster", "centroid_sim",
                    F.coalesce(~F.col("__dropped"), F.lit(True))
                     .alias("kept")))


def semdedup_kmeans(df: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    threshold: float = 0.3, k: int | None = None,
                    target_cluster_size: int | None = None,
                    iters: int = 2) -> DataFrame:
    """SemDeDup's full pipeline with the paper's SCALE RULE built in:
    k-means the corpus, then dedup within clusters — where k is either
    given explicitly or derived as ``ceil(N / target_cluster_size)``
    (:func:`similarity.kmeans_k_for`), the bounded-cluster-size answer
    that keeps the within-cluster pair join O(N × target) in
    expectation instead of O(N²/k) at a fixed k. The corpus count that
    sizes k is one metadata-cheap aggregate; the k-means assignment
    switches to its broadcast-join path automatically past
    ``KMEANS_LITERAL_K_MAX``, so the PLAN stays O(1)-sized as k grows
    with N. Output matches :func:`semdedup`:
    (id, cluster, centroid_sim, kept).

    Scale honesty (measured 38.6× wall at 10× data, docs/SCALE.md r13):
    the pair join is linear, but exact brute-force assignment is
    O(N × k) = O(N²/target) when k ∝ N — the assignment, not the pair
    join, is the quadratic term. This twin is the ORACLE-CHECKABLE
    baseline; at corpus scale ship :func:`semdedup_lsh` (1.3× at 10×)
    or feed :func:`semdedup` clusters from an IVF-style hierarchical
    assignment (``similarity.ivf_*`` — score only a coarse cell's
    centroids), both of which trade exact SQL replay for linearity.

    Exactly reproducible end-to-end (deterministic k-means seeds +
    round-6 arithmetic), so at a known N the whole chain carries an
    exact SQL oracle with the derived k baked in."""
    from walmart_project_etl_spark.operators.similarity import (
        kmeans_k_for, kmeans_labels)

    if k is None:
        if target_cluster_size is None:
            raise ValueError("pass k or target_cluster_size")
        k = kmeans_k_for(df.count(), target_cluster_size)
    labels = kmeans_labels(df, id_col, vec_col, k=k, iters=iters) \
        .select(id_col, F.col("cluster").alias("__km"))
    return semdedup(df.join(labels, id_col), id_col, vec_col, "__km",
                    threshold)


def semdedup_lsh(df: DataFrame, id_col: str, vec_col: str,
                 cluster_col: str, threshold: float = 0.3,
                 dim: int = 64, n_planes: int | None = None,
                 n_bands: int = 8, seed: int = 42) -> DataFrame:
    """The SCALE twin of :func:`semdedup`: same clustering and same
    keep-the-least-prototypical rule, but candidate pairs come from a
    (cluster, band, code) hyperplane-LSH equi-join instead of the exact
    all-pairs-within-cluster join, then verify by exact cosine.

    Why it exists: the exact twin is O(Σ cluster²) — at a FIXED cluster
    count, 10× data makes clusters 10× bigger and the pair join 100×
    (measured 39.8× wall at 10× in docs/SCALE.md). The paper's own
    answer is k ∝ N (bounded cluster size); when the cluster layout is
    given (labels, a fixed codebook), banding inside the cluster is the
    near-linear path — candidates stay proportional to corpus size ×
    collision rate, never cluster². Band width follows
    :func:`similarity.lsh_params_for_threshold` (analytic recall ≥ 0.95
    at the threshold); precision is 1.0 (exact re-rank). Same output
    schema; recall < 1 by LSH design, so dedup is slightly
    conservative (a missed candidate keeps BOTH copies — never drops a
    non-duplicate)."""
    from walmart_project_etl_spark.operators.similarity import (
        lsh_params_for_threshold, rh_band_codes)

    if n_planes is None:
        n_planes, n_bands = lsh_params_for_threshold(threshold, n_bands)
    av = _semdedup_assign(df, id_col, vec_col, cluster_col)
    coded = av.withColumn(
        "__codes", rh_band_codes(F.col("__v"), dim, n_planes, n_bands,
                                 seed))
    banded = coded.select(
        id_col, "cluster", "centroid_sim", "__v",
        F.posexplode("__codes").alias("__band", "__code"))
    a = banded.select(F.col(id_col).alias("__ida"),
                      F.col("cluster").alias("__cla"),
                      F.col("centroid_sim").alias("__csa"),
                      F.col("__v").alias("__va"),
                      "__band", "__code")
    b = banded.select(F.col(id_col).alias("__idb"),
                      F.col("cluster").alias("__clb"),
                      F.col("centroid_sim").alias("__csb"),
                      F.col("__v").alias("__vb"),
                      F.col("__band").alias("__bandb"),
                      F.col("__code").alias("__codeb"))
    cands = (a.join(b, (F.col("__cla") == F.col("__clb"))
                    & (F.col("__band") == F.col("__bandb"))
                    & (F.col("__code") == F.col("__codeb"))
                    & (F.col("__ida") < F.col("__idb")))
             .select("__ida", "__idb", "__cla", "__clb",
                     "__csa", "__csb", "__va", "__vb")
             .dropDuplicates(["__ida", "__idb"]))
    return _semdedup_resolve(av, cands, id_col, threshold)


# --------------------------------------------------- exact-substring span dedup

def duplicate_spans(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", width: int = 8,
                    hash_fn: str = "xxhash64") -> DataFrame:
    """Corpus-duplicated token spans per document (ExactSubstr dedup,
    Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better" — the suffix-array pass re-expressed relationally).

    Every window of ``width`` whitespace tokens becomes one shingle row
    (stride 1, so the shingle table is O(total corpus tokens) — the same
    order as the corpus itself, built by a narrow in-row ``transform`` +
    ``explode``, no self-join). A shingle that occurs more than once
    ANYWHERE in the corpus marks token interval [pos, pos+width) in every
    document containing it; overlapping marks merge into maximal spans via
    the gaps-and-islands window (one shuffle on ``id_col``).

    Scale: the duplicate-shingle set is tiny relative to the corpus (dups
    are the exception), so after the one hash-keyed groupBy the semi-join
    back is broadcast-eligible under AQE. ``hash_fn='xxhash64'`` (default)
    groups on a 64-bit key — 8 shuffle bytes/shingle; ``'md5'`` groups on
    the 128-bit md5 hex so a SQL oracle (DuckDB) reproduces bucketing
    bit-for-bit. Collisions merely over-mark a span; at 64 bits the odds
    are ~n²/2⁶⁵.

    Returns (id_col, span_start, span_end) — token positions, 0-based
    inclusive, one row per maximal duplicated span.
    """
    toks = df.select(
        id_col,
        F.filter(F.split(F.col(text_col), r"\s+"),
                 lambda x: x != "").alias("__w"))
    shingle = F.array_join(
        F.slice("__w", F.col("__i") + 1, width), " ")
    key = (F.xxhash64(shingle) if hash_fn == "xxhash64"
           else F.md5(shingle))
    sh = (toks.where(F.size("__w") >= width)
              .select(id_col, "__w",
                      F.explode(F.sequence(
                          F.lit(0), F.size("__w") - width)).alias("__i"))
              .select(id_col, F.col("__i").alias("pos"),
                      key.alias("__h")))
    dup = sh.groupBy("__h").count().where(F.col("count") > 1).select("__h")
    marked = sh.join(dup, "__h", "left_semi").select(
        id_col, F.col("pos").alias("__s"),
        (F.col("pos") + width - 1).alias("__e"))
    w_prev = (Window.partitionBy(id_col).orderBy("__s")
              .rowsBetween(Window.unboundedPreceding, -1))
    w_run = Window.partitionBy(id_col).orderBy("__s")
    islands = (marked
               .withColumn("__pmax", F.max("__e").over(w_prev))
               .withColumn("__brk", F.when(
                   F.col("__s") > F.coalesce("__pmax", F.lit(-1)), 1)
                   .otherwise(0))
               .withColumn("__gid", F.sum("__brk").over(w_run)))
    return (islands.groupBy(id_col, "__gid")
            .agg(F.min("__s").alias("span_start"),
                 F.max("__e").alias("span_end"))
            .drop("__gid"))


def remove_duplicate_spans(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", width: int = 8,
                           hash_fn: str = "xxhash64") -> DataFrame:
    """Cut every corpus-duplicated ``width``-token span out of each
    document (the ExactSubstr removal policy: drop ALL copies of a
    duplicated substring; Lee et al. 2022 §4).

    Tokens covered by a :func:`duplicate_spans` interval are dropped via a
    per-document range join (equi on ``id_col`` — a sort-merge join keyed
    on the doc, never a cartesian) and the survivors reassemble in
    position order with ``array_sort`` + ``array_join`` (in-row, no
    second window sort).

    Returns (id_col, clean_text, n_tokens, n_removed); documents with no
    duplicated spans pass through with n_removed = 0.
    """
    spans = duplicate_spans(df, text_col, id_col, width, hash_fn)
    toks = (df.select(
                id_col,
                F.filter(F.split(F.col(text_col), r"\s+"),
                         lambda x: x != "").alias("__w"))
              .select(id_col, F.posexplode("__w").alias("pos", "tok")))
    sp = spans.select(F.col(id_col).alias("__sid"),
                      "span_start", "span_end")
    joined = toks.join(
        sp, (toks[id_col] == sp["__sid"])
        & (toks["pos"] >= sp["span_start"])
        & (toks["pos"] <= sp["span_end"]), "left")
    return (joined.groupBy(id_col)
            .agg(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(F.when(
                             F.col("__sid").isNull(),
                             F.struct("pos", "tok")))),
                         lambda s: s["tok"]), " ").alias("clean_text"),
                 F.count("*").alias("n_tokens"),
                 F.sum(F.when(F.col("__sid").isNotNull(), 1)
                       .otherwise(0)).alias("n_removed")))


def sorted_neighborhood_pairs(df: DataFrame, id_col: str, text_col: str,
                              window: int = 4, block_len: int = 4,
                              key_len: int = 24,
                              threshold: float = 0.5,
                              sort_key=None,
                              cross_boundary: bool | str = False) -> DataFrame:
    """Sorted-Neighborhood Method (Hernández & Stolfo, SIGMOD '95): the
    THIRD blocking strategy next to LSH banding and k-means clustering —
    sort the corpus by a normalized key and compare each record only
    against its ``window - 1`` predecessors in sort order, then verify
    candidates by exact word-3-gram Jaccard.

    Why it earns a slot beside MinHash-LSH: SNM finds near-dups whose
    DIFFERENCES are late in the record (shared prefixes sort adjacent
    regardless of how much the tails diverge), costs ONE sort-shuffle —
    no shingle explosion, no signature computation — and its candidate
    count is exactly ``N × (window-1)``, linear by construction. The
    recall bound is the flip side: dups whose keys differ early (typo in
    the first word) land far apart and are missed; production systems
    run several passes with different key functions, all this same shape.

    Distributed shape: the sort key's first ``block_len`` chars are the
    shuffle/partition key, ordering + row_number run WITHIN blocks
    (parallel, bounded window state), and candidate pairs never cross
    block boundaries by default — the standard parallel-SNM compromise
    (at key-prefix block grain, records that close usually share the
    block anyway). ``cross_boundary=True`` closes the edge gap: each
    block's first ``window−1`` rows equi-join against the PREVIOUS
    block's last ``window−1`` rows (adjacent block index from one
    count-per-block frame; positions t-from-tail and h-from-head pair
    iff t + h ≤ window — exactly the global-sort-window pairs that
    straddle ONE boundary). Still linear: ≤ (window−1)² candidate
    pairs per boundary; the block-index window runs over the distinct-
    blocks frame (one row per block, metadata-scale). Pairs spanning
    a whole block (a block with < window−1 rows between two dups) are
    ``cross_boundary=True``'s remaining miss;
    ``cross_boundary='chained'`` closes it COMPLETELY: per-block
    counts fold into cumulative row offsets (a block-grain frame, one
    row per block), every row gets its GLOBAL sort rank, and
    candidates come from one chunk-keyed equi-join (chunk =
    rank div (window−1); each successor probes its own and the
    previous chunk) — exactly the single-machine SNM's global sliding
    window, independent of how many short blocks sit between a pair,
    still ≤ 2·(window−1) candidate partners per row. Pair generation
    is an equi-join on (block, rn) after an offset explode (never a
    range join); verification joins the per-doc distinct shingle
    arrays by id — every stage a linear, uniformly-keyed shuffle.

    Exactly engine-reproducible (normalized-key sort over [a-z0-9]
    strings is binary-collation stable; Jaccard on int counts), so the
    whole chain carries an exact SQL oracle.

    Returns verified pairs (id_a, id_b, jaccard round-6) with id_a the
    sort-order predecessor. ``sort_key`` overrides the default
    normalized-prefix key with any Column (multipass SNM runs several
    key functions — see :func:`snm_multipass`).
    """
    if sort_key is None:
        norm = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "")
        sort_key = F.substring(norm, 1, key_len)
    keyed = df.select(
        F.col(id_col), F.col(text_col), sort_key.alias("__key"))
    keyed = keyed.withColumn("__blk", F.substring("__key", 1, block_len))
    w = Window.partitionBy("__blk").orderBy("__key", id_col)
    rn = keyed.select(id_col, "__blk",
                      F.row_number().over(w).alias("__rn"))
    if cross_boundary == "chained":
        # GLOBAL sliding window via cumulative block offsets: blocks
        # sort by prefix, rows by (key, id) within — so in-block rank
        # plus the running count of all earlier blocks IS the global
        # sort rank (the offsets window runs over the block-grain
        # counts frame, one row per block, metadata-scale). Chunk the
        # ranks at width window−1: a pair within global distance
        # window−1 spans at most one chunk edge, so each successor
        # probing its own and the previous chunk finds EVERY pair —
        # the single-machine SNM window, no short-block miss.
        wdist = window - 1
        nblk = rn.groupBy("__blk").agg(F.max("__rn").alias("__n"))
        owin = (Window.orderBy("__blk")
                .rowsBetween(Window.unboundedPreceding, -1))
        offs = nblk.select(
            "__blk",
            F.coalesce(F.sum("__n").over(owin), F.lit(0)).alias("__off"))
        g = (rn.join(F.broadcast(offs), "__blk")
             .select(F.col(id_col),
                     (F.col("__off") + F.col("__rn") - 1).alias("__g")))
        ck = F.floor(F.col("__g") / F.lit(float(wdist)))
        aside = g.select(F.col(id_col).alias("__ida"),
                         F.col("__g").alias("__ga"), ck.alias("__ck"))
        bside = g.select(F.col(id_col).alias("__idb"),
                        F.col("__g").alias("__gb"),
                        F.explode(F.array(ck, ck - 1)).alias("__ck"))
        cand = (aside.join(bside, "__ck")
                .where((F.col("__gb") - F.col("__ga") >= 1)
                       & (F.col("__gb") - F.col("__ga") <= wdist))
                .select("__ida", "__idb"))
        cross_boundary = False
    else:
        # each row emits (blk, rn - off) probes for off in 1..window-1:
        # an EQUI join on (blk, rn) pairs it with each predecessor
        probes = rn.select(
            F.col(id_col).alias("__idb"), "__blk",
            F.explode(F.sequence(F.lit(1), F.lit(window - 1))).alias("__off"),
            F.col("__rn"))
        probes = probes.select(
            "__idb", "__blk", (F.col("__rn") - F.col("__off")).alias("__rn"))
        cand = (rn.select(F.col(id_col).alias("__ida"), "__blk", "__rn")
                .join(probes, ["__blk", "__rn"])
                .select("__ida", "__idb"))
    if cross_boundary:
        # adjacent-block edge pass: block index over the distinct-block
        # frame (one row per block), then tails(t) × heads(h) of
        # consecutive blocks with t + h ≤ window — the global-window
        # pairs the in-block pass cannot see
        nblk = rn.groupBy("__blk").agg(F.max("__rn").alias("__n"))
        bidx = nblk.select(
            "__blk", "__n",
            F.row_number().over(Window.orderBy("__blk")).alias("__bi"))
        heads = (rn.join(bidx.select("__blk", "__bi"), "__blk")
                 .where(F.col("__rn") <= window - 1)
                 .select(F.col(id_col).alias("__idb"),
                         F.col("__bi").alias("__hbi"),
                         F.col("__rn").alias("__h")))
        tails = (rn.join(bidx, "__blk")
                 .select(F.col(id_col).alias("__ida"),
                         (F.col("__bi") + 1).alias("__hbi"),
                         (F.col("__n") - F.col("__rn") + 1).alias("__t"))
                 .where(F.col("__t") <= window - 1))
        xpairs = (tails.join(heads, "__hbi")
                  .where(F.col("__t") + F.col("__h") <= window)
                  .select("__ida", "__idb"))
        cand = cand.unionByName(xpairs)
    # word-3-gram distinct shingle sets, built in-row (no self-join)
    words = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"),
                     lambda x: x != "")
    sh = df.select(
        F.col(id_col).alias("__sid"),
        F.array_distinct(F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(words) - 2, F.lit(1))),
            lambda i: F.array_join(F.slice(words, i, 3), " ")))
        .alias("__sh"))
    a = sh.select(F.col("__sid").alias("__ida"), F.col("__sh").alias("__sha"))
    b = sh.select(F.col("__sid").alias("__idb"), F.col("__sh").alias("__shb"))
    scored = (cand.join(a, "__ida").join(b, "__idb")
              .select("__ida", "__idb",
                      F.size(F.array_intersect("__sha", "__shb"))
                       .cast("double").alias("__ni"),
                      F.size("__sha").alias("__na"),
                      F.size("__shb").alias("__nb")))
    jac = (F.col("__ni")
           / (F.col("__na") + F.col("__nb") - F.col("__ni")))
    return (scored
            .select(F.col("__ida").alias("id_a"),
                    F.col("__idb").alias("id_b"),
                    F.round(jac.cast("decimal(28,8)"), 6).cast("double")
                     .alias("jaccard"))
            .where(F.col("jaccard") >= threshold))


def sorted_neighborhood(df: DataFrame, id_col: str, text_col: str,
                        window: int = 4, block_len: int = 4,
                        key_len: int = 24,
                        threshold: float = 0.5) -> DataFrame:
    """SNM dedup decision over :func:`sorted_neighborhood_pairs`: a doc
    is dropped iff it is the SORT-ORDER SUCCESSOR (id_b) of any verified
    pair — keep-first-in-sort-order, deterministic at any parallelism.
    Returns (id, kept)."""
    pairs = sorted_neighborhood_pairs(df, id_col, text_col, window,
                                      block_len, key_len, threshold)
    dropped = (pairs.select(F.col("id_b").alias(id_col)).distinct()
               .withColumn("__d", F.lit(True)))
    return (df.select(id_col).join(dropped, id_col, "left")
            .select(id_col, F.coalesce(~F.col("__d"), F.lit(True))
                    .alias("kept")))


def snm_multipass(df: DataFrame, id_col: str, text_col: str,
                  window: int = 4, block_len: int = 4, key_len: int = 24,
                  threshold: float = 0.5) -> DataFrame:
    """MULTI-PASS Sorted-Neighborhood (the production SNM recipe,
    Hernández & Stolfo §4): run the window over SEVERAL key functions
    and union the verified pairs — each pass is blind to dups whose
    keys diverge early under ITS ordering, and the passes cover each
    other. Two passes here: the forward normalized prefix (head-stable
    dups) and the REVERSED-token-order prefix (tail-stable dups — a
    typo in the first word breaks pass 1 but not pass 2).

    Pairs from all passes reorient to (min_id, max_id) before the
    union (each pass's own orientation is its sort order, meaningless
    across passes); the keep rule then drops the LARGER id of every
    verified pair — deterministic at any parallelism. Cost = passes ×
    one sort-shuffle, still linear candidates per pass.

    Returns (id, kept).
    """
    words = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"),
                     lambda x: x != "")
    rev_key = F.substring(
        F.regexp_replace(F.lower(F.array_join(F.reverse(words), "")),
                         "[^a-z0-9]", ""), 1, key_len)
    p1 = sorted_neighborhood_pairs(df, id_col, text_col, window,
                                   block_len, key_len, threshold)
    p2 = sorted_neighborhood_pairs(df, id_col, text_col, window,
                                   block_len, key_len, threshold,
                                   sort_key=rev_key)
    both = p1.unionByName(p2).select(
        F.least("id_a", "id_b").alias("__lo"),
        F.greatest("id_a", "id_b").alias("__hi"))
    dropped = (both.select(F.col("__hi").alias(id_col)).distinct()
               .withColumn("__d", F.lit(True)))
    return (df.select(id_col).join(dropped, id_col, "left")
            .select(id_col, F.coalesce(~F.col("__d"), F.lit(True))
                    .alias("kept")))
