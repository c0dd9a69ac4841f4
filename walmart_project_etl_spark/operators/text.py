"""Text-analysis operators for LLM training-data pipelines.

All pure Column expressions (JVM-side, whole-stage codegen) — language ID,
quality scoring, token counting, and document fingerprinting run at full
scan speed over a 100 TB corpus; nothing here drops to Python per row.

These are new surface beyond the reference (driver north star): the
reference has no text pipeline, so the designs follow standard corpus-prep
practice (C4/RefinedWeb-style heuristics) expressed Spark-first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# ------------------------------------------------------------- token counting

TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def whitespace_token_count(col: Column | str) -> Column:
    """Tokens = maximal runs of non-whitespace. 0 for empty/blank strings.

    Whitespace means ASCII ``\\s`` (space/tab/newline/CR/FF/VT) — the
    portable definition shared by Java regex and RE2. Unicode spaces
    (U+00A0 etc.) are NOT delimiters, deliberately: Python ``str.split``
    would split on them, so a Python reference must use
    ``re.split(r'\\s+', s, flags=re.ASCII)``. Stripping is regex-based:
    ``F.trim`` only removes 0x20, which would leave trailing tabs/newlines
    to produce phantom empty tokens.
    """
    c = F.regexp_replace(_c(col), r"^\s+|\s+$", "")
    return F.when(F.length(c) == 0, F.lit(0)).otherwise(
        F.size(F.split(c, r"\s+")))


def regex_token_count(col: Column | str) -> Column:
    """BPE-ish pre-tokenizer count: letter runs, digit runs, and single
    punctuation marks each count as one token (regexp is RE2/Java-portable)."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(TOKEN_REGEX), F.lit(0)))


# ------------------------------------------------------------- quality signals

def text_stats(col: Column | str) -> dict[str, Column]:
    """Per-document quality signals: lengths, token counts, ratios.

    Ratios are rounded to 6 places so downstream comparisons are stable.
    """
    c = _c(col)
    n_chars = F.length(c)
    n_tokens = whitespace_token_count(c)
    n_alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    n_digit = F.length(F.regexp_replace(c, r"[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(c, r"[^.,;:!?'\"()\[\]{}-]", ""))
    n_space = F.length(F.regexp_replace(c, r"[^ \t\n]", ""))
    safe = F.greatest(n_chars, F.lit(1))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_alpha": n_alpha,
        "n_digit": n_digit,
        "n_punct": n_punct,
        "alpha_ratio": F.round(n_alpha / safe, 6),
        "digit_ratio": F.round(n_digit / safe, 6),
        "punct_ratio": F.round(n_punct / safe, 6),
        "space_ratio": F.round(n_space / safe, 6),
        "mean_token_len": F.round(
            (n_chars - n_space) / F.greatest(n_tokens, F.lit(1)), 6),
    }


def quality_score(col: Column | str,
                  min_chars: int = 50, max_chars: int = 100_000) -> Column:
    """Composite [0,1] quality score: length window + alpha ratio +
    mean-token-length sanity (2..12 chars) + punctuation sanity (<15%).

    Weights are fixed and documented so the score is reproducible; each
    component contributes 0.25.
    """
    s = text_stats(col)
    length_ok = (s["n_chars"] >= min_chars) & (s["n_chars"] <= max_chars)
    alpha_ok = s["alpha_ratio"] >= 0.6
    tok_ok = (s["mean_token_len"] >= 2.0) & (s["mean_token_len"] <= 12.0)
    punct_ok = s["punct_ratio"] <= 0.15
    comps = [length_ok, alpha_ok, tok_ok, punct_ok]
    score = sum(F.when(c, F.lit(0.25)).otherwise(F.lit(0.0)) for c in comps)
    return F.round(score, 2)


# ------------------------------------------------------------- language ID

# tiny per-language stopword lexicons (top function words)
_LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "los", "por"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"],
}


def stopword_hits(col: Column | str, lang: str) -> Column:
    """Number of tokens that are stopwords of ``lang`` (lowercased match)."""
    toks = F.split(F.lower(F.trim(_c(col))), r"\s+")
    sw = F.array(*[F.lit(w) for w in _LANG_STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def lang_id(col: Column | str, min_hits: int = 1) -> Column:
    """Heuristic language ID:

    1. CJK if >30% of chars are in the CJK unified block;
    2. else the language whose stopword lexicon hits the most tokens
       (ties broken by fixed language order en,de,es,fr);
    3. 'unknown' when no lexicon reaches ``min_hits``.
    """
    c = _c(col)
    n_cjk = F.length(F.regexp_replace(c, r"[^一-鿿]", ""))
    cjk_ratio = n_cjk / F.greatest(F.length(c), F.lit(1))
    hits = {lang: stopword_hits(c, lang) for lang in _LANG_STOPWORDS}
    best = F.greatest(*hits.values())
    guess = F.lit("unknown")
    # reversed so the FIRST language in the dict wins ties
    for lang in reversed(list(_LANG_STOPWORDS)):
        guess = F.when(hits[lang] == best, F.lit(lang)).otherwise(guess)
    guess = F.when(best < min_hits, F.lit("unknown")).otherwise(guess)
    return F.when(cjk_ratio > 0.3, F.lit("zh")).otherwise(guess)


# ------------------------------------------------------------- normalization

def normalize_text(col: Column | str) -> Column:
    """Canonical text form for dedup/tokenization: lowercase, control
    chars → space, whitespace runs collapsed to one space, ends trimmed.

    Pure regexp Columns (RE2/Java-portable escapes only) — scan-speed at
    any corpus size; the usual first stage before shingling so that
    formatting-only variants (CRLF, double spaces, tabs) dedup together.
    """
    c = F.lower(_c(col))
    c = F.regexp_replace(c, r"[\x00-\x1f\x7f]", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.regexp_replace(c, r"^\s+|\s+$", "")


# ------------------------------------------------------------- PII redaction

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\-\s]{6,}[0-9]"
IPV4_RE = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"


def redact_pii(col: Column | str) -> Column:
    """Mask emails, phone-number-shaped digit runs, and IPv4 literals with
    typed placeholders — the standard scrub pass before corpus release.

    Patterns are RE2-compatible (no backrefs/lookaround) so the same
    regexes run in Spark (Java), DuckDB, and Go/C++ tooling. Order
    matters: emails first (their local part would otherwise survive as a
    "phone" fragment), then IPs (dotted digits), then phones.
    """
    c = F.regexp_replace(_c(col), EMAIL_RE, "[EMAIL]")
    c = F.regexp_replace(c, IPV4_RE, "[IP]")
    return F.regexp_replace(c, PHONE_RE, "[PHONE]")


# ------------------------------------------------------------- filter chain

def gopher_flags(col: Column | str) -> dict[str, Column]:
    """Gopher/C4-style per-rule keep flags (each independently reportable,
    so curation can audit *why* documents drop, not just how many):

    - ``len_ok``: 5..10,000 whitespace tokens;
    - ``alpha_ok``: ≥60% alphabetic characters;
    - ``mean_tok_ok``: mean token length in [2, 12];
    - ``punct_ok``: ≤15% punctuation;
    - ``stopword_ok``: at least one function-word hit in some lexicon
      (CJK text passes via charset ratio instead).

    ``keep`` is the conjunction. All pure Columns — one scan, no shuffle.
    """
    c = _c(col)
    s = text_stats(c)
    n_cjk = F.length(F.regexp_replace(c, r"[^一-鿿]", ""))
    cjk_ratio = n_cjk / F.greatest(F.length(c), F.lit(1))
    any_stop = F.greatest(*[stopword_hits(c, lang) for lang in _LANG_STOPWORDS])
    flags = {
        "len_ok": (s["n_tokens"] >= 5) & (s["n_tokens"] <= 10_000),
        "alpha_ok": s["alpha_ratio"] >= 0.6,
        "mean_tok_ok": (s["mean_token_len"] >= 2.0) & (s["mean_token_len"] <= 12.0),
        "punct_ok": s["punct_ratio"] <= 0.15,
        "stopword_ok": (any_stop >= 1) | (cjk_ratio > 0.3),
    }
    keep = flags["len_ok"] & flags["alpha_ok"] & flags["mean_tok_ok"] \
        & flags["punct_ok"] & flags["stopword_ok"]
    return {**flags, "keep": keep}


# ------------------------------------------------------------- repetition

def repetition_signals(df: DataFrame, id_col: str, text_col: str,
                       n: int = 2) -> DataFrame:
    """Gopher-style within-document repetition signals, per document:

    - ``n_ngrams``: total word ``n``-grams (all occurrences);
    - ``top_ngram_frac``: occurrences of the single most frequent n-gram /
      total — high values mark boilerplate/keyword-stuffed pages;
    - ``dup_ngram_frac``: fraction of n-gram occurrences whose gram appears
      more than once — the "duplicate n-grams" repetition filter.

    Shape at 100 TB: one explode (linear in corpus token count) and one
    shuffle keyed on ``(doc_id, gram)`` — uniform, partial-agg'd map-side;
    the second aggregation rides the same doc_id hash. No Python, no skew:
    a pathological single doc is bounded by its own length.

    Fractions are rounded to 6 places (cross-engine stable doubles).
    """
    toks = F.split(F.regexp_replace(_c(text_col), r"^\s+|\s+$", ""), r"\s+")
    cnt = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    grams = F.transform(F.sequence(F.lit(0), cnt - 1),
                        lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    per_gram = (df.select(F.col(id_col), F.explode(grams).alias("__g"))
                  .groupBy(id_col, "__g")
                  .agg(F.count(F.lit(1)).alias("__c")))
    return (per_gram.groupBy(id_col)
            .agg(F.sum("__c").alias("n_ngrams"),
                 F.round(F.max("__c") / F.sum("__c"), 6).alias("top_ngram_frac"),
                 F.round(F.sum(F.when(F.col("__c") > 1, F.col("__c"))
                                .otherwise(F.lit(0))) / F.sum("__c"), 6)
                  .alias("dup_ngram_frac")))


# ------------------------------------------------------------- chunking

def chunk_text(df: DataFrame, id_col: str, text_col: str,
               chunk_size: int = 64, stride: int = 64) -> DataFrame:
    """Split each document into fixed-size token windows for training.

    Tokens are whitespace runs; chunk ``i`` covers tokens
    ``[i*stride, i*stride + chunk_size)``; ``stride < chunk_size`` gives
    overlapping windows. Output: one row per (doc, chunk) with
    ``chunk_id`` (0-based), ``n_tokens``, and ``chunk_text``.

    Pure narrow transformation — array ops + ``posexplode``, zero shuffle,
    no Python: a 100 TB corpus chunks at scan speed and the output
    partitioning inherits the input's (no re-layout before the usual
    shuffle-free write).
    """
    toks = F.split(F.regexp_replace(_c(text_col), r"^\s+|\s+$", ""), r"\s+")
    n_toks = F.size(toks)
    # ceil((n - size)/stride) + 1 chunks, min 1 (empty doc → one empty chunk)
    n_chunks = F.greatest(
        F.ceil((n_toks - F.lit(chunk_size)) / F.lit(stride)).cast("int"),
        F.lit(0)) + 1
    chunk = F.posexplode(F.sequence(F.lit(0), n_chunks - 1))
    out = df.select(F.col(id_col), toks.alias("__toks"),
                    chunk.alias("chunk_id", "__i"))
    piece = F.slice(F.col("__toks"), F.col("chunk_id") * stride + 1, chunk_size)
    return out.select(
        id_col, "chunk_id",
        F.size(piece).alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"))


# ------------------------------------------------------------- unigram LM score

def unigram_logprob(df: DataFrame, id_col: str, text_col: str,
                    broadcast_vocab: bool = True) -> DataFrame:
    """Mean per-token unigram log-probability of each document — the
    classic cheap perplexity proxy for corpus quality filtering (documents
    of gibberish / rare-token soup score far below fluent text).

    Two stages, both shuffle-light:

    1. **Vocabulary build** — explode tokens, ``groupBy(token).count()``
       (uniform token-hash shuffle with map-side partial aggregation), then
       per-token ``logprob = ln(count / total)``.
    2. **Scoring** — per-(doc, token) counts joined to the vocabulary, then
       ``sum(count * logprob) / sum(count)`` per document. The vocabulary is
       broadcast by default (natural-language vocabularies are MBs, not
       fact-sized), so the scoring join never shuffles on the (Zipf-skewed!)
       token key — a token-keyed shuffle join would put every ``the`` row in
       one partition. Pass ``broadcast_vocab=False`` to let AQE choose for
       synthetic vocabularies larger than executor memory.

    Determinism across engines: per-token logprobs are rounded to 6 places
    and summed as exact DECIMALs, so the doc-level mean never depends on
    floating-point summation order.

    Output: one row per document — ``n_tokens`` (long) and
    ``mean_logprob`` (double, rounded to 6).
    """
    toks = F.split(F.lower(F.regexp_replace(_c(text_col), r"^\s+|\s+$", "")),
                   r"\s+")
    # Feeds both the vocab build and the scoring join. NOT persist()ed:
    # both consumers sit in the one returned plan, so Catalyst reuses the
    # groupBy exchange (ReusedExchange) — an explicit persist would leak
    # executor storage for the session lifetime because callers never
    # unpersist a returned lazy plan (same hazard ADVICE r4 flagged for
    # tfidf_top_terms).
    doc_tok = (df.select(F.col(id_col), F.explode(toks).alias("__t"))
                 .groupBy(id_col, "__t")
                 .agg(F.count(F.lit(1)).alias("__c")))
    vocab = doc_tok.groupBy("__t").agg(F.sum("__c").alias("__vc"))
    total = vocab.agg(F.sum("__vc").alias("__total"))
    vocab = (vocab.crossJoin(F.broadcast(total))
             .select("__t",
                     F.round(F.log(F.col("__vc") / F.col("__total")), 6)
                      .cast("decimal(20,6)").alias("__lp")))
    if broadcast_vocab:
        vocab = F.broadcast(vocab)
    # mean = exact DECIMAL sum → double, then one IEEE division. Both are
    # correctly-rounded operations any engine reproduces bit-for-bit; a
    # decimal-domain division instead would round the quotient HALF_UP at
    # scale 6, which engines disagree on at exact half-boundaries.
    return (doc_tok.join(vocab, "__t")
            .groupBy(id_col)
            .agg(F.sum("__c").cast("long").alias("n_tokens"),
                 (F.sum(F.col("__lp") * F.col("__c")).cast("double")
                  / F.sum("__c").cast("double")).alias("mean_logprob")))


def bigram_logprob(df: DataFrame, id_col: str, text_col: str,
                   lam: float = 0.7,
                   broadcast_vocab: bool = True) -> DataFrame:
    """Mean per-position INTERPOLATED bigram log-probability of each
    document — the CCNet-style LM perplexity filter, one modeling step
    past :func:`unigram_logprob`: fluent word ORDER now scores above
    shuffled bags of common words, which the unigram model cannot
    distinguish. ``P(w2 | w1) = λ·c(w1,w2)/c(w1) + (1−λ)·c(w2)/N``
    (interpolated with the unigram model, so unseen bigrams stay
    finite without discounting machinery).

    Shape at scale, same envelope as the unigram scorer: bigram pairs
    come from one in-row ``transform`` over the token array (no
    self-join), the corpus bigram/unigram tables are groupBy counts
    with map-side combine, and scoring joins are broadcast by default
    (pass ``broadcast_vocab=False`` when the bigram vocabulary outgrows
    executor memory — it grows faster than the unigram one).

    Determinism: per-bigram logprobs round to 6 places and sum as exact
    DECIMALs — the repo's standard cross-engine contract.

    Output: one row per document with ≥1 bigram — ``n_bigrams`` (long)
    and ``mean_logprob`` (double).
    """
    toks = F.split(F.lower(F.regexp_replace(_c(text_col), r"^\s+|\s+$", "")),
                   r"\s+")
    pairs = F.expr(
        "transform(slice(__toks, 1, size(__toks) - 1), "
        "(w, i) -> struct(w AS w1, __toks[i + 1] AS w2))")
    doc_bi = (df.select(F.col(id_col), toks.alias("__toks"))
              .select(id_col, F.explode(pairs).alias("__p"))
              .select(id_col, F.col("__p.w1").alias("__w1"),
                      F.col("__p.w2").alias("__w2"))
              .groupBy(id_col, "__w1", "__w2")
              .agg(F.count(F.lit(1)).alias("__c")))
    bi = doc_bi.groupBy("__w1", "__w2").agg(F.sum("__c").alias("__c12"))
    # context totals c(w1) from the bigram table (= token count minus
    # each doc's last token) and unigram counts c(w2)/N from the full
    # token stream — the standard interpolation denominators
    ctx = bi.groupBy("__w1").agg(F.sum("__c12").alias("__c1"))
    uni = (df.select(F.explode(toks).alias("__w2"))
           .groupBy("__w2").agg(F.count(F.lit(1)).alias("__c2")))
    total = uni.agg(F.sum("__c2").alias("__n"))
    lp = (bi.join(ctx, "__w1")
          .join(uni, "__w2")
          .crossJoin(F.broadcast(total))
          .select("__w1", "__w2",
                  F.round(F.log(
                      F.lit(float(lam)) * F.col("__c12") / F.col("__c1")
                      + F.lit(1.0 - float(lam))
                      * F.col("__c2") / F.col("__n")), 6)
                   .cast("decimal(20,6)").alias("__lp")))
    if broadcast_vocab:
        lp = F.broadcast(lp)
    return (doc_bi.join(lp, ["__w1", "__w2"])
            .groupBy(id_col)
            .agg(F.sum("__c").cast("long").alias("n_bigrams"),
                 (F.sum(F.col("__lp") * F.col("__c")).cast("double")
                  / F.sum("__c").cast("double")).alias("mean_logprob")))


def tfidf_top_terms(df: DataFrame, id_col: str, text_col: str, k: int = 5,
                    broadcast_vocab: bool = True) -> DataFrame:
    """Per-document top-k TF-IDF terms — the classic keyword/topic-surface
    primitive (dataset exploration, near-topic grouping, quality probes).

    Same two-stage shuffle-light shape as :func:`unigram_logprob`:

    1. **Vocabulary build** — per-(doc, term) counts (one uniform shuffle,
       map-side partial agg), then per-term document frequency and the
       corpus doc count as an in-plan 1-row aggregate (no collect).
    2. **Scoring** — smoothed idf ``ln((N+1)/(df+1)) + 1`` (sklearn's
       formulation), rounded to 6 places and DECIMAL-multiplied by the
       integer tf, so scores are bit-identical on any engine at any
       parallelism; per-doc top-k via a window with the term as tiebreak.

    The vocabulary rides as a broadcast by default so the Zipf-skewed term
    key never becomes a shuffle key (see unigram_logprob's rationale).

    Output: ``(id_col, term, tf bigint, doc_freq bigint, tfidf double,
    rank int)``, ``rank ≤ k``.
    """
    toks = F.split(F.lower(F.regexp_replace(_c(text_col), r"^\s+|\s+$", "")),
                   r"\s+")
    # Feeds vocab build + scoring join. NOT persist()ed: the three
    # consumers sit in ONE final plan, so Spark's ReuseExchange serves
    # them all from the same shuffle files — an explicit persist would
    # leak a cached dataset per invocation (registry/bench loops call
    # this repeatedly and nothing ever unpersists a returned lazy plan).
    doc_tok = (df.select(F.col(id_col), F.explode(toks).alias("__t"))
                 .groupBy(id_col, "__t")
                 .agg(F.count(F.lit(1)).alias("tf")))
    dfreq = doc_tok.groupBy("__t").agg(F.count(F.lit(1)).alias("doc_freq"))
    ndocs = doc_tok.agg(F.countDistinct(F.col(id_col)).alias("__n"))
    vocab = (dfreq.crossJoin(F.broadcast(ndocs))
             .select("__t", "doc_freq",
                     F.round(F.log((F.col("__n") + F.lit(1.0))
                                   / (F.col("doc_freq") + F.lit(1.0)))
                             + F.lit(1.0), 6)
                      .cast("decimal(20,6)").alias("__idf")))
    if broadcast_vocab:
        vocab = F.broadcast(vocab)
    scored = (doc_tok.join(vocab, "__t")
              .select(F.col(id_col), F.col("__t").alias("term"),
                      F.col("tf").cast("long").alias("tf"),
                      F.col("doc_freq").cast("long").alias("doc_freq"),
                      (F.col("__idf") * F.col("tf")).cast("double")
                       .alias("tfidf")))
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


# ------------------------------------------------------------- fingerprinting

def doc_fingerprint(col: Column | str, k: int = 8) -> Column:
    """Content fingerprint: lexicographic MIN of the md5 hex digests of all
    character k-grams — a 1-permutation MinHash. Near-identical documents
    share fingerprints with probability ≈ Jaccard similarity of their
    shingle sets; exact duplicates always match.

    md5-based (not xxhash64) so external engines can reproduce it.
    """
    c = _c(col)
    n = F.greatest(F.length(c) - (k - 1), F.lit(1))
    grams = F.transform(F.sequence(F.lit(1), n), lambda i: F.md5(F.substring(c, i, k)))
    return F.array_min(grams)


def pmi_collocations(df: DataFrame, text_col: str, min_count: int = 5,
                     top_k: int = 50) -> DataFrame:
    """Top collocations by pointwise mutual information —
    PMI(w1, w2) = ln( p(w1 w2) / (p(w1)·p(w2)) ) over adjacent word
    pairs (Church & Hanks 1990), the classic phrase-mining signal
    ("new york" scores high because its parts rarely occur apart).
    ``min_count`` filters the low-support pairs whose PMI is
    pure noise (a hapax pair of two hapax words maxes the score).

    Shape: bigrams from one in-row transform (no self-join), one
    (w1, w2) count and one unigram count — both map-side combined —
    then broadcast joins of the unigram counts onto the ≥min_count pair
    table and a TakeOrdered top-k (per-partition heads + driver merge,
    never a full sort). Per-pair PMI is pure arithmetic on exact int
    ratios with the decimal-routed final rounding, so the oracle is
    exact.

    Returns (w1, w2, pair_count, pmi round-6) — top_k by (pmi desc,
    w1, w2).
    """
    toks = F.split(F.lower(F.regexp_replace(_c(text_col),
                                            r"^\s+|\s+$", "")), r"\s+")
    pairs = F.expr(
        "transform(slice(__toks, 1, size(__toks) - 1), "
        "(w, i) -> struct(w AS w1, __toks[i + 1] AS w2))")
    bi = (df.select(toks.alias("__toks"))
          .select(F.explode(pairs).alias("__p"))
          .select(F.col("__p.w1").alias("w1"), F.col("__p.w2").alias("w2"))
          .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_count")))
    uni = (df.select(F.explode(toks).alias("w"))
           .groupBy("w").agg(F.count(F.lit(1)).alias("c")))
    nb = bi.agg(F.sum("pair_count").alias("__nb"))
    nt = uni.agg(F.sum("c").alias("__nt"))
    strong = bi.where(F.col("pair_count") >= min_count)
    scored = (strong
              .join(F.broadcast(uni.select(F.col("w").alias("w1"),
                                           F.col("c").alias("__c1"))), "w1")
              .join(F.broadcast(uni.select(F.col("w").alias("w2"),
                                           F.col("c").alias("__c2"))), "w2")
              .crossJoin(F.broadcast(nb)).crossJoin(F.broadcast(nt)))
    pmi = F.log((F.col("pair_count") / F.col("__nb"))
                / ((F.col("__c1") / F.col("__nt"))
                   * (F.col("__c2") / F.col("__nt"))))
    return (scored.select(
                "w1", "w2", "pair_count",
                F.round(pmi.cast("decimal(28,8)"), 6).cast("double")
                 .alias("pmi"))
            .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
            .limit(top_k))
