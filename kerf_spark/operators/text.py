"""Text analysis for large-scale training-data pipelines.

Beyond the reference's own surface (SURVEY.md §7 milestone 5): language
ID, quality scoring, token counting, fingerprinting — the operators a
100 TB document pipeline runs before dedup/filtering.  All pure Column
expressions (no Python in the hot path): every one of these is a
narrow projection over a parquet scan, so at scale the plan is
scan → codegen'd expressions, no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _c(col):
    return F.col(col) if isinstance(col, str) else col


# -------------------------------------------------------------- tokens
def word_tokens(text) -> Column:
    """Whitespace tokenization; empty/blank text -> empty array."""
    t = F.trim(_c(text))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(text, tokens: Column | None = None) -> Column:
    return F.size(tokens if tokens is not None else word_tokens(text)).cast("long")


def bpe_ish_token_count(text) -> Column:
    """Cheap LLM-token estimate: split on word boundaries AND digits /
    punctuation runs (a BPE-flavored regex), ~chars/4 floor fallback."""
    t = F.trim(_c(text))
    pieces = F.size(
        F.filter(
            F.split(t, r"(?<=\W)|(?=\W)"),
            lambda p: F.length(F.trim(p)) > 0,
        )
    )
    return F.greatest(pieces, F.floor(F.length(t) / 4)).cast("long")


# -------------------------------------------------------------- quality
_PUNCT = r"[.,!?;:'\"()\[\]{}]"
_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be",
]


def char_count(text) -> Column:
    return F.length(_c(text)).cast("long")


def punct_count(text) -> Column:
    t = _c(text)
    return (F.length(t) - F.length(F.regexp_replace(t, _PUNCT, ""))).cast("long")


def punct_ratio(text) -> Column:
    t = _c(text)
    return F.when(F.length(t) == 0, F.lit(0.0)).otherwise(
        punct_count(text) / F.length(t)
    )


def stopword_count(
    text, stopwords: list[str] | None = None, tokens: Column | None = None
) -> Column:
    """``tokens``, when given, must be an already-lowercased token array
    staged through a select boundary (avoids re-tokenizing per scorer)."""
    words = (
        tokens
        if tokens is not None
        else F.transform(word_tokens(text), lambda w: F.lower(w))
    )
    sw = F.array(*[F.lit(s) for s in (stopwords or _STOPWORDS)])
    return F.size(F.filter(words, lambda w: F.array_contains(sw, w))).cast("long")


def stopword_ratio(
    text, stopwords: list[str] | None = None, tokens: Column | None = None
) -> Column:
    n = token_count(text, tokens)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        stopword_count(text, stopwords, tokens) / n
    )


def mean_word_len(text) -> Column:
    toks = word_tokens(text)
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        F.aggregate(toks, F.lit(0).cast("long"),
                    lambda acc, w: acc + F.length(w)) / F.size(toks)
    )


def quality_score(text, tokens: Column | None = None) -> Column:
    """Composite heuristic in [0,1]: long-enough, word-shaped, not
    punctuation soup, has stopwords (i.e. looks like prose).  The exact
    blend is a convention, not a model — deterministic + cheap."""
    n_chars = char_count(text)
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(text) * 5)
    sw = stopword_ratio(text, tokens=tokens)
    sw_score = F.least(sw * F.lit(4.0), F.lit(1.0))
    return (len_score * 0.4 + punct_pen * 0.3 + sw_score * 0.3).cast("double")


# -------------------------------------------------------------- lang id
# n-gram/stopword-lexicon heuristic: score = stopword hits per language.
_LANG_LEX: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "that", "for", "with"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "por"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "pour"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
}


def lang_scores(text, tokens: Column | None = None) -> dict[str, Column]:
    words = (
        tokens
        if tokens is not None
        else F.transform(word_tokens(text), lambda w: F.lower(w))
    )
    out = {}
    for lang, lex in _LANG_LEX.items():
        arr = F.array(*[F.lit(w) for w in lex])
        out[lang] = F.size(F.filter(words, lambda w: F.array_contains(arr, w)))
    return out


def lang_id(text, tokens: Column | None = None) -> Column:
    """argmax language by lexicon hits; 'und' (undetermined) when no
    lexicon matches.  Ties break by fixed language order (deterministic).
    """
    scores = lang_scores(text, tokens)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in sorted(_LANG_LEX):  # fixed order => deterministic ties
        s = scores[lang]
        is_better = s > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, s).otherwise(best_score)
    return best_lang


# -------------------------------------------------------------- fingerprint
#: Unicode script ranges for :func:`script_counts` — regex character
#: classes shared verbatim with the DuckDB oracle (both engines use
#: standard \\u escapes, so the counts are bit-identical).
SCRIPT_RANGES = {
    "latin": r"[A-Za-zÀ-ɏ]",
    "cyrillic": r"[Ѐ-ӿ]",
    "cjk": r"[一-鿿぀-ヿ가-힯]",
    "arabic": r"[؀-ۿ]",
    "greek": r"[Ͱ-Ͽ]",
}


def script_counts(text) -> dict[str, Column]:
    """Per-script character counts (language-agnostic script ID —
    the pre-filter real corpus pipelines run before model-based
    language ID).  count = len(text) - len(text with script removed):
    pure JVM regexp projections, zero shuffle."""
    t = _c(text)
    return {
        name: (
            F.length(t) - F.length(F.regexp_replace(t, pat, ""))
        ).cast("long")
        for name, pat in SCRIPT_RANGES.items()
    }


def dominant_script(text) -> Column:
    """argmax over :func:`script_counts` with a deterministic tie order
    (the SCRIPT_RANGES insertion order); 'none' when no script char."""
    counts = script_counts(text)
    pairs = F.array(
        *[
            F.struct(c.alias("n"), F.lit(name).alias("s"))
            for name, c in counts.items()
        ]
    )
    best = F.aggregate(
        pairs,
        F.struct(F.lit(-1).cast("long").alias("n"), F.lit("none").alias("s")),
        lambda acc, x: F.when(x["n"] > acc["n"], x).otherwise(acc),
    )
    return F.when(best["n"] > 0, best["s"]).otherwise(F.lit("none"))


def normalize_text(text) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace."""
    return F.lower(F.trim(F.regexp_replace(_c(text), r"\s+", " ")))


def fingerprint_md5(text) -> Column:
    """Content fingerprint of normalized text — portable (md5 is
    bit-identical across engines, used by the exact-dedup oracle)."""
    return F.md5(normalize_text(text))


def fingerprint64(text) -> Column:
    """64-bit rolling-style fingerprint via xxhash64 of normalized text
    (same hash family as the reference, hash.h:46-54)."""
    return F.xxhash64(normalize_text(text))


def ngrams(text, n: int = 3) -> Column:
    """Word n-grams (shingles) of normalized text, as strings.

    PERFORMANCE: the tokenizer expression is referenced inside the
    transform lambda and re-evaluates per shingle (no CSE across lambda
    scopes) — fine for one-off use on short text, QUADRATIC on a hot
    path.  For bulk shingling, stage the token array through a select
    boundary first (see dedup._shingle_hash_df for the pattern).
    """
    words = word_tokens(normalize_text(text))
    k = F.size(words) - (n - 1)
    return F.when(k <= 0, F.array(F.concat_ws(" ", *[]).cast("string"))).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
            lambda i: F.concat_ws(" ", *[F.element_at(words, i + j) for j in range(n)]),
        )
    )


def chunk_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Split documents into fixed-size overlapping character chunks —
    the context-window primitive of training and retrieval pipelines.

    Chunk starts form the lattice ``0, size-overlap, 2(size-overlap)…``
    up to the last in-bounds offset; each chunk is
    ``substr(text, start+1, size)``.  Pure ``sequence``+``posexplode``
    projection: 1→N fan-out with zero shuffle, bounded by
    ``len/size`` chunks per row, streaming-safe.

    Emits (id, chunk_idx, off, chunk) — offsets are 0-based so callers
    can map spans back into the source document.
    """
    if overlap >= size:
        from ..errors import ArgsError

        raise ArgsError("chunk_text: overlap must be < size")
    step = size - overlap
    starts = F.sequence(
        F.lit(0), F.greatest(F.length(_c(text_col)) - 1, F.lit(0)), F.lit(step)
    )
    return df.select(
        F.col(id_col),
        F.posexplode(starts).alias("chunk_idx", "off"),
        F.col(text_col).alias("__t"),
    ).select(
        id_col,
        "chunk_idx",
        "off",
        F.col("__t").substr(F.col("off") + 1, F.lit(size)).alias("chunk"),
    )


def add_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience projection: attach the full stats block."""
    return df.select(
        "*",
        char_count(text_col).alias("n_chars_calc"),
        token_count(text_col).alias("n_tokens"),
        punct_ratio(text_col).alias("punct_ratio"),
        stopword_ratio(text_col).alias("stopword_ratio"),
        quality_score(text_col).alias("quality"),
        lang_id(text_col).alias("lang_pred"),
        fingerprint_md5(text_col).alias("fingerprint"),
    )


def repetition_signals(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":
    """Gopher-style repetition filters (Rae et al. 2021, appendix A —
    public): per document, the fraction of words taken by the single
    most frequent word (``top_word_frac``), the duplicate-word fraction
    (``dup_word_frac`` = 1 - distinct/total), and the most-frequent
    2-gram's share (``top_bigram_frac``, NULL when the doc has < 2
    words).  High values mark boilerplate / degenerate text a
    training-data pipeline drops.

    Scale shape: explode-then-aggregate (linear in corpus size, three
    shuffles all keyed by doc — co-partitioned, AQE-coalesced) rather
    than the per-row HOF mode-count, which is O(len²) per document and
    melts on long docs.  Ratios round at 9dp so engines agree."""
    toks = df.select(
        F.col(id_col),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("__toks"),
    )
    words = toks.select(id_col, F.explode("__toks").alias("w"))
    wc = words.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("c"))
    wagg = wc.groupBy(id_col).agg(
        F.max("c").alias("__topc"),
        F.sum("c").alias("__tot"),
        F.count(F.lit(1)).alias("__dw"),
    )
    empty = F.expr("CAST(array() AS array<string>)")
    # zip-slices shape, not an indexed element_at lambda: the explode's
    # inferred `size(…) > 0` filter copies the generator below the
    # exchange, so the bigram expression evaluates twice — once on the
    # scan-side task — and must stay cheap (see bigram_lm_score; the
    # slice length only evaluates on the size>1 branch, so ANSI-safe)
    ln = F.size("__toks") - 1
    zipped = F.arrays_zip(
        F.slice(F.col("__toks"), 1, ln).alias("a"),
        F.slice(F.col("__toks"), 2, ln).alias("b"),
    )
    bigrams = toks.select(
        id_col,
        F.explode(
            F.when(
                F.size("__toks") > 1,
                F.transform(
                    zipped,
                    lambda s: F.concat_ws(" ", s["a"], s["b"]),
                ),
            ).otherwise(empty)
        ).alias("b"),
    )
    bc = bigrams.groupBy(id_col, "b").agg(F.count(F.lit(1)).alias("c"))
    bagg = bc.groupBy(id_col).agg(
        F.max("c").alias("__topbc"), F.sum("c").alias("__btot")
    )
    return wagg.join(bagg, id_col, "left").select(
        id_col,
        F.round(F.col("__topc").cast("double") / F.col("__tot"), 9).alias(
            "top_word_frac"
        ),
        F.round(
            F.lit(1.0) - F.col("__dw").cast("double") / F.col("__tot"), 9
        ).alias("dup_word_frac"),
        F.round(F.col("__topbc").cast("double") / F.col("__btot"), 9).alias(
            "top_bigram_frac"
        ),
    )


def tfidf_top_terms(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_len: int = 3,
) -> "DataFrame":
    """Per-document top-k TF-IDF terms — the standard relevance scorer
    a training-data pipeline uses for keyword extraction / quality
    filtering over a corpus.

    Shape: tokenize (staged through a projection boundary — the HOF
    re-evaluation trap), explode to (doc, term), one shuffle for term
    frequency, one partial-aggregated shuffle for document frequency,
    broadcast the corpus size scalar, rank per doc.  No UDFs; idf =
    ln(N/df) stated explicitly so any engine reproduces it.  Scores are
    rounded BEFORE ranking so fp noise can't reorder the top-k across
    engines (term asc breaks rounded ties).
    """
    toks = (
        df.select(F.col(id_col), F.lower(F.col(text_col)).alias("__t"))
        .select(F.col(id_col), F.explode(F.split("__t", "[^a-z]+")).alias("term"))
        .where((F.col("term") != "") & (F.length("term") >= min_len))
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.groupBy("term").agg(
        F.countDistinct(id_col).alias("dfreq")
    )
    n_docs = df.select(F.countDistinct(id_col).alias("n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            F.round(
                F.col("tf")
                * F.log(F.col("n").cast("double") / F.col("dfreq").cast("double")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= k)
    )


# ------------------------------------------------------- bigram LM score
def bigram_lm_score(
    df: "DataFrame",  # noqa: F821
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":  # noqa: F821
    """Perplexity-style quality score from a corpus-trained bigram LM —
    the model-free core of CCNet-style LM filtering: documents whose
    token transitions are unusual *for this corpus* score high
    perplexity and low average log-probability.

    The LM is the corpus itself: ``p(w2|w1) = n(w1,w2) / n(w1·)`` (MLE
    over bigram starts — a proper conditional, no smoothing needed
    because every scored bigram was observed at least once in
    training).  Emits per doc: ``n_bigrams``, ``avg_logprob`` (natural
    log, rounded 9dp), ``ppl = exp(-avg_logprob)`` (rounded 6dp).
    Docs with fewer than two tokens are excluded (no bigrams).

    Scale shape: two count aggregations with map-side partial combine
    (Zipf-hot head words are collapsed before the shuffle), then two
    equi-joins of the bigram stream against the count tables — AQE
    broadcasts them when the vocabulary fits and skew-splits otherwise
    — and a final per-doc aggregation.  Everything stays JVM-side, and
    the statistic is engine-portable (plain counts + ln/exp), so the
    whole pipeline is SQL-oracle-checkable.
    """
    spark_df = df
    ncores = spark_df.sparkSession.sparkContext.defaultParallelism
    if spark_df.rdd.getNumPartitions() < ncores:
        spark_df = spark_df.repartition(ncores)
    staged = spark_df.select(
        F.col(id_col), word_tokens(normalize_text(text_col)).alias("__w")
    ).where(F.size("__w") >= 2)
    # bigram pairs as explode(arrays_zip(slice, slice)) — NOT a
    # transform(sequence, i -> element_at(__w, i…)) lambda: explode
    # makes InferFiltersFromGenerate copy the generator expression
    # into a `size(…) > 0` filter that pushdown moves below the
    # exchange onto the (often single-task) scan side, so the whole
    # interpreted per-element lambda runs TWICE — once single-threaded
    # (measured 13.2 s vs 0.9 s for the zip shape on the sf0.1 corpus,
    # identical rows; optimization r13)
    ln = F.size("__w") - 1
    pairs = staged.select(
        F.col(id_col),
        F.explode(
            F.arrays_zip(
                F.slice(F.col("__w"), 1, ln).alias("w1"),
                F.slice(F.col("__w"), 2, ln).alias("w2"),
            )
        ).alias("__bg"),
    ).select(id_col, F.col("__bg.w1").alias("w1"), F.col("__bg.w2").alias("w2"))
    c2 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("__n2"))
    c1 = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("__n1"))
    scored = (
        pairs.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .select(
            id_col,
            F.log(F.col("__n2").cast("double") / F.col("__n1")).alias("__lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("__lp"), 9).alias("avg_logprob"),
        F.round(F.exp(-F.avg("__lp")), 6).alias("ppl"),
    )


def quality_classifier_score(
    text,
    tokens: Column | None = None,
    weights: dict[str, float] | None = None,
) -> dict[str, Column]:
    """Logistic-regression quality classifier over prose-shape features
    — the embedded-linear-model inference pattern used by
    fastText-style pretraining filters (score each doc against a
    "looks like reference prose" model).  The model runs entirely as
    Column math: features → dot product with the weight vector →
    sigmoid, all inside whole-stage codegen, zero Python per row.

    The default weights are fixed illustrative constants (a real
    deployment distills them from a trained classifier and ships them
    the same way — as plan literals, broadcast-free).  Returns the
    feature columns plus ``score`` ∈ (0,1); threshold downstream.
    """
    w = {
        "bias": -1.0,
        "len": 2.2,
        "stop": 3.0,
        "punct": -4.0,
        "wordlen": 0.8,
        "alpha": 1.5,
    }
    if weights:
        w.update(weights)
    toks = tokens if tokens is not None else F.transform(
        word_tokens(text), lambda t: F.lower(t)
    )
    n_tokens = F.size(toks)
    f_len = F.least(char_count(text) / F.lit(500.0), F.lit(1.0))
    f_stop = stopword_ratio(text, tokens=toks)
    f_punct = punct_ratio(text)
    # mean word length from the staged tokens (lengths are
    # case-invariant) — mean_word_len(text) would re-run the tokenizer
    mean_wl = F.when(n_tokens == 0, F.lit(0.0)).otherwise(
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        )
        / n_tokens
    )
    f_wordlen = F.least(mean_wl / F.lit(8.0), F.lit(1.0))
    f_alpha = F.when(n_tokens == 0, F.lit(0.0)).otherwise(
        F.size(F.filter(toks, lambda t: t.rlike("^[a-z]+$")))
        / n_tokens.cast("double")
    )
    z = (
        F.lit(w["bias"])
        + f_len * w["len"]
        + f_stop * w["stop"]
        + f_punct * w["punct"]
        + f_wordlen * w["wordlen"]
        + f_alpha * w["alpha"]
    )
    return {
        "f_len": f_len,
        "f_stop": f_stop,
        "f_punct": f_punct,
        "f_wordlen": f_wordlen,
        "f_alpha": f_alpha,
        "score": F.lit(1.0) / (F.lit(1.0) + F.exp(-z)),
    }


# ---------------------------------------------------------------- BPE
def word_freq_table(
    df: "DataFrame",  # noqa: F821
    text_col: str = "text",
) -> "DataFrame":  # noqa: F821
    """(word, freq) over the corpus — the Zipf-collapsed vocabulary
    table every tokenizer-induction step runs on.  ONE corpus-sized
    shuffle (map-side partial counts first); everything downstream is
    vocab-sized."""
    return (
        df.select(F.explode(word_tokens(normalize_text(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _apply_merge(tokens: Column, left: str, right: str) -> Column:
    """Greedy left-to-right, non-overlapping BPE merge of the pair
    (left, right) — the fold appends, or fuses with the accumulator's
    tail when it equals ``left`` and the next token is ``right``.  On
    'aaa' with merge (a,a) this yields [aa, a], the standard BPE
    convention.  Pure Column fold, no UDF.  This Column form is the
    property-tested semantic reference; the hot paths ride
    :func:`_apply_merge_sql` (the identical expression, one parse)."""
    fused = F.lit(left + right)
    return F.aggregate(
        tokens,
        F.array().cast("array<string>"),
        lambda acc, t: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (t == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(fused)),
        ).otherwise(F.concat(acc, F.array(t))),
    )


def _sql_str(s: str) -> str:
    """SQL single-quoted string literal of an arbitrary token
    (backslash and quote escaped — merge pairs come from corpus
    text)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _char_tokens_sql(w: str) -> str:
    """Word → character-token array as a SQL expr string (split('')
    yields chars plus empty fragments at the edges — filtered)."""
    return f"filter(split({w}, ''), t -> length(t) > 0)"


def _apply_merge_sql(toks: str, left: str, right: str) -> str:
    """:func:`_apply_merge` as ONE SQL expr string (optimization r13):
    the aggregate/when Column tree costs ~40 py4j round trips PER
    MERGE per construction — bpe_learn builds one per iteration and
    bpe_encode nests len(merges) of them; the parsed expression
    evaluates identically (same aggregate fold, same CASE)."""
    L, R = _sql_str(left), _sql_str(right)
    LR = _sql_str(left + right)
    return (
        f"aggregate({toks}, cast(array() as array<string>),"
        f" (acc, t) -> CASE WHEN size(acc) > 0"
        f" AND element_at(acc, -1) = {L} AND t = {R}"
        f" THEN concat(slice(acc, 1, size(acc) - 1), array({LR}))"
        f" ELSE concat(acc, array(t)) END)"
    )


def _pair_explode_sql(toks: str) -> str:
    """Adjacent-pair explode of a token-array column as one SQL expr —
    the zip_with/slice/struct Column tree of the pair-count stage."""
    return (
        f"explode(zip_with(slice({toks}, 1, size({toks}) - 1),"
        f" slice({toks}, 2, size({toks}) - 1),"
        f" (a, b) -> named_struct('l', a, 'r', b)))"
    )


def bpe_pair_counts(
    df: "DataFrame",  # noqa: F821
    text_col: str = "text",
    top: int = 20,
) -> "DataFrame":  # noqa: F821
    """Frequency of adjacent character pairs across the vocabulary,
    weighted by word frequency — iteration 0 of BPE training, fully
    SQL-oracle-checkable.  Deterministic order: count desc, then pair."""
    wf = word_freq_table(df, text_col)
    toks = wf.selectExpr(
        "word", "freq", f"{_char_tokens_sql('word')} as __t"
    )
    pairs = toks.selectExpr(
        "freq", f"{_pair_explode_sql('__t')} as __p"
    ).select(
        "freq", F.col("__p.l").alias("left"), F.col("__p.r").alias("right")
    )
    counts = pairs.groupBy("left", "right").agg(F.sum("freq").alias("pair_count"))
    return counts.orderBy(
        F.desc("pair_count"), F.asc("left"), F.asc("right")
    ).limit(top)


def bpe_learn(
    df: "DataFrame",  # noqa: F821
    n_merges: int = 8,
    text_col: str = "text",
) -> "DataFrame":  # noqa: F821
    """Learn ``n_merges`` BPE merges from the corpus — tokenizer
    induction as a Spark job.

    Scale shape: the corpus collapses to the (word, freq) vocabulary in
    ONE data-sized shuffle; every merge iteration then runs on the
    vocab table only — one vocab-sized pair-count aggregation, a 1-row
    TakeOrdered collect (the argmax pair, the only driver data), and a
    shuffle-free fold projection applying the merge.  ``localCheckpoint``
    per step truncates the iterative lineage (the dup_clusters
    discipline), so plan size stays O(1) across steps.  Ties break
    (count desc, left asc, right asc) — deterministic on any layout.

    Returns (step, left, right, pair_count) — the ordered merge table
    a downstream tokenizer ships as its artifact.
    """
    spark = df.sparkSession
    # parsed-expr step projections + LAZY checkpoints (optimization
    # r13): the per-iteration zip_with/aggregate Column trees cost
    # ~0.16 s of py4j per step (measured: 3,917 round trips for 8
    # merges); each is now ONE parsed expr.  eager=True additionally
    # ran one extra materialization JOB per step (plus a final
    # checkpoint nothing consumed); lazy still truncates the
    # iterative lineage — each step's argmax collect materializes
    # exactly one checkpoint + one pair aggregation in ONE job.
    wf = word_freq_table(df, text_col)
    cur = wf.selectExpr(
        "word", "freq", f"{_char_tokens_sql('word')} as toks"
    ).localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, int]] = []
    for step in range(n_merges):
        best = (
            cur.selectExpr("freq", f"{_pair_explode_sql('toks')} as __p")
            .groupBy(F.col("__p.l").alias("l"), F.col("__p.r").alias("r"))
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right, cnt = best[0].l, best[0].r, int(best[0].c)
        merges.append((step, left, right, cnt))
        cur = cur.selectExpr(
            "word",
            "freq",
            f"{_apply_merge_sql('toks', left, right)} as toks",
        ).localCheckpoint(eager=False)
    return spark.createDataFrame(
        merges, "step int, left string, right string, pair_count bigint"
    )


def bpe_encode(
    df: "DataFrame",  # noqa: F821
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":  # noqa: F821
    """Tokenize with a learned BPE merge table: each word splits to
    characters, then the merges apply IN LEARNED ORDER (the BPE
    contract), each as one greedy left-to-right fold — the whole
    encoder is a chain of ``len(merges)`` Column aggregates inside a
    single projection: corpus-parallel, shuffle-free, no UDF.

    Emits (id, tokens, n_tokens) where ``tokens`` concatenates the
    per-word token sequences in word order.
    """
    words = df.select(
        F.col(id_col),
        # NULL text encodes to the empty token stream (the oracle's
        # convention) — word_tokens propagates NULL otherwise
        F.coalesce(
            word_tokens(normalize_text(text_col)),
            F.array().cast("array<string>"),
        ).alias("__w"),
    )
    # the whole merge chain as ONE parsed expr (optimization r13):
    # the nested transform/aggregate Column trees cost ~40 py4j round
    # trips per merge per construction; the parsed expression
    # evaluates identically (see _apply_merge_sql)
    enc = _char_tokens_sql("w")
    for left, right in merges:
        enc = _apply_merge_sql(enc, left, right)
    return words.selectExpr(
        f"`{id_col}`",
        f"flatten(transform(__w, w -> {enc})) as tokens",
    ).select(
        id_col, "tokens", F.size("tokens").cast("long").alias("n_tokens")
    )


def inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    postings_cap: int = 8,
) -> DataFrame:
    """Build an inverted index: one row per term with its document
    frequency and the first ``postings_cap`` doc ids (sorted) as the
    posting-list head.

    SCALE: the naive collect_list-then-slice holds a hot term's ENTIRE
    posting list in one aggregation buffer — 'the' at 100 TB is
    billions of ids in one state blob.  Instead the cap is enforced
    BEFORE aggregation with a per-term row_number window, so no
    aggregation state ever exceeds ``postings_cap`` ids; the window
    and the groupBy share the term-hash partitioning, so the second
    stage reuses the first's exchange.
    """
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.array_distinct(word_tokens(normalize_text(text_col)))
        ).alias("term"),
    )
    w = Window.partitionBy("term").orderBy("__id")
    ranked = toks.withColumn("__rn", F.row_number().over(w))
    return ranked.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sort_array(
            F.collect_list(
                F.when(F.col("__rn") <= postings_cap, F.col("__id"))
            )
        ).alias("postings"),
    )


def ngram_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a document's
    distinct word n-grams whose FIRST corpus occurrence (minimum doc
    id) is this document — the corpus-diversity lens a curation
    pipeline uses to find documents that only restate earlier content
    (novelty ~0) vs genuinely new material (novelty ~1).  Documents
    with fewer than ``n`` words carry no grams and are omitted.

    SCALE: tokens are staged through a select boundary (the
    ``ngrams()`` quadratic-lambda trap), then one gram-keyed partial
    aggregate (min doc id — the aggregation state is vocabulary-sized,
    never corpus-sized), one gram-keyed equi-join that reuses the same
    key, and one doc-keyed count.  First-occurrence is defined by doc
    id order, so the metric is deterministic on any layout.
    """
    staged = df.select(
        F.col(id_col), word_tokens(normalize_text(text_col)).alias("__ws")
    ).where(F.size("__ws") >= n)
    k = F.size(F.col("__ws")) - (n - 1)
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(
                " ", *[F.element_at(F.col("__ws"), i + j) for j in range(n)]
            ),
        )
    )
    g = staged.select(F.col(id_col), F.explode(grams).alias("gram"))
    first = g.groupBy("gram").agg(F.min(id_col).alias("__first"))
    return (
        g.join(first, "gram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("__first") == F.col(id_col), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_novel"),
        )
        .select(
            id_col,
            "n_grams",
            "n_novel",
            F.round(F.col("n_novel") * 1.0 / F.col("n_grams"), 6).alias(
                "novelty"
            ),
        )
    )
