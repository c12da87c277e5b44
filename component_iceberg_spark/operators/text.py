"""Text-analysis operators for training-data pipelines.

All ops are pure ``pyspark.sql.functions`` expression trees — JVM-side,
whole-stage-codegen'd, no Python in the hot path. Each has an exact SQL
twin (the oracle) because the expressions are deterministic: integer
counts, regex counts, and single-step double divisions are bit-identical
across engines.

Scale: every op here is embarrassingly parallel (per-row projection or a
single keyed aggregation) — at 100 TB they pipeline inside the scan stage
with zero extra shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Word-boundary token pattern for the BPE-ish count: letter runs, digit
# runs, or single non-space symbols — the classic pre-tokenizer shape.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

WHITESPACE_RE = r"\s+"

# Small per-language stopword lists for the n-gram/stopword language
# heuristic. Disjoint across languages so the argmax is unambiguous.
LANG_STOPWORDS = {
    "en": ("the", "and", "is", "of", "to"),
    "de": ("der", "die", "und", "ist", "nicht"),
    "fr": ("le", "la", "et", "les", "dans"),
    "es": ("el", "los", "una", "por", "como"),
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization (trim first so edge whitespace doesn't mint
    empty tokens — matches ``regexp_split_to_array(trim(x), '\\s+')``)."""
    return F.split(F.trim(col), WHITESPACE_RE)


def text_shingles(text_col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles straight from raw text in ONE
    codegen'd regex pass — no higher-order functions.

    Whitespace is normalized to single spaces, then a lookahead capture
    at each token start grabs the n-token window while the match consumes
    exactly one token (plus its trailing space), so the scan advances
    token by token. String-identical to building
    ``concat_ws(' ', t[i], …, t[i+n-1])`` over ``split(trim(x), '\\s+')``
    (the :func:`shingles` form): normalization makes the joiner a single
    space, and a position where fewer than n tokens remain can never
    match — mid-token starts see the same space count, so no false
    shingles (pinned by a property test).

    Why this form: the zip_with/slice construction it replaced evaluated
    interpreted HigherOrderFunction lambdas per element — profiled ~2×
    slower than this single regex at sf1 (3.2M shingles), and it needed
    the token array materialized first (plus it minted phantom ''-token
    shingles for \\t/\\n-edged text, since trim() strips spaces only).
    Java regex here ≠ RE2 (no-lookahead) on the oracle side — the DuckDB
    twins build shingles by token slicing instead, which is fine because
    only the resulting strings must agree."""
    norm = F.regexp_replace(F.trim(text_col), r"\s+", " ")
    pat = r"(?=((?:\S+ ){%d}\S+))\S+ ?" % (n - 1)
    return F.coalesce(
        F.array_distinct(F.regexp_extract_all(norm, F.lit(pat), 1)),
        F.array().cast("array<string>"),
    )


def stopword_hits(col: Column, words: tuple[str, ...]) -> Column:
    """Count of stopword occurrences via one word-boundary regex."""
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(col), F.lit(pat))


def lang_id(col: Column) -> Column:
    """Stopword-vote language ID with deterministic preference order and
    'und' (undetermined) when nothing matches."""
    scores = {lang: stopword_hits(col, ws) for lang, ws in LANG_STOPWORDS.items()}
    c_en, c_de, c_fr, c_es = (scores[lang] for lang in ("en", "de", "fr", "es"))
    # Explicit cascade: en wins ties over de over fr over es — the same CASE
    # the oracle states, so tie-breaking is pinned cross-engine.
    return (
        F.when((c_en >= c_de) & (c_en >= c_fr) & (c_en >= c_es) & (c_en > 0), "en")
        .when((c_de >= c_fr) & (c_de >= c_es) & (c_de > 0), "de")
        .when((c_fr >= c_es) & (c_fr > 0), "fr")
        .when(c_es > 0, "es")
        .otherwise("und")
    )


def normalized(col: Column) -> Column:
    """Canonical text form for fingerprinting: lowercase, strip
    non-alphanumerics to spaces, collapse runs, trim."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(col), r"[^a-z0-9\s]", " "), r"\s+", " "
        )
    )


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint = md5 of the normalized text
    (cross-engine stable, unlike xxhash64/murmur which differ per engine)."""
    return F.md5(normalized(col))


# ---------------------------------------------------------------------------
# Normalization + redaction (training-data cleaning stages)
# ---------------------------------------------------------------------------

# Deliberately simple, engine-portable patterns (Java regex and RE2
# agree on this subset): no lookaround, no backreferences.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"
CONTROL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f]"


def normalize_text(col: Column) -> Column:
    """Canonical text cleanup: strip control characters, collapse runs of
    whitespace to single spaces, trim. Pure single-pass regex projections
    — pipelines inside the scan stage."""
    cleaned = F.regexp_replace(col, CONTROL_RE, "")
    collapsed = F.regexp_replace(cleaned, WHITESPACE_RE, " ")
    return F.trim(collapsed)


def redact_pii(col: Column, email_token: str = "<EMAIL>",
               url_token: str = "<URL>") -> Column:
    """Mask emails and URLs with placeholder tokens — the pre-training
    redaction pass. URL masking runs FIRST so an address inside a URL
    query string is swallowed by the URL token, not half-redacted."""
    no_urls = F.regexp_replace(col, URL_RE, url_token)
    return F.regexp_replace(no_urls, EMAIL_RE, email_token)


def repetition_ratio(col: Column) -> Column:
    """Distinct-token / total-token ratio — the cheap repetition quality
    signal (boilerplate and generation loops score low). 1.0 for empty
    docs (no evidence of repetition)."""
    toks = tokens(col)
    n = F.size(toks)
    return F.when(n > 0, F.size(F.array_distinct(toks)) / n).otherwise(
        F.lit(1.0)
    )


# ---------------------------------------------------------------------------
# Corpus-trained bigram language model (fluency / quality scoring)
# ---------------------------------------------------------------------------


def doc_bigram_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document bigram multiplicities ``(doc_id, w1, w2, k)`` from
    lowercased whitespace tokens. Bigrams come from zipping two shifted
    array slices (same constant-slice trick as :func:`shingles` — no
    per-element re-evaluation of the regex split); the groupBy rides a
    map-side partial aggregate, so the shuffle carries distinct
    (doc, bigram) rows, not every instance."""
    t = tokens(F.lower(F.col(text_col)))
    win = F.greatest(F.size(t) - 1, F.lit(0))
    grams = F.zip_with(
        F.slice(t, 1, win),
        F.slice(t, 2, win),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("g"))
        .groupBy("doc_id", F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("k"))
    )


def bigram_lm_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Language-model fluency score: train an add-one-smoothed bigram LM
    on the corpus itself, then score every document by its average bigram
    log-probability — the CCNet/Dolma-style quality signal (gibberish and
    boilerplate score far below fluent text; no external model needed).

    ``P(w2|w1) = (c(w1,w2) + 1) / (c(w1→·) + V)`` with V = corpus vocab.
    Returns ``(doc_id, n_bigrams, avg_logp)`` for docs with ≥ 1 bigram.

    Scale shape: one exploded-bigram aggregation (map-side combine), two
    count tables keyed by bigram/history, a scalar vocab row, then a
    keyed join back onto per-doc DISTINCT bigrams (multiplicity rides the
    ``k`` column, so the join never carries one row per token instance).
    Hot bigrams ("of the") skew the join key — bounded because the build
    side is one row per distinct bigram, and AQE skew-split covers the
    probe side. No Python anywhere."""
    from pyspark import StorageLevel

    b = doc_bigram_counts(df, id_col, text_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cnt2 = b.groupBy("w1", "w2").agg(F.sum("k").alias("c2"))
    cnt1 = b.groupBy("w1").agg(F.sum("k").alias("c1"))
    vocab = (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("w"))
        .agg(F.count_distinct("w").alias("v"))
    )
    logp = F.log((F.col("c2") + 1.0) / (F.col("c1") + F.col("v")))
    return (
        b.join(cnt2, ["w1", "w2"])
        .join(cnt1, ["w1"])
        .crossJoin(vocab)  # 1-row build side → broadcast nested loop
        .groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_bigrams"),
            F.round((F.sum(F.col("k") * logp) / F.sum("k")), 4).alias(
                "avg_logp"
            ),
        )
    )


def pack_offsets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seq_len: int,
    n_shards: int,
) -> DataFrame:
    """Sequence-packing index (GPT-style pretraining layout): documents
    concatenate into a token stream that is cut into fixed ``seq_len``
    chunks; each doc's ``(start_offset, first_chunk, last_chunk)`` says
    exactly where its tokens land. Sharding first (``id % n_shards``,
    each shard concatenated independently) is what makes this scale: the
    prefix-sum window runs per shard, so no global single-partition sort
    ever exists, and shards are the unit of parallel tokenization
    downstream. Deterministic: shard assignment and in-shard order are
    pure functions of the id."""
    from pyspark.sql import Window

    n_tok = F.size(tokens(F.col(text_col))).cast("long")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = (
        df.select(
            F.col(id_col),
            (F.col(id_col) % n_shards).alias("shard"),
            n_tok.alias("n_tokens"),
        )
        .filter(F.col("n_tokens") >= 1)
        .withColumn(
            "start_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        )
    )
    return c.select(
        id_col,
        "shard",
        "n_tokens",
        "start_offset",
        F.expr(f"start_offset div {seq_len}").alias("first_chunk"),
        F.expr(f"(start_offset + n_tokens - 1) div {seq_len}").alias(
            "last_chunk"
        ),
    )


# ---------------------------------------------------------------------------
# Context-window chunking + model-based quality scoring (training prep)
# ---------------------------------------------------------------------------


def chunk_windows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    win: int,
    stride: int,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Sliding context windows over the whitespace token stream: one row
    per (doc, window) with the window's token count and rebuilt text —
    the chunking stage in front of tokenize-and-pack for training.

    Shape: tokenize once per row, generate the start offsets as ONE
    ``sequence`` array and ``posexplode`` it — a pure projection +
    generator, no shuffle, no per-window regex re-runs (the token array
    is materialized in the projection and sliced per window). Fan-out is
    ~n_tokens/stride rows per doc — linear in corpus token count at any
    scale. ``carry`` columns ride along per chunk row, so downstream
    per-chunk grouping needs no join back to the document table (a join
    would add a second branch over the — possibly expensive — upstream
    plan; Spark does not always reuse that exchange)."""
    toks = tokens(F.col(text_col))
    base = df.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        toks.alias("_toks"),
    ).select(
        id_col,
        *carry,
        "_toks",
        F.posexplode(
            F.sequence(F.lit(0), F.size("_toks") - 1, F.lit(stride))
        ).alias("chunk_idx", "_start"),
    )
    window = F.slice(F.col("_toks"), F.col("_start") + 1, win)
    return base.select(
        F.col(id_col),
        *carry,
        "chunk_idx",
        F.size(window).alias("n_tokens"),
        F.array_join(window, " ").alias("chunk_text"),
    )


# Fixed logistic-regression weights for the model-based quality filter —
# the shape of a fastText/linear quality classifier with the training
# done offline; scoring is a pure expression (w·x + sigmoid), so it
# pipelines inside the scan at any scale. Feature order is part of the
# contract (the oracle replays it verbatim).
QUALITY_WEIGHTS = (
    ("len_sat", 1.8),        # length saturation: min(n_tokens/64, 1)
    ("punct_ratio", -2.2),   # punctuation density
    ("stopword_ratio", 3.1), # function-word density (fluency proxy)
    ("digit_ratio", -1.4),   # digit density (tables/boilerplate proxy)
    ("mean_tok_len", -0.15), # very long mean tokens ≈ code/URLs
)
QUALITY_BIAS = -0.9


def quality_score(text_col: str) -> Column:
    """THE shared composite cheap-quality score: length saturation
    (min(n_tokens/64, 1)) blended 50/50 with cleanliness (1 − punct
    ratio). text_quality, pipeline_curation and pipeline_token_budget
    all rank on this one expression; its SQL twin is
    ``queries_text.QUALITY_SCORE_SQL`` — change the two together, never
    one."""
    n_tokens = F.size(tokens(F.col(text_col)))
    punct_ratio = (
        F.regexp_count(text_col, F.lit(r"[^A-Za-z0-9\s]")) * 1.0
        / F.length(text_col)
    )
    return (
        F.least(n_tokens / F.lit(64.0), F.lit(1.0)) * 0.5
        + (F.lit(1.0) - punct_ratio) * 0.5
    )


def quality_features(text_col: str) -> dict[str, Column]:
    """The engineered feature vector behind :func:`classifier_score`.
    Single-pass regex counts + one tokenize — no Python, no shuffle."""
    n_tokens = F.size(tokens(F.col(text_col)))
    text_len = F.length(text_col)
    return {
        "len_sat": F.least(n_tokens / F.lit(64.0), F.lit(1.0)),
        "punct_ratio": F.regexp_count(text_col, F.lit(r"[^A-Za-z0-9\s]"))
        * 1.0 / text_len,
        "stopword_ratio": F.regexp_count(
            F.lower(text_col), F.lit(r"\b(the|and|is|of|to|a|in)\b")
        ) * 1.0 / n_tokens,
        "digit_ratio": F.regexp_count(text_col, F.lit(r"[0-9]")) * 1.0 / text_len,
        "mean_tok_len": text_len * 1.0 / n_tokens,
    }


def classifier_score(text_col: str) -> Column:
    """Logistic quality score in [0,1]: sigmoid(w·features + b), summed
    in the fixed QUALITY_WEIGHTS order so the oracle's arithmetic is
    order-identical."""
    feats = quality_features(text_col)
    z = F.lit(QUALITY_BIAS)
    for name, weight in QUALITY_WEIGHTS:
        z = z + feats[name] * F.lit(weight)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
