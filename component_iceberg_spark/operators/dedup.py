"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Scale design (the reason these exist — 100 TB corpora):

- **Exact**: one hash-aggregate on a fingerprint column. Map-side partial
  aggregation makes the shuffle proportional to distinct docs.
- **n-gram Jaccard (brute)**: shingle-level self-join. Exact, but the join
  fan-out is quadratic in shingle document-frequency — only safe below
  ~10M docs or as the *verification* stage after LSH. This is the oracle-
  checkable ground truth.
- **MinHash-LSH**: the scale path. Signature = K independent min-hashes
  over shingles; band the signature so probability of a candidate pair
  collision is ~1-(1-j^R)^B; verify candidates exactly. Each stage is one
  keyed shuffle; candidate volume is tunable by (B, R) instead of being
  data-determined. Hashes are md5-derived so the DuckDB oracle can run the
  *identical* algorithm — the correctness check covers the LSH itself, not
  just the verified output.
- **SimHash**: 64-bit fingerprint whose Hamming distance tracks cosine
  similarity of token multisets; banding 4×16 bits guarantees (pigeonhole)
  that any pair within Hamming ≤ 3 collides in at least one band.

All stages are DataFrame expressions (codegen'd); no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from component_iceberg_spark.operators.text import text_shingles, tokens
from component_iceberg_spark.session import release_local_checkpoint

NUM_HASHES = 12
BANDS = 4
ROWS_PER_BAND = NUM_HASHES // BANDS
SHINGLE_N = 3


def doc_shingles(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, shingle) pairs, distinct per doc.

    Repartitions first: the CPU cost is in the per-doc regex/array work,
    and a small input (one parquet file → one partition) would otherwise
    pin the whole corpus to a single core. The spread width is the
    SESSION's shuffle-partition conf, not the hard core count: callers
    that scope shuffles to their input volume (streaming micro-batches
    via ``state_scope``) then right-size this exchange too, while at
    100 TB the cluster-tuned conf keeps the full spread.
    """
    spread = df.select(F.col(id_col), F.col(text_col)).repartition(
        int(df.sparkSession.conf.get("spark.sql.shuffle.partitions")),
        F.col(id_col),
    )
    return (
        spread.select(
            F.col(id_col).alias("doc"),
            text_shingles(F.col(text_col), SHINGLE_N).alias("sh"),
        )
        .select("doc", F.explode("sh").alias("shingle"))
    )


def exact_dedup(df: DataFrame, id_col: str, fingerprint_col) -> DataFrame:
    """Exact dedup: one row per fingerprint, smallest id is the canonical
    representative, n_copies counts the duplicates. Repartitions FIRST so
    the regex-heavy fingerprint runs after the spread, in parallel —
    computing it pre-shuffle would pin it to a single-file scan's one
    task."""
    df = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
    )
    return (
        df.select(F.col(id_col).alias("rep_doc_id"), fingerprint_col.alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("rep_doc_id").alias("rep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("fp", "rep_doc_id", "n_copies")
    )


def jaccard_pairs(sh: DataFrame, threshold: float) -> DataFrame:
    """Exact n-gram Jaccard over (doc, shingle) pairs: self-join on
    shingle → intersection counts → |A∪B| from per-doc sizes.

    Output: (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard ≥ threshold.
    """
    cnt = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    ca = cnt.alias("ca")
    cb = cnt.alias("cb")
    return (
        inter.join(ca, F.col("doc_a") == F.col("ca.doc"))
        .join(cb, F.col("doc_b") == F.col("cb.doc"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("i") * 1.0 / (F.col("ca.n") + F.col("cb.n") - F.col("i")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_hash_sql(k: int) -> str:
    """ANSI-SQL text of hash function k — the oracle-side twin of
    :func:`_minhash_col`. One definition, two renderings."""
    return f"substr(md5(shingle || '#{k // 4}'), {(k % 4) * 8 + 1}, 8)"


def _minhash_col(k: int):
    """Hash function k of a shingle: an 8-hex-char (32-bit) slice of
    md5(shingle||'#⌊k/4⌋'). Four hash functions share one digest, so K
    hashes cost ⌈K/4⌉ md5 evaluations per shingle instead of K — md5 is
    the dominant signature cost. String min over fixed-width hex is
    well-ordered and identical in any engine; 32 bits is ample for
    min-hash ordering (shingle-pair collision ≈ 2⁻³²)."""
    digest = F.md5(F.concat(F.col("shingle"), F.lit(f"#{k // 4}")))
    return F.substring(digest, (k % 4) * 8 + 1, 8)


def minhash_signatures(sh: DataFrame) -> DataFrame:
    """K min-hashes per doc (hash family: :func:`_minhash_col`).

    The min runs over the hash slice CONVERTED TO A 64-BIT INT, not the
    hex string: a string min has no fixed-width aggregation buffer, so
    Spark planned every signing pass as a SortAggregate — a full sort of
    the exploded shingle table per signature build (r15 profiling: the
    dominant stage of every minhash consumer). Numeric buffers plan as
    HashAggregate with map-side partial aggregation — no sort, and the
    shuffle carries 12 longs instead of 12 strings (guide §2.3). For
    fixed-width lowercase hex, lexicographic order equals numeric order,
    so ``to_hex(min(int(h)))`` is bit-identical to ``min(h)`` — the
    output schema (8-hex-char strings) is unchanged and the SQL oracles
    replay it exactly (pinned by
    ``test_minhash_signatures_hash_agg_matches_string_min``)."""
    # Each lane is parsed from ONE SQL string (the same
    # :func:`minhash_hash_sql` text the oracles replay) instead of being
    # assembled md5/substring/conv/cast/min call-by-call over py4j, and
    # the hex restore is ONE selectExpr carrying all K strings: the
    # screen builds this plan PER EPOCH, and the call-by-call form was
    # ~170 py4j round-trips of pure driver latency per build (r16
    # profile: ~0.2-0.5 s/epoch of zero-job gap; same §1.2 driver-cost
    # lever as the r15 hyperplane-constant F.expr batching). The parsed
    # Catalyst trees are identical, so the physical plan (HashAggregate
    # over long buffers) is unchanged.
    aggs = [
        F.expr(
            f"min(cast(conv({minhash_hash_sql(k)}, 16, 10) AS bigint)) AS h{k}"
        )
        for k in range(NUM_HASHES)
    ]
    back = [
        f"lpad(lower(conv(h{k}, 10, 16)), 8, '0') AS h{k}"
        for k in range(NUM_HASHES)
    ]
    return sh.groupBy("doc").agg(*aggs).selectExpr("doc", *back)


def signature_bands(sig: DataFrame) -> DataFrame:
    """Band a signature table into (doc, band, key) rows: B bands of R
    hashes each, the band key an md5 over its R hash columns. This is the
    LSH bucketing key — equal (band, key) ⇒ candidate pair.

    One explode over an inline (band, key) array instead of a B-way
    union of selects: the union form re-read (or re-computed) the
    signature relation B times per consumer — the reason callers had to
    persist it — while the explode emits the same rows in a single pass
    (guide §2.4: same result, B−1 fewer traversals of the input)."""
    # One parsed expression for the whole (band, key) array — not B
    # struct/md5/concat_ws Column trees built call-by-call: banding runs
    # inside every per-epoch screen build, where py4j round-trips are
    # the cost (see minhash_signatures). Identical parsed trees,
    # identical plan.
    entries = ", ".join(
        "struct({b} AS band, md5(concat_ws('|', {cols})) AS key)".format(
            b=b,
            cols=", ".join(
                f"h{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)
            ),
        )
        for b in range(BANDS)
    )
    return sig.selectExpr(
        "doc", f"explode(array({entries})) AS bk"
    ).selectExpr("doc", "bk.band AS band", "bk.key AS key")


def lsh_candidates(sig: DataFrame) -> DataFrame:
    """Band the signature (B bands × R rows) and emit candidate pairs that
    collide in ≥1 band. Shuffle key = (band_idx, band_key): collision
    buckets are tiny by construction, so the self-join never explodes."""
    bands = signature_bands(sig)
    x = bands.alias("x")
    y = bands.alias("y")
    # join condition / projection as parsed strings — one py4j call each
    # instead of ~14 Column-builder round-trips (see minhash_signatures;
    # this builder runs per epoch inside the incremental screen)
    return (
        x.join(y, F.expr("x.band = y.band AND x.key = y.key AND x.doc < y.doc"))
        .selectExpr("x.doc AS doc_a", "y.doc AS doc_b")
        .distinct()
    )


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    persisted_out: list | None = None,
    profile: DataFrame | None = None,
) -> DataFrame:
    """Full MinHash-LSH pipeline: shingle → sign → band → candidates →
    exact-verify. Returns verified (doc_a, doc_b, jaccard ≥ threshold).

    What persists and what recomputes (profiled at sf1, 3.2M shingles):
    caching the exploded SHINGLE table cost ~12.5 s of row
    serialization to store ~1.4 s of recompute — the regex shingle build
    (text_shingles, one codegen'd pass) is cheaper to re-run per consumer
    than to materialize. The SIGNATURES (one short row per doc, ~60×
    smaller than the shingle table) are what candidate generation banding
    reads B times — they persist instead. At 100 TB the same logic holds
    harder: the shingle table is corpus-sized × shingle-count (you
    checkpoint it to the lake only if it also feeds reporting), the
    signature table is corpus-row-sized.

    ``profile`` (optional): a precomputed :func:`corpus_minhash_profile`
    of ``df`` — signatures AND shingle counts are taken from it, so the
    K-way md5 signing pass (the dominant cost) is never re-run when the
    caller already holds the stored artifact. Shingles are still built
    for the exact-verify stage."""
    from pyspark import StorageLevel

    sh = doc_shingles(df, id_col, text_col)
    if profile is not None:
        sig = profile
        cnt = profile.select("doc", "n")
    else:
        sig = minhash_signatures(sh).persist(StorageLevel.MEMORY_AND_DISK)
        if persisted_out is not None:
            # callers that fully materialize the result (streaming
            # foreachBatch) receive the cache handle so they can release
            # it — lazy consumers leave it session-scoped as before
            persisted_out.append(sig)
        cnt = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n"))
    cand = lsh_candidates(sig)
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        cand.join(a, F.col("doc_a") == F.col("a.doc"))
        .join(b, (F.col("doc_b") == F.col("b.doc")) & (F.col("a.shingle") == F.col("b.shingle")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    ca = cnt.alias("ca")
    cb = cnt.alias("cb")
    return (
        inter.join(ca, F.col("doc_a") == F.col("ca.doc"))
        .join(cb, F.col("doc_b") == F.col("cb.doc"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("i") * 1.0 / (F.col("ca.n") + F.col("cb.n") - F.col("i")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def corpus_minhash_profile(
    corpus: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """The stored dedup artifact for a corpus: one row per doc with its
    K min-hash signature columns AND its distinct-shingle count ``n`` —
    everything the incremental screen needs from old data except the
    candidate-restricted text re-read. Corpus-row-sized (~60× smaller
    than the shingle table); at 100 TB this is the table you persist to
    the lake at ingest, bucketed by band key."""
    sh = doc_shingles(corpus, id_col, text_col)
    sig = minhash_signatures(sh)
    cnt = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n"))
    return sig.join(cnt, "doc")


def incremental_minhash_pairs(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    persisted_out: list | None = None,
    corpus_profile: DataFrame | None = None,
    batch_profile: DataFrame | None = None,
) -> DataFrame:
    """Incremental near-dup screen: a NEW batch against an already-ingested
    corpus, without re-deduping the corpus against itself.

    The production shape for a growing 100 TB corpus (the reference's
    incremental-load mode — ``ex-iceberg/src/component.py`` reads only new
    data past a stored watermark — applied to dedup): the corpus's MinHash
    SIGNATURE table (one short row per doc, ~60× smaller than its shingle
    table) is computed once at ingest and stored in the lake; arriving
    batches shingle + sign ONLY their own rows, then probe the stored
    bands. Per-batch cost is O(batch) + one join against the band table —
    stored bucketed by (band, key), that join shuffles only the batch
    side. Corpus text is re-read here only to exact-verify the candidate
    pairs (a candidate-sized semi-join, not a corpus scan, once column
    stats prune the non-candidate files).

    Returns verified (doc_new, doc_corpus, jaccard ≥ threshold): every
    batch doc that near-duplicates an existing corpus doc. Survivors =
    batch minus doc_new set; corpus-internal duplicates are by
    construction NOT re-reported.
    """
    from pyspark import StorageLevel

    sh_b = doc_shingles(batch, id_col, text_col)
    if corpus_profile is None:
        corpus_profile = corpus_minhash_profile(corpus, id_col, text_col)
        # persist when built here: banding reads it B times and the count
        # join reads it again (a caller-provided profile is typically a
        # stored table or already persisted)
        corpus_profile = corpus_profile.persist(StorageLevel.MEMORY_AND_DISK)
        if persisted_out is not None:
            persisted_out.append(corpus_profile)
    if batch_profile is not None:
        # a caller that already holds the batch's stored profile (e.g. a
        # pipeline that just appended it to the lake at ingest) passes it
        # here so the K-way md5 min-aggregation — the dominant signing
        # cost — is never repeated; equivalence with the direct path is
        # pinned by test_incremental_pairs_profile_path_equals_direct
        sig_b = batch_profile
    else:
        sig_b = minhash_signatures(sh_b).persist(StorageLevel.MEMORY_AND_DISK)
        if persisted_out is not None:
            persisted_out.append(sig_b)
    # parsed-string conditions/projections — same per-build driver-cost
    # lever as screened_drop_ids (this pipeline is the stored-profile
    # incremental probe, rebuilt per arriving batch); trees identical
    bands_c = signature_bands(corpus_profile)
    bands_b = signature_bands(sig_b)
    cand = (
        bands_b.alias("nb")
        .join(
            bands_c.alias("cb"),
            F.expr("nb.band = cb.band AND nb.key = cb.key"),
        )
        .selectExpr("nb.doc AS doc_new", "cb.doc AS doc_corpus")
        .distinct()
    )
    cnt_c = corpus_profile.select("doc", "n")
    if batch_profile is not None:
        cnt_b = batch_profile.select("doc", "n")
    else:
        cnt_b = sh_b.groupBy("doc").agg(F.expr("count(1) AS n"))
    # exact verification re-reads corpus TEXT only for candidate docs —
    # a candidate-sized semi-join + shingle pass, never a corpus scan
    corpus_cand = corpus.join(
        cand.selectExpr(f"doc_corpus AS {id_col}").distinct(),
        id_col,
        "left_semi",
    )
    sh_c_cand = doc_shingles(corpus_cand, id_col, text_col)
    inter = (
        cand.join(sh_b.alias("a"), F.expr("doc_new = a.doc"))
        .join(
            sh_c_cand.alias("b"),
            F.expr("doc_corpus = b.doc AND a.shingle = b.shingle"),
        )
        .groupBy("doc_new", "doc_corpus")
        .agg(F.expr("count(1) AS i"))
    )
    return (
        inter.join(cnt_b.alias("ca"), F.expr("doc_new = ca.doc"))
        .join(cnt_c.alias("cb2"), F.expr("doc_corpus = cb2.doc"))
        .selectExpr(
            "doc_new",
            "doc_corpus",
            # explicit double casts + D suffix: a bare SQL 1.0 parses as
            # DECIMAL and would switch the ratio to decimal arithmetic —
            # this is the old Column path's exact double tree
            "round((cast(i AS double) * 1.0D)"
            " / cast(ca.n + cb2.n - i AS double), 6) AS jaccard",
        )
        .filter(F.expr(f"jaccard >= {threshold!r}D"))
    )


def screened_drop_ids(
    batch: DataFrame,
    batch_profile: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    prior: DataFrame | None = None,
    prior_profile: DataFrame | None = None,
) -> DataFrame:
    """Batch doc ids dropped by the incremental near-dup screen, as ONE
    fused candidate+verify pipeline instead of two (intra-batch LSH dedup
    + batch-vs-corpus incremental pairs run separately).

    A batch doc is dropped iff it verified-near-dups (Jaccard ≥
    threshold) any EARLIER doc: a lower-id doc in the same batch, or any
    doc of the prior corpus. Fusing matters twice over: at bench scale it
    halves the per-epoch stage count (one banded-candidate shuffle, one
    shingle-intersection join, one jaccard filter — measured ~2× fewer
    jobs per micro-batch than the two-pipeline form), and at 100 TB it
    reads the candidate-restricted prior text once instead of twice.

    ``batch_profile`` is the batch's :func:`corpus_minhash_profile`
    (signatures + shingle counts), computed once by the caller;
    ``prior_profile`` is the stored corpus profile. Prior TEXT is read
    only candidate-restricted (semi-join) for exact verification.

    The verify filter uses the UNROUNDED intersection ratio — the same
    predicate as the SQL oracle's pair CTE (queries_text._minhash_cte_body
    ``WHERE i * 1.0 / (ca.n + cb.n - i) >= t``)."""
    # Conditions/projections are parsed strings throughout: this builder
    # runs PER EPOCH inside the incremental screen, where call-by-call
    # Column construction was measured as 0.26-0.41 s of zero-job driver
    # gap per epoch (see minhash_signatures). Parsed trees identical.
    sh_b = doc_shingles(batch, id_col, text_col)
    bands_b = signature_bands(batch_profile)
    # intra-batch candidates come from the SAME generator as the batch
    # dedup operator (single source of truth for the banding semantics);
    # the higher doc of a pair is the drop candidate (lower-id wins)
    cand = lsh_candidates(batch_profile).selectExpr(
        "doc_b AS `drop`", "doc_a AS other"
    )
    cnt_other = batch_profile.select("doc", "n")
    sh_other = sh_b
    if prior is not None and prior_profile is not None:
        bands_p = signature_bands(prior_profile)
        cross = (
            bands_b.alias("nb")
            .join(
                bands_p.alias("cb"),
                F.expr("nb.band = cb.band AND nb.key = cb.key"),
            )
            .selectExpr("nb.doc AS `drop`", "cb.doc AS other")
        )
        cand = cand.unionByName(cross)
        prior_cand = prior.join(
            cand.selectExpr(f"other AS {id_col}").distinct(),
            id_col,
            "left_semi",
        )
        sh_other = sh_other.unionByName(
            doc_shingles(prior_cand, id_col, text_col)
        )
        cnt_other = cnt_other.unionByName(prior_profile.select("doc", "n"))
    cand = cand.distinct()
    inter = (
        cand.join(sh_b.alias("a"), F.expr("`drop` = a.doc"))
        .join(
            sh_other.alias("b"),
            F.expr("other = b.doc AND a.shingle = b.shingle"),
        )
        .groupBy("drop", "other")
        .agg(F.expr("count(1) AS i"))
    )
    verified = (
        inter.join(
            batch_profile.selectExpr("doc AS `drop`", "n AS na"), "drop"
        )
        .join(cnt_other.selectExpr("doc AS other", "n AS nb"), "other")
        # D suffixes + explicit double casts pin the EXACT tree the old
        # Column arithmetic built (``i * 1.0`` with a python float is a
        # DOUBLE multiply; a bare SQL ``1.0`` would parse as DECIMAL and
        # silently switch the ratio to decimal-exact arithmetic)
        .filter(
            F.expr(
                "(cast(i AS double) * 1.0D) / cast(na + nb - i AS double)"
                f" >= {threshold!r}D"
            )
        )
    )
    return verified.selectExpr(f"`drop` AS {id_col}").distinct()


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per doc from md5-derived token hashes.

    Each token contributes ±1 votes on 64 bit positions (4 bits per hex
    nibble of its md5); the sign of each summed position is the fingerprint
    bit. Emitted as 4×16-bit integer bands (s0..s3) for banded near-dup
    search — one aggregation, all expression-level.
    """
    spread = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
    )
    tok = (
        spread.select(F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("t"))
        .select("doc", F.explode(F.array_distinct("t")).alias("token"))
        .withColumn("h", F.md5("token"))
    )
    # votes: nibble p (0..15) supplies bits 4p..4p+3
    vote_aggs = []
    for p in range(16):
        nib = F.conv(F.substring("h", p + 1, 1), 16, 10).cast("int")
        for b in range(4):
            bit = F.shiftrightunsigned(nib, b).bitwiseAND(F.lit(1))
            vote_aggs.append(F.sum(bit * 2 - 1).alias(f"v{p * 4 + b}"))
    votes = tok.groupBy("doc").agg(*vote_aggs)
    # pack sign bits into 4 × 16-bit band integers
    band_cols = []
    for band in range(4):
        expr = F.lit(0)
        for j in range(16):
            bitpos = band * 16 + j
            bit = F.when(F.col(f"v{bitpos}") > 0, 1).otherwise(0)
            expr = expr + bit * F.lit(1 << j)
        band_cols.append(expr.alias(f"s{band}"))
    return votes.select("doc", *band_cols)


def simhash_near_pairs(sig: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: candidates collide on ≥1 of the 4
    16-bit bands (pigeonhole-complete for Hamming ≤ 3), then exact Hamming
    filter via bit_count(xor)."""
    bands = None
    for band in range(4):
        part = sig.select("doc", F.lit(band).alias("band"), F.col(f"s{band}").alias("key"))
        bands = part if bands is None else bands.unionByName(part)
    x = bands.alias("x")
    y = bands.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.doc") < F.col("y.doc")),
        )
        .select(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"))
        .distinct()
    )
    sa = sig.alias("sa")
    sb = sig.alias("sb")
    ham = sum(
        F.bit_count(
            F.col(f"sa.s{band}").bitwiseXOR(F.col(f"sb.s{band}")).cast("long")
        )
        for band in range(4)
    )
    return (
        cand.join(sa, F.col("doc_a") == F.col("sa.doc"))
        .join(sb, F.col("doc_b") == F.col("sb.doc"))
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Cluster formation: pairwise near-dups → dedup groups
# ---------------------------------------------------------------------------

# Below this edge count the whole (deduplicated, bounded-by-LSH-candidate-
# volume) pair graph is handled by ONE executor task running classic
# union-find — a single Arrow batch, zero iterative rounds. 1M edges is
# ~32 MB of Arrow and a few hundred MB of task heap: far under executor
# memory, and ~10 driver round-trips cheaper than the label-propagation
# loop. Larger graphs take the O(log d) distributed path below.
SMALL_GRAPH_EDGES = 1_000_000

# Below this edge count the graph is METADATA-sized (≤ ~1 MB collected)
# and union-find runs on the driver: one bounded collect replaces the
# count job + the one-task shuffle job + the checkpoint materialization
# (measured: 0.97 s → 0.45 s for a 240-edge graph — the three jobs were
# pure scheduling floor, guide §1.2 "don't compute things you throw
# away" applied to Spark jobs themselves). The result is a local
# relation, so downstream joins broadcast it with zero extra jobs.
DRIVER_GRAPH_EDGES = 32_768


def _union_find(edge_iter) -> list[tuple]:
    """Path-compressed, union-by-min union-find over (src, dst) tuples →
    sorted ``(node, min-member-root)`` rows. The same labeling
    :func:`_cc_single_task` computes inside its Arrow task; extracted so
    the driver fast path and the one-task path share one implementation."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in edge_iter:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return sorted((n, find(n)) for n in parent)


def _cc_single_task(edges: DataFrame) -> DataFrame:
    """Union-find over the full edge list inside one Arrow task.

    ``applyInPandas`` over a constant group key ships every edge to a
    single executor task (NOT the driver — no ``collect()``): path-
    compressed union-find labels each node with its component's minimum
    member id, exactly the fixpoint the iterative path converges to.
    The caller guarantees the edge count is bounded (``SMALL_GRAPH_EDGES``)
    so the one-task group is memory-safe by construction."""
    import pandas as pd
    from pyspark.sql import types as T

    node_t = edges.schema["src"].dataType
    out_schema = T.StructType(
        [T.StructField("doc", node_t), T.StructField("cluster_id", node_t)]
    )

    def uf(pdf: pd.DataFrame) -> pd.DataFrame:
        # union by min: the smaller id becomes the root, so the root IS
        # the component's minimum member (find() path-compresses,
        # keeping chains flat enough at this scale)
        rows = _union_find(zip(pdf["src"].tolist(), pdf["dst"].tolist()))
        return pd.DataFrame(
            {"doc": [r[0] for r in rows], "cluster_id": [r[1] for r in rows]}
        )

    return edges.groupBy(F.lit(1).alias("_g")).applyInPandas(uf, schema=out_schema)


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over an undirected pair list → ``(doc,
    cluster_id)`` with ``cluster_id`` = the minimum member id. The step
    after any pairwise dedup (MinHash/SimHash/embedding LSH): transitive
    duplicates A~B, B~C must land in ONE group so exactly one survivor is
    kept per group, not one per pair.

    Algorithm: iterative min-label propagation over the edge set plus
    one self-loop per node — ``min(label over neighbors ∪ self)`` is the
    whole propagation step, so a round is ONE keyed join + ONE aggregate
    (2 shuffle stages; the earlier shape needed a second labels⋈labels
    join for the update and a third for the convergence check).
    Convergence is detected from the label SUM: labels are per-node
    non-increasing, so the round sum strictly decreases until fixpoint —
    one metadata-sized driver value per round instead of a change-count
    join. Converges in O(component diameter) rounds; near-dup components
    are shallow (duplicates of one source document), so the loop is short
    in practice and ``max_iter`` bounds pathological chains. Labels are
    persisted per round and the previous round unpersisted, so lineage
    stays flat — the standard Spark iteration discipline (same shape
    GraphX/GraphFrames uses).
    """
    from pyspark import StorageLevel

    # both directions in ONE pass over the pairs plan (a union of two
    # selects would execute the — typically expensive — pair pipeline
    # twice on first materialization). NOT deduplicated here: union-find
    # is idempotent under duplicate edges, so the small-graph path skips
    # the distinct's shuffle entirely; the iterative path dedups below
    # (there a duplicate would ride along every round).
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
                    ),
                    F.struct(
                        F.col(b_col).alias("src"), F.col(a_col).alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # Adaptive parallelism: the verified pair graph is orders of magnitude
    # smaller than the corpus (bounded by LSH candidate volume), so the
    # iteration's shuffles are sized to the EDGE count, not the cluster
    # default — a 500-edge graph iterates in 1 partition (per-round jobs
    # are sub-second), a billion-edge graph spreads out. The count also
    # materializes the persisted edge set once, before the loop. (It may
    # overcount vs unique edges when callers emit duplicate pairs —
    # a conservative error: it only lowers the single-task cutoff.)
    # Driver fast path: probe for up to DRIVER_GRAPH_EDGES+1 edges with a
    # bounded collect — when the whole graph fits (the common case: the
    # verified pair graph of a dedup pass is orders of magnitude smaller
    # than the corpus), union-find runs here and the labels return as a
    # LOCAL relation: one Spark job total, and downstream joins broadcast
    # the result without another. An over-limit probe falls through with
    # the edge cache warm (the limit scan populated it), so nothing is
    # wasted on big graphs.
    head = edges.limit(DRIVER_GRAPH_EDGES + 1).collect()
    if len(head) <= DRIVER_GRAPH_EDGES:
        from pyspark.sql import types as T

        edges.unpersist()
        rows = _union_find((r[0], r[1]) for r in head)
        node_t = edges.schema["src"].dataType
        out_schema = T.StructType(
            [T.StructField("doc", node_t), T.StructField("cluster_id", node_t)]
        )
        # broadcast hint: the Python-local relation is RDD-backed with
        # unknown size stats, so without the hint a downstream join
        # plans sort-merge and shuffles BOTH sides; the labels are
        # metadata-sized by construction (≤ DRIVER_GRAPH_EDGES rows).
        # Few, explicit slices: a bare createDataFrame parallelizes into
        # defaultParallelism slices, and materializing the broadcast
        # then runs one Python-worker round-trip PER SLICE — 32
        # near-empty tasks that were the measured wall of every
        # driver-cc consumer (r15 profile); ~8k labels per slice keeps
        # the relation a handful of tasks at any legal size.
        spark = pairs.sparkSession
        rdd = spark.sparkContext.parallelize(
            rows, max(1, len(rows) // 8192 + 1)
        )
        return F.broadcast(spark.createDataFrame(rdd, out_schema))
    n_edges = edges.count()
    if n_edges <= SMALL_GRAPH_EDGES:
        # one-task union-find (see _cc_single_task); checkpoint flattens
        # the plan for downstream consumers, then the edge cache can go
        out = _cc_single_task(edges).localCheckpoint(eager=True)
        edges.unpersist()
        return out
    spark = pairs.sparkSession
    n_part = max(1, min(
        spark.sparkContext.defaultParallelism, n_edges // 50_000 + 1
    ))
    edges_raw, edges = edges, edges.distinct().persist(
        StorageLevel.MEMORY_AND_DISK
    )
    nodes = edges.select(F.col("src").alias("node")).distinct()
    # static join input: edges ∪ self-loops (dupes can't survive min());
    # pre-partitioned on the join key so every round reuses the layout
    edges_plus = (
        edges.select("src", "dst")
        .union(nodes.select(F.col("node"), F.col("node")))
        .repartition(n_part, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # Lineage must be CUT each round, not just cached: persist() keeps the
    # nested logical plan, so analysis/optimization time compounds per
    # round (measured: 0.7 s → 6.4 s by round 7 on a 480-edge graph).
    # localCheckpoint(eager=True) materializes the round AND replaces the
    # plan with the materialized RDD — per-round cost stays flat. Same
    # discipline GraphX applies to Pregel iterations.
    labels = (
        nodes.withColumn("label", F.col("node"))
        .repartition(n_part, "node")
        .localCheckpoint(eager=True)
    )
    # round 0 always changes labels when any edge exists (each edge's
    # larger endpoint drops), so the first sum comparison is a no-op:
    # seed with None and skip the pre-loop sum job
    prev_sum = None
    prev_ckpt = labels
    sum_expr = F.sum(F.col("label").cast("decimal(38,0)"))
    for _ in range(max_iter):
        stepped = (
            edges_plus.join(labels, edges_plus.src == labels.node)
            .groupBy("dst")
            .agg(F.min("label").alias("label"))
            .select(F.col("dst").alias("node"), "label")
            .localCheckpoint(eager=True)
        )
        # stepped is materialized, so the previous round's checkpoint
        # has no reader left — release it (the docstring's "previous
        # round unpersisted" contract; without this every round leaks a
        # cached RDD for the session's lifetime). The LAST checkpoint
        # stays: the returned plan reads it.
        release_local_checkpoint(prev_ckpt)
        prev_ckpt = stepped
        # Pointer-jumping shortcut: follow each node's label to ITS label
        # (labels are node ids, and every node has a label row). One extra
        # tiny self-join halves the remaining component diameter per
        # round, so convergence is O(log d) rounds instead of O(d) — the
        # difference between 8 and 3 rounds here, and between ~40 and ~6
        # rounds on the long duplicate chains crawl corpora produce.
        # Invariant kept: label(x) <= x, per-node non-increasing, so the
        # label-sum still strictly decreases until the true fixpoint.
        lab2 = stepped.select(
            F.col("node").alias("label"), F.col("label").alias("jumped")
        )
        labels = stepped.join(lab2, "label", "left").select(
            "node", F.coalesce("jumped", "label").alias("label")
        )
        cur_sum = labels.agg(sum_expr).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    edges_plus.unpersist()
    edges.unpersist()
    edges_raw.unpersist()
    return labels.select(
        F.col("node").alias("doc"), F.col("label").alias("cluster_id")
    )
