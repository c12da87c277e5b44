"""Embedding similarity search: brute-force cosine top-k, threshold pair
join, and an IVF (inverted-file) approximate path for scale.

Float determinism: dot products are left-fold sums of float→double
products in array order — bit-identical between Spark's ``aggregate`` and
DuckDB's ``list_sum(list_transform(...))`` (verified empirically), so the
oracles compare exactly.

Scale design:

- **Brute force** is O(|corpus| × |queries|): correct baseline, and fine
  whenever the query set is small enough to broadcast (the common
  "dedupe this batch against the corpus" shape runs per-partition with no
  shuffle on the corpus side).
- **IVF**: coarse-quantize the corpus by nearest centroid (one broadcast
  join + argmin), bucket it (partition by centroid id), probe only the
  query's nearest ``nprobe`` centroids. Corpus scan cost drops by
  ~``n_centroids / nprobe``; candidate volume is tunable. Centroids here
  are seed vectors chosen by id (deterministic, oracle-reproducible); a
  production fit would k-means them — the search plan is unchanged.
- Near-dup pair join at 100 TB: LSH/IVF-bucket first, verify exact cosine
  within buckets — same candidate/verify split as MinHash dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product over double-cast elements (order-pinned)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dot_raw(a: Column, b: Column) -> Column:
    """Dot product assuming both sides are ALREADY array<double>.

    In O(n·q) scoring loops the per-element casts of :func:`dot` run once
    per PAIR; pre-casting each side once per ROW (``as_double``) and using
    this variant moves that work out of the quadratic loop. float→double
    is exact, so results are bit-identical to :func:`dot`."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def collect_codebook(
    centroids: DataFrame, id_col: str, vec_col: str
) -> list[tuple[object, list[float]]]:
    """Driver-side materialization of the quantizer codebook —
    metadata-sized by construction (k × dim floats, the same thing a
    broadcast of the centroid set would ship to every executor)."""
    return [
        (r[0], [float(x) for x in r[1]])
        for r in centroids.select(id_col, vec_col).collect()
    ]


def nearest_assign(
    df: DataFrame,
    cent: DataFrame,
    vid: str,
    vec: str,
    out: str,
    keep: tuple[str, ...] = (),
    round_to: int | None = 6,
) -> DataFrame:
    """Nearest-centroid assignment: ``(vid, *keep, out=cent_id)`` of the
    centroid with the highest cosine (ties → smallest cent_id; cent_id
    must be numeric for the tie-break encoding).

    Shape: broadcast crossJoin against the — metadata-sized — centroid
    set, then a ``max(struct(csim, -cent_id, cent_id))`` hash aggregate.
    The ×k fan-out collapses MAP-SIDE (partial aggregation runs inside
    the scan stage, every input row's k scored copies live in the same
    partition), so the only shuffle is one row per INPUT row — the
    rank-window form this replaces shuffled all n×k scored rows and
    sorted them within each key. ``keep`` columns ride along via
    ``any_value`` (constant within a group by construction).

    ``cent`` columns: ``cent_id``, ``cent_vec``, ``cent_norm``."""
    base = df.withColumn("_nrm", norm(F.col(vec)))
    sim = dot(F.col(vec), F.col("cent_vec")) / (
        F.col("_nrm") * F.col("cent_norm")
    )
    if round_to is not None:
        sim = F.round(sim, round_to)
    scored = base.crossJoin(F.broadcast(cent)).select(
        F.col(vid),
        *[F.col(c) for c in keep],
        F.col("cent_id"),
        sim.alias("_csim"),
    )
    best = scored.groupBy(vid).agg(
        F.max(
            F.struct(
                F.col("_csim"),
                (-F.col("cent_id")).alias("_neg"),
                F.col("cent_id"),
            )
        ).alias("_b"),
        *[F.any_value(F.col(c)).alias(c) for c in keep],
    )
    return best.select(F.col(vid), *keep, F.col("_b.cent_id").alias(out))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (self excluded).

    ``queries`` is broadcast; the corpus streams through map-side — no
    corpus shuffle. The final ranking shuffles only |queries|×|corpus|
    scored rows, bounded further by per-partition pre-ranking at scale.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(F.col(vec_col)).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_norm"),
    )
    scored = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            as_double(F.col(vec_col)).alias("c_vec"),
            norm(F.col(vec_col)).alias("c_norm"),
        )
        .crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_raw(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm")),
                6,
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def threshold_pairs(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine ≥ threshold (embedding near-dup detection).

    Brute self-join here (oracle-checkable ground truth); the scale path
    buckets by IVF centroid / random-hyperplane sign first and verifies
    within buckets only.

    Two plan details that matter (O(n²) pairs amplify everything):
    - Norms are materialized per ROW on each join side before the join —
      inside the pair expression they would be recomputed per PAIR
      (n²·dim extra work). Bit-identical either way, so the oracle is
      unaffected.
    - The streamed side is repartitioned: a single-file corpus would
      otherwise run the whole nested-loop join in one task.
    """
    par = corpus.sparkSession.sparkContext.defaultParallelism
    a = corpus.repartition(par, F.col(id_col)).select(
        F.col(id_col).alias("vec_a"), as_double(F.col(vec_col)).alias("va"),
        norm(F.col(vec_col)).alias("na"),
    )
    b = corpus.select(
        F.col(id_col).alias("vec_b"), as_double(F.col(vec_col)).alias("vb"),
        norm(F.col(vec_col)).alias("nb"),
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(
                dot_raw(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            ).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def hyperplane_signature(vec: Column, planes: list[list[float]]) -> Column:
    """All sign bits (dot(vec, plane) >= 0) as ONE array<int> column.

    The planes form a single 2-D array literal and the vector is folded
    against each row inside one ``transform`` — one generated expression
    for the whole signature instead of ``len(planes)`` independent
    aggregates, each of which would re-walk (and re-cast) the vector in
    its own codegen block. With the same constants the bits are
    reproducible by any engine."""
    planes_arr = F.array(
        *[F.array(*[F.lit(p) for p in plane]) for plane in planes]
    )
    return F.transform(
        planes_arr,
        lambda pl: (
            F.aggregate(
                F.zip_with(vec, pl, lambda x, y: x.cast("double") * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            >= 0
        ).cast("int"),
    )


def hyperplane_lsh_pairs(
    corpus: DataFrame,
    planes: list[list[float]],
    bands: int,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane (SimHash-for-vectors) LSH near-threshold pairs:
    band the sign signature, candidates collide in ≥1 band, verify exact
    cosine ≥ threshold.

    The angular-LSH counterpart of the IVF path: candidate probability is
    (1-θ/π)^(planes/bands) per band — tunable by (planes, bands) instead
    of data-determined. Deterministic given fixed planes, so the oracle
    replays the identical algorithm.
    """
    from pyspark import StorageLevel

    rows_per_band = len(planes) // bands
    par = corpus.sparkSession.sparkContext.defaultParallelism
    # persisted: base feeds the band self-join (both sides) and both
    # verification joins — 4 consumers of the signature computation
    base = (
        corpus.repartition(par, F.col(id_col))
        .select(
            F.col(id_col).alias("doc"),
            # double-cast ONCE per row here: the verification stage below
            # evaluates a dot per candidate PAIR — with raw float arrays
            # it would re-cast 2×dim elements per pair (see
            # threshold_pairs' plan note; float→double is exact, so
            # results are bit-identical)
            as_double(F.col(vec_col)).alias("v"),
            norm(F.col(vec_col)).alias("nrm"),
            hyperplane_signature(F.col(vec_col), planes).alias("sig"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    band_frames = None
    for b in range(bands):
        key = sum(
            F.col("sig")[b * rows_per_band + r] * (1 << r)
            for r in range(rows_per_band)
        )
        part = base.select("doc", F.lit(b).alias("band"), key.alias("key"))
        band_frames = part if band_frames is None else band_frames.unionByName(part)
    x = band_frames.alias("x")
    y = band_frames.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.doc") < F.col("y.doc")),
        )
        .select(F.col("x.doc").alias("vec_a"), F.col("y.doc").alias("vec_b"))
        .distinct()
    )
    a = base.select(
        F.col("doc").alias("vec_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    b2 = base.select(
        F.col("doc").alias("vec_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    return (
        cand.join(a, "vec_a")
        .join(b2, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.round(
                dot_raw(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            ).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    nprobe: int,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: assign every corpus vector to its nearest
    centroid (broadcast argmin), probe each query's ``nprobe`` nearest
    centroid buckets, exact-rank within the probed slice.

    ``centroids`` is any deterministic (id, vector) seed set — here the
    first vector of each label cluster; a production fit k-means them (the
    search plan is unchanged). Deterministic by construction, so the
    DuckDB oracle can replay the identical algorithm and the match
    verifies bucketing + probing, not just the final ranking.
    """
    cent = centroids.select(
        F.col(id_col).alias("cent_id"),
        F.col(vec_col).alias("cent_vec"),
        norm(F.col(vec_col)).alias("cent_norm"),
    )

    corpus_named = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    # corpus side (the big one): map-side-collapsing argmax — the corpus
    # is scored and bucketed inside its scan stage, one row out per vector
    bucketed = nearest_assign(
        corpus_named, cent, "neighbor_id", "c_vec", "bucket", keep=("c_vec",)
    )

    # query side: needs top-nprobe (not argmax) and is small by contract —
    # a rank window over |queries|×k scored rows is the simple right shape
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    scored_q = q.withColumn("_nrm", norm(F.col("q_vec"))).crossJoin(
        F.broadcast(cent)
    ).select(
        "query_id",
        F.col("cent_id"),
        F.round(
            dot(F.col("q_vec"), F.col("cent_vec"))
            / (F.col("_nrm") * F.col("cent_norm")),
            6,
        ).alias("csim"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("csim").desc(), F.col("cent_id")
    )
    probes = (
        scored_q.withColumn("crank", F.row_number().over(wq))
        .filter(F.col("crank") <= nprobe)
        .select("query_id", F.col("cent_id").alias("bucket"))
    )
    probed = q.join(probes, "query_id")

    scored = (
        bucketed.join(F.broadcast(probed), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def kmeans_fit(
    corpus: DataFrame,
    seed_centroids: DataFrame,
    dim: int,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means as pure DataFrame ops — the production centroid
    fit for :func:`ivf_topk` (whose docstring promises it as a drop-in).

    Per iteration: assign every vector to its nearest current centroid
    (:func:`nearest_assign` — the ×k fan-out collapses map-side, the
    corpus shuffles one row per vector), then recompute each centroid as
    the per-dimension mean of its members (``dim`` avg expressions in the
    SAME hash aggregate pipeline — k×dim-sized partials). The centroid
    set round-trips through the driver between iterations (k × dim
    floats — the codebook IS metadata, exactly what a broadcast would
    ship anyway), so each iteration is ONE Spark job, lineage never
    deepens, and empty clusters keep their previous centroid via a
    driver-side merge. Deterministic given seed centroids and a fixed
    iteration count.

    Returns (cent_id, centroid) with ``centroid`` as array<double>.
    """
    spark = corpus.sparkSession
    id_type = seed_centroids.schema[id_col].dataType.simpleString()
    codebook = dict(
        collect_codebook(
            seed_centroids.select(
                F.col(id_col).alias("cent_id"),
                as_double(F.col(vec_col)).alias("centroid"),
            ),
            "cent_id",
            "centroid",
        )
    )
    vecs = corpus.select(
        F.col(id_col).alias("_vid"), as_double(F.col(vec_col)).alias("_v")
    )
    cent_schema = f"cent_id {id_type}, centroid array<double>"
    for _ in range(iters):
        cent = spark.createDataFrame(
            sorted(codebook.items()), schema=cent_schema
        ).select(
            "cent_id",
            F.col("centroid").alias("cent_vec"),
            norm(F.col("centroid")).alias("cent_norm"),
        )
        assigned = nearest_assign(
            vecs, cent, "_vid", "_v", "cent_id", keep=("_v",), round_to=None
        )
        means = assigned.groupBy("cent_id").agg(
            F.array(*[F.avg(F.col("_v")[i]) for i in range(dim)]).alias("m")
        )
        for r in means.collect():  # k rows — metadata-sized
            codebook[r["cent_id"]] = [float(x) for x in r["m"]]
    return spark.createDataFrame(sorted(codebook.items()), schema=cent_schema)


# ---------------------------------------------------------------------------
# int8 quantization (memory/bandwidth-compressed similarity)
# ---------------------------------------------------------------------------


def int_dot(a: Column, b: Column) -> Column:
    """Left-fold dot product over INTEGER arrays — exact int64 math, no
    float summation order to worry about."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def quantize_int8(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``q_i = floor(x_i * 127 /
    max|x|)`` with the scale kept alongside — a 4× (vs float32) memory
    and shuffle-bandwidth cut for ANN at 100 TB, where the embedding
    column dominates I/O. ``floor`` rather than round: engines disagree
    on double→int rounding, floor is deterministic everywhere, and the
    half-ulp it gives up is noise next to the int8 step itself.

    Returns ``(id, qvec array<long>, qscale, qnorm)``; dot products over
    ``qvec`` are exact integer math (see :func:`int_dot`), so quantized
    cosine is bit-replayable in any engine — the oracle checks the
    quantizer, not a float tolerance."""
    v = as_double(F.col(vec_col))
    mx = F.array_max(F.transform(v, lambda x: F.abs(x)))
    qv = F.when(
        mx > 0,
        F.transform(v, lambda x: F.floor(x * 127.0 / mx).cast("long")),
    ).otherwise(F.transform(v, lambda x: F.lit(0).cast("long")))
    return df.select(
        F.col(id_col),
        qv.alias("qvec"),
        (mx / 127.0).alias("qscale"),
    ).withColumn("qnorm", F.sqrt(int_dot("qvec", "qvec").cast("double")))


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k over int8-quantized vectors — same plan shape as
    :func:`brute_force_topk` (broadcast queries, corpus never shuffles)
    but the quadratic inner loop runs integer multiply-adds over arrays a
    quarter the size. The float path stays as the recall baseline
    (tests/test_approx.py)."""
    qc = quantize_int8(corpus, id_col, vec_col)
    qq = quantize_int8(queries, id_col, vec_col)
    q = qq.select(
        F.col(id_col).alias("query_id"),
        F.col("qvec").alias("q_vec"),
        F.col("qnorm").alias("q_norm"),
    )
    scored = (
        qc.select(
            F.col(id_col).alias("neighbor_id"),
            F.col("qvec").alias("c_vec"),
            F.col("qnorm").alias("c_norm"),
        )
        .crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                int_dot(F.col("q_vec"), F.col("c_vec")).cast("double")
                / (F.col("q_norm") * F.col("c_norm")),
                6,
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
