"""Similarity-search queries over the embeddings table (north-star
extension: ANN for training-data pipelines).

The oracles replay the identical algorithms (same double-cast left-fold
dot products, same rounding, same tie-breaks), so brute-force AND the IVF
approximate path are both exact-checked — the IVF check validates
bucketing/probing, not just ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from component_iceberg_spark.io.tables import load_table
from component_iceberg_spark.operators import similarity as S
from component_iceberg_spark.plans.registry import register
from component_iceberg_spark.plans.scratch import scratch_warehouse

QUERY_IDS = (0, 17, 93)
NPROBE = 4
TOPK = 10
NEARDUP_THRESHOLD = 0.45  # fixture embeddings are well-separated (max ~0.51)

def _norm_cte(d: str = "d", n: str = "n") -> str:
    """The double-cast + L2-norm CTE pair, with caller-chosen CTE names so
    composed oracles (text_hybrid_topk) can avoid clashes."""
    return f"""
{d} AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
{n} AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
      FROM {d})
"""


_D = _norm_cte()

_DOT = "list_sum(list_transform(list_zip({a}, {b}), z -> z[1] * z[2]))"


def _cos(a_v: str, a_n: str, b_v: str, b_n: str) -> str:
    return f"round({_DOT.format(a=a_v, b=b_v)} / ({a_n} * {b_n}), 6)"


_TOPK_ORACLE = f"""
WITH {_D},
q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n
      WHERE vec_id IN {QUERY_IDS}),
scored AS (
    SELECT q.query_id, c.vec_id AS neighbor_id,
           {_cos('q.qv', 'q.qn', 'c.v', 'c.nrm')} AS cosine_sim
    FROM n c CROSS JOIN q
    WHERE c.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cosine_sim,
       CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id
       ) AS INTEGER) AS rank
FROM scored
QUALIFY rank <= {TOPK}
"""


@register("sim_topk_bruteforce", oracle=_TOPK_ORACLE, tags=("ext", "similarity"))
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for a broadcast query set — the correctness
    baseline every ANN variant is judged against."""
    e = load_table(spark, sf_dir, "embeddings")
    return S.brute_force_topk(
        e, e.filter(F.col("vec_id").isin(list(QUERY_IDS))), TOPK
    )


_NEARDUP_ORACLE = f"""
WITH {_D}
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       {_cos('a.v', 'a.nrm', 'b.v', 'b.nrm')} AS cosine_sim
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE {_cos('a.v', 'a.nrm', 'b.v', 'b.nrm')} >= {NEARDUP_THRESHOLD}
"""


@register("sim_neardup_embedding", oracle=_NEARDUP_ORACLE, tags=("ext", "similarity", "dedup"))
def sim_neardup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (threshold join). Threshold tuned to
    the fixture's separation; a production near-dup corpus uses ≥0.95 with
    an LSH/IVF pre-bucket instead of the brute self-join."""
    e = load_table(spark, sf_dir, "embeddings")
    return S.threshold_pairs(e, NEARDUP_THRESHOLD)


def _ivf_cte() -> str:
    """CTE chain ending in ``ivf(query_id, neighbor_id, cosine_sim,
    rank)`` — shared by the IVF oracle and the nDCG evaluation oracle so
    the retrieval stage cannot drift between them."""
    cos_ac = _cos("a.v", "a.nrm", "c.cv", "c.cnrm")
    cos_qc = _cos("q.qv", "q.qn", "c.cv", "c.cnrm")
    cos_qn = _cos("q.qv", "q.qn", "b.v", "b.nrm")
    return f"""{_D},
cent AS (
    SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm FROM (
        SELECT n.*, e.label,
               row_number() OVER (PARTITION BY e.label ORDER BY n.vec_id) AS rn
        FROM n JOIN embeddings e USING (vec_id)
    ) WHERE rn = 1
),
assign AS (
    SELECT vec_id AS neighbor_id, cent_id AS bucket FROM (
        SELECT a.vec_id, c.cent_id,
               row_number() OVER (
                   PARTITION BY a.vec_id ORDER BY {cos_ac} DESC, c.cent_id
               ) AS rn
        FROM n a CROSS JOIN cent c
    ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n
      WHERE vec_id IN {QUERY_IDS}),
probes AS (
    SELECT query_id, cent_id AS bucket FROM (
        SELECT q.query_id, c.cent_id,
               row_number() OVER (
                   PARTITION BY q.query_id ORDER BY {cos_qc} DESC, c.cent_id
               ) AS rn
        FROM q CROSS JOIN cent c
    ) WHERE rn <= {NPROBE}
),
scored AS (
    SELECT q.query_id, b.vec_id AS neighbor_id,
           {cos_qn} AS cosine_sim
    FROM probes p
    JOIN q ON q.query_id = p.query_id
    JOIN assign a2 ON a2.bucket = p.bucket
    JOIN n b ON b.vec_id = a2.neighbor_id
    WHERE b.vec_id <> q.query_id
),
ivf AS (
    SELECT query_id, neighbor_id, cosine_sim,
           CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id
           ) AS INTEGER) AS rank
    FROM scored
    QUALIFY rank <= {TOPK}
)"""


def _ivf_oracle() -> str:
    return f"""
WITH {_ivf_cte()}
SELECT query_id, neighbor_id, cosine_sim, rank FROM ivf
"""


@register("sim_ann_ivf", oracle=_ivf_oracle(), tags=("ext", "similarity"))
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k: nearest-centroid bucketing + nprobe probing.
    Centroids are the first vector of each label cluster (deterministic
    seed quantizer; production fits k-means — same plan). The oracle
    replays the same quantization, so the hash-match certifies the index
    structure itself. At 100 TB the bucket column becomes the table's
    partition key → probing prunes (1 - nprobe/n_centroids) of the scan."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "embeddings")
    w = Window.partitionBy("label").orderBy("vec_id")
    centroids = (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "label")
    )
    return S.ivf_topk(
        e,
        e.filter(F.col("vec_id").isin(list(QUERY_IDS))),
        centroids,
        NPROBE,
        TOPK,
    )


@register(
    "sim_ann_ivf_stored", oracle=_ivf_oracle(), tags=("ext", "similarity")
)
def sim_ann_ivf_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stored-index IVF layout end-to-end — the claim sim_ann_ivf's
    docstring makes ("at 100 TB the bucket column becomes the table's
    partition key") actually executed: assignments are computed ONCE at
    ingest (nearest_assign) and committed to the snapshot catalog
    HIVE-PARTITIONED BY BUCKET; the query side computes its probe list
    (the same rounded expression arithmetic as ivf_topk), collects the
    probed bucket ids (nprobe × |queries| values — metadata-sized), and
    reads the stored table with ``where="bucket IN (…)"`` so the scan
    PRUNES every unprobed partition at file-listing time. Same
    quantization, probing, rounding, and tie-breaks as sim_ann_ivf, so
    the SAME exact oracle gates it — the match proves the store/read/
    prune round-trip changes nothing but I/O."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "embeddings")
    w = Window.partitionBy("label").orderBy("vec_id")
    centroids = (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "label")
    )
    cent = centroids.select(
        F.col("vec_id").alias("cent_id"),
        F.col("embedding").alias("cent_vec"),
        S.norm(F.col("embedding")).alias("cent_norm"),
    )
    corpus = e.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_vec")
    )
    bucketed = S.nearest_assign(
        corpus, cent, "neighbor_id", "c_vec", "bucket", keep=("c_vec",)
    )
    cat = scratch_warehouse(sf_dir, "ivf_assign")
    cat.create_or_replace("ann", "ivf_assign", bucketed, partition_by=["bucket"])

    q = e.filter(F.col("vec_id").isin(list(QUERY_IDS))).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
    )
    scored_q = (
        q.withColumn("_nrm", S.norm(F.col("q_vec")))
        .crossJoin(F.broadcast(cent))
        .select(
            "query_id",
            "cent_id",
            F.round(
                S.dot(F.col("q_vec"), F.col("cent_vec"))
                / (F.col("_nrm") * F.col("cent_norm")),
                6,
            ).alias("csim"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("csim").desc(), F.col("cent_id")
    )
    probes = (
        scored_q.withColumn("crank", F.row_number().over(wq))
        .filter(F.col("crank") <= NPROBE)
        .select("query_id", F.col("cent_id").alias("bucket"))
    )
    # nprobe × |queries| bucket ids — the serving-side partition list
    bucket_ids = sorted({r["bucket"] for r in probes.collect()})
    stored = cat.read(
        spark, "ann", "ivf_assign",
        where=f"bucket IN ({', '.join(str(b) for b in bucket_ids)})",
    )
    scored = (
        stored.join(F.broadcast(q.join(probes, "query_id")), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(S.cosine(F.col("q_vec"), F.col("c_vec")), 6).alias(
                "cosine_sim"
            ),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(wr)).filter(
        F.col("rank") <= TOPK
    )


N_PLANES = 16
N_BANDS = 4


def _planes() -> list[list[float]]:
    """Deterministic random hyperplanes (seeded numpy), shared verbatim by
    the Spark expression and the generated oracle SQL."""
    import numpy as np

    rng = np.random.RandomState(7)
    return [[float(x) for x in rng.randn(64)] for _ in range(N_PLANES)]


def _hyperplane_oracle() -> str:
    planes = _planes()
    rows_per_band = N_PLANES // N_BANDS
    bit_exprs = []
    for j, plane in enumerate(planes):
        lit = "[" + ", ".join(repr(x) for x in plane) + "]"
        bit_exprs.append(
            f"CAST(list_sum(list_transform(list_zip(v, {lit}), "
            f"z -> z[1] * z[2])) >= 0 AS INTEGER) AS bit{j}"
        )
    band_rows = []
    for b in range(N_BANDS):
        key = " + ".join(
            f"bit{b * rows_per_band + r} * {1 << r}" for r in range(rows_per_band)
        )
        band_rows.append(f"SELECT doc, {b} AS band, {key} AS key FROM base")
    bands = " UNION ALL ".join(band_rows)
    cos = _cos("a.nv", "a.nn", "b.nv", "b.nn")
    return f"""
WITH {_D},
base AS (SELECT vec_id AS doc, v, {', '.join(bit_exprs)} FROM n),
nn AS (SELECT vec_id AS doc, v AS nv, nrm AS nn FROM n),
bands AS ({bands}),
cand AS (
    SELECT DISTINCT x.doc AS vec_a, y.doc AS vec_b
    FROM bands x JOIN bands y
      ON x.band = y.band AND x.key = y.key AND x.doc < y.doc
)
SELECT vec_a, vec_b, {cos} AS cosine_sim
FROM cand
JOIN nn a ON a.doc = vec_a
JOIN nn b ON b.doc = vec_b
WHERE {cos} >= {NEARDUP_THRESHOLD}
"""


@register(
    "sim_ann_hyperplane",
    oracle=_hyperplane_oracle(),
    tags=("ext", "similarity", "dedup"),
)
def sim_ann_hyperplane(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH near-threshold pairs (angular LSH, 16 planes
    banded 4×4) with exact-cosine verification — the bucketed scale path
    for the embedding near-dup join (vs. the brute self-join ground truth
    in sim_neardup_embedding). Oracle replays the identical planes/banding,
    certifying the index construction."""
    from component_iceberg_spark.operators.similarity import hyperplane_lsh_pairs

    e = load_table(spark, sf_dir, "embeddings")
    return hyperplane_lsh_pairs(e, _planes(), N_BANDS, NEARDUP_THRESHOLD)


PQ_SUB = 64 // S.PQ_M  # subspace width (embeddings are 64-dim)

_PQ_DIST = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "z -> (z[1] - z[2]) * (z[1] - z[2])))"
)


def _pq_oracle() -> str:
    """SQL twin of operators.similarity.pq_topk: same unit normalization,
    same codebook (sub-slices of the lowest-id vectors), same squared-L2
    left-folds (bit-identical to numpy's sequential reduce over
    <128-element axes), same first-min code tie-break, same fixed
    subspace-order ADC sum, same shortlist/re-rank boundaries."""
    m, k, rr = S.PQ_M, S.PQ_K, S.PQ_RERANK

    def slc(v: str) -> str:
        return f"list_slice({v}, cb.m * {PQ_SUB} + 1, cb.m * {PQ_SUB} + {PQ_SUB})"

    enc_dist = _PQ_DIST.format(a=slc("x.uv"), b="cb.cv")
    lut_dist = _PQ_DIST.format(a=slc("q.uv"), b="cb.cv")
    cos_exact = _cos("qn.v", "qn.nrm", "cn.v", "cn.nrm")
    return f"""
WITH {_D},
u AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS uv FROM n),
seeds AS (SELECT vec_id AS j, uv FROM u ORDER BY vec_id LIMIT {k}),
cb AS (
    SELECT mm.m, seeds.j,
           list_slice(seeds.uv, mm.m * {PQ_SUB} + 1, mm.m * {PQ_SUB} + {PQ_SUB}) AS cv
    FROM seeds CROSS JOIN (SELECT unnest(range({m})) AS m) mm
),
codes AS (
    SELECT vec_id, m, j AS code FROM (
        SELECT x.vec_id, cb.m, cb.j,
               row_number() OVER (
                   PARTITION BY x.vec_id, cb.m
                   ORDER BY {enc_dist} ASC, cb.j
               ) AS rn
        FROM u x CROSS JOIN cb
    ) WHERE rn = 1
),
lut AS (
    SELECT q.vec_id AS query_id, cb.m, cb.j, {lut_dist} AS dd
    FROM u q CROSS JOIN cb WHERE q.vec_id IN {QUERY_IDS}
),
adc AS (
    -- list(dd ORDER BY m) then list_sum: the same left-to-right
    -- subspace-order fold as the numpy kernel, without an m-way self-join
    SELECT l.query_id, c.vec_id AS neighbor_id,
           list_sum(list(l.dd ORDER BY l.m)) AS dist
    FROM codes c JOIN lut l ON l.m = c.m AND l.j = c.code
    WHERE c.vec_id <> l.query_id
    GROUP BY l.query_id, c.vec_id
),
shortlist AS (
    SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY dist ASC, neighbor_id
               ) AS srank
        FROM adc
    ) WHERE srank <= {rr}
)
SELECT s.query_id, s.neighbor_id,
       {cos_exact} AS cosine_sim,
       CAST(row_number() OVER (
           PARTITION BY s.query_id
           ORDER BY {cos_exact} DESC, s.neighbor_id
       ) AS INTEGER) AS rank
FROM shortlist s
JOIN n qn ON qn.vec_id = s.query_id
JOIN n cn ON cn.vec_id = s.neighbor_id
QUALIFY rank <= {TOPK}
"""


@register("sim_ann_pq", oracle=_pq_oracle(), tags=("ext", "similarity"))
def sim_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized ANN top-10: ADC shortlist (8 sub-codes per
    vector — a 32× scan-bandwidth cut vs float32 at 100 TB) then exact
    cosine re-rank of the best 50 (operators/similarity.pq_topk). The
    oracle replays normalization, codebook construction, encoding, the
    ADC shortlist, and the re-rank exactly, so the gate validates the
    quantizer itself — not just the final list. Recall vs the exact
    baseline is pinned by tests/test_approx.py."""
    e = load_table(spark, sf_dir, "embeddings")
    return S.pq_topk(
        e, e.filter(F.col("vec_id").isin(list(QUERY_IDS))), TOPK
    )


@register("sim_ann_pq_stored", oracle=_pq_oracle(), tags=("ext", "similarity"))
def sim_ann_pq_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stored-codes PQ layout end-to-end: encode the corpus ONCE and
    commit the (id, codes) table to the snapshot catalog (pq_encode —
    the ingest-time write, 32× smaller than the embedding column), then
    serve the query by scanning ONLY the codes table (pq_topk_from_codes;
    embeddings are touched solely by the candidate-sized re-rank join).
    Same codebook, boundaries, and re-rank as sim_ann_pq, so the SAME
    exact oracle gates it — the check proves the store/read round-trip
    changes nothing but I/O."""

    cat = scratch_warehouse(sf_dir, "pq_codes")
    e = load_table(spark, sf_dir, "embeddings")
    codes, codebook = S.pq_encode(e)
    cat.create_or_replace("ann", "pq_codes", codes)
    stored = cat.read(spark, "ann", "pq_codes")
    return S.pq_topk_from_codes(
        stored,
        e,
        e.filter(F.col("vec_id").isin(list(QUERY_IDS))),
        codebook,
        TOPK,
    )


@register("ext_pca_project", oracle=None, tags=("ext", "similarity", "stats"))
def ext_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA over the embedding corpus (fit on ALL vectors, project the 20
    lowest ids): whitening / visualization / decorrelation — the standard
    pre-step before clustering or semantic dedup at corpus scale. The fit
    is one zero-shuffle pass emitting (n, Σx, XᵀX) partials per Arrow
    batch (operators/similarity.pca_fit — O(d²) state per partition, the
    data never moves); projection is a broadcast matmul per batch
    (pca_project). No SQL oracle — eigendecomposition isn't expressible
    in DuckDB SQL — so the driver records the rows-only check; the exact
    cross-validation against a single-node numpy PCA (same
    canonicalization) lives in tests/test_approx.py."""
    e = load_table(spark, sf_dir, "embeddings")
    mean, comps, ratio = S.pca_fit(e, k=2)
    proj = S.pca_project(e.filter(F.col("vec_id") < 20), mean, comps)
    return proj.select(
        "vec_id",
        F.round("pc1", 4).alias("pc1"),
        F.round("pc2", 4).alias("pc2"),
        F.round(F.lit(float(ratio[0])), 4).alias("explained_1"),
        F.round(F.lit(float(ratio[1])), 4).alias("explained_2"),
    )


KNN_K = 3


def _knn_clusters_oracle() -> str:
    cos_ac = _cos("a.v", "a.nrm", "c.cv", "c.cnrm")
    cos_qc = _cos("q.qv", "q.qn", "c.cv", "c.cnrm")
    cos_qn = _cos("q.qv", "q.qn", "b.v", "b.nrm")
    return f"""
WITH RECURSIVE {_D},
cent AS (
    SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm FROM (
        SELECT n.*, e.label,
               row_number() OVER (PARTITION BY e.label ORDER BY n.vec_id) AS rn
        FROM n JOIN embeddings e USING (vec_id)
    ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n),
assign AS (
    SELECT vec_id AS neighbor_id, cent_id AS bucket FROM (
        SELECT a.vec_id, c.cent_id,
               row_number() OVER (
                   PARTITION BY a.vec_id ORDER BY {cos_ac} DESC, c.cent_id
               ) AS rn
        FROM n a CROSS JOIN cent c
    ) WHERE rn = 1
),
probes AS (
    SELECT query_id, cent_id AS bucket FROM (
        SELECT q.query_id, c.cent_id,
               row_number() OVER (
                   PARTITION BY q.query_id ORDER BY {cos_qc} DESC, c.cent_id
               ) AS rn
        FROM q CROSS JOIN cent c
    ) WHERE rn <= {NPROBE}
),
knn AS (
    SELECT query_id, neighbor_id FROM (
        SELECT s.query_id, s.neighbor_id,
               row_number() OVER (
                   PARTITION BY s.query_id
                   ORDER BY s.cosine_sim DESC, s.neighbor_id
               ) AS rank
        FROM (
            SELECT q.query_id, b.vec_id AS neighbor_id,
                   {cos_qn} AS cosine_sim
            FROM probes p
            JOIN q ON q.query_id = p.query_id
            JOIN assign a2 ON a2.bucket = p.bucket
            JOIN n b ON b.vec_id = a2.neighbor_id
            WHERE b.vec_id <> q.query_id
        ) s
    ) WHERE rank <= {KNN_K}
),
me AS (
    SELECT k1.query_id AS a, k1.neighbor_id AS b
    FROM knn k1 JOIN knn k2
      ON k2.query_id = k1.neighbor_id AND k2.neighbor_id = k1.query_id
    WHERE k1.query_id < k1.neighbor_id
),
und AS (SELECT a, b FROM me UNION ALL SELECT b, a FROM me),
reach AS (
    SELECT vec_id AS id, vec_id AS r FROM n
    UNION
    SELECT reach.id, u.b FROM reach JOIN und u ON u.a = reach.r
),
lbl AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)
SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members
FROM lbl GROUP BY cluster_id
"""


@register("sim_knn_graph_clusters", oracle=_knn_clusters_oracle(),
          tags=("ext", "similarity", "graph", "dedup"))
def sim_knn_graph_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-kNN-graph clustering — the similarity family's capstone
    composite and the standard corpus-structure discovery pass (SemDeDup
    / SSL-prototype style): build each vector's IVF top-3 neighbor list
    with the corpus AS the query set (the probe join SHUFFLES on the
    bucket key — `broadcast_probes=False` — because nothing is small
    when the queries are the corpus), keep edges that are MUTUAL (a
    robust-to-hubs symmetrization), then pointer-jumping connected
    components; every vector lands in a cluster (singletons = its own
    id). The oracle replays quantization, probing, ranking, mutuality
    AND the transitive closure. At 100 TB: assignment is the zero-
    shuffle BLAS scan, the knn self-join shuffles once on bucket, and
    CC is O(log diameter) rounds on the mutual-edge relation, which is
    ≤ 3n/2 edges by construction."""
    from pyspark.sql import Window

    from component_iceberg_spark.operators.dedup import connected_components

    e = load_table(spark, sf_dir, "embeddings")
    w = Window.partitionBy("label").orderBy("vec_id")
    centroids = (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "label")
    )
    knn = S.ivf_knn_graph(e, centroids, NPROBE, KNN_K).select(
        "query_id", "neighbor_id"
    )
    x, y = knn.alias("x"), knn.alias("y")
    mutual = (
        x.join(
            y,
            (F.col("x.query_id") == F.col("y.neighbor_id"))
            & (F.col("x.neighbor_id") == F.col("y.query_id")),
        )
        .filter(F.col("x.query_id") < F.col("x.neighbor_id"))
        .select(
            F.col("x.query_id").alias("a"), F.col("x.neighbor_id").alias("b")
        )
    )
    labels = connected_components(mutual, "a", "b")
    return (
        e.select("vec_id")
        .join(labels, F.col("vec_id") == F.col("doc"), "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", "vec_id"))
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_members"))
    )


# ---------------------------------------------------------------------------
# Retrieval-quality evaluation: nDCG@k of the IVF retriever (r7)
# ---------------------------------------------------------------------------


def _ndcg_oracle() -> str:
    return f"""
WITH {_ivf_cte()},
lab AS (SELECT vec_id, label FROM embeddings),
rel AS (
    SELECT i.query_id, i.rank,
           CASE WHEN nl.label = ql.label THEN 1 ELSE 0 END AS rel
    FROM ivf i
    JOIN lab nl ON nl.vec_id = i.neighbor_id
    JOIN lab ql ON ql.vec_id = i.query_id
),
dcg AS (
    SELECT query_id,
           list_sum(list(rel * 1.0 / log2(rank + 1) ORDER BY rank)) AS dcg
    FROM rel GROUP BY query_id
),
nrel AS (
    SELECT q.vec_id AS query_id,
           least({TOPK}, count(*)) AS m
    FROM embeddings q
    JOIN embeddings c ON c.label = q.label AND c.vec_id <> q.vec_id
    WHERE q.vec_id IN {QUERY_IDS}
    GROUP BY 1
),
idcg AS (
    SELECT query_id,
           list_sum(list_transform(range(1, m + 1),
                                   r -> 1.0 / log2(r + 1))) AS idcg
    FROM nrel
)
SELECT d.query_id,
       round(d.dcg, 6) AS dcg,
       round(i.idcg, 6) AS idcg,
       round(d.dcg / i.idcg, 6) AS ndcg
FROM dcg d JOIN idcg i USING (query_id)
"""


@register("ext_ndcg_eval", oracle=_ndcg_oracle(), tags=("ext", "similarity", "eval"))
def ext_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality read-out: nDCG@10 of the IVF retriever against
    label relevance (a retrieved neighbor is relevant iff it shares the
    query's label) — the evaluation loop every retriever/re-ranker ships
    with, closing the stack: generate (ANN) → fuse → re-rank → EVALUATE.
    IDCG uses the corpus-wide relevant count capped at k (the standard
    'ideal ranking over the whole collection' convention), so a perfect
    retriever scores exactly 1.0.

    Determinism: per-query DCG folds its ≤k terms in RANK ORDER via an
    order-pinned array fold (a bare sum() would add in partition order,
    which can vary run to run); the oracle's list(… ORDER BY rank) +
    list_sum is the same fold. Cross-engine log2 ulps are absorbed by
    the 6 dp round like every float aggregate here. Plan: the IVF search
    plan + two label joins (label relation broadcasts) + a k-row-per-
    query fold — evaluation adds nothing that doesn't scale."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "embeddings")
    w = Window.partitionBy("label").orderBy("vec_id")
    centroids = (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "label")
    )
    ivf = S.ivf_topk(
        e, e.filter(F.col("vec_id").isin(list(QUERY_IDS))), centroids,
        NPROBE, TOPK,
    )
    lab = e.select("vec_id", "label")
    rel = (
        ivf.join(
            lab.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("nl"),
            ),
            "neighbor_id",
        )
        .join(
            lab.select(
                F.col("vec_id").alias("query_id"), F.col("label").alias("ql")
            ),
            "query_id",
        )
        .select(
            "query_id",
            "rank",
            F.when(F.col("nl") == F.col("ql"), 1).otherwise(0).alias("rel"),
        )
    )
    term = F.col("rel") * 1.0 / F.log2(F.col("rank") + 1)
    dcg = (
        rel.select("query_id", F.struct("rank", term.alias("t")).alias("rt"))
        .groupBy("query_id")
        .agg(F.sort_array(F.collect_list("rt")).alias("terms"))
        .select(
            "query_id",
            F.aggregate(
                "terms", F.lit(0.0), lambda acc, x: acc + x["t"]
            ).alias("dcg"),
        )
    )
    nrel = (
        e.filter(F.col("vec_id").isin(list(QUERY_IDS)))
        .alias("q")
        .join(
            e.alias("c"),
            (F.col("c.label") == F.col("q.label"))
            & (F.col("c.vec_id") != F.col("q.vec_id")),
        )
        .groupBy(F.col("q.vec_id").alias("query_id"))
        .agg(F.least(F.lit(TOPK), F.count(F.lit(1))).alias("m"))
    )
    idcg = nrel.select(
        "query_id",
        F.aggregate(
            F.sequence(F.lit(1), F.col("m").cast("int")),
            F.lit(0.0),
            lambda acc, r: acc + F.lit(1.0) / F.log2((r + 1).cast("double")),
        ).alias("idcg"),
    )
    return dcg.join(idcg, "query_id").select(
        "query_id",
        F.round("dcg", 6).alias("dcg"),
        F.round("idcg", 6).alias("idcg"),
        F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg"),
    )


# ---------------------------------------------------------------------------
# MMR diversification over the retrieval candidates (r7)
# ---------------------------------------------------------------------------

MMR_LAMBDA = 0.7   # relevance weight; 0.3 = redundancy penalty weight
MMR_SELECT = 5     # diversified results per query (from TOPK candidates)


def _mmr_oracle() -> str:
    """Unrolled greedy replay (the BPE-chain pattern): candidates = the
    brute-force top-K, pairwise candidate cosines, then MMR_SELECT CTE
    steps each anti-joining the already-selected set, scoring remaining
    candidates with the identical lam*rel - (1-lam)*max_sim composition
    and picking the (score DESC, neighbor_id) argmax. The argmax runs on
    the RAW double (both engines compose identical rounded-6 inputs, so
    the doubles are bit-equal); only the reported score is rounded."""
    cos_qc = _cos("q.qv", "q.qn", "c.v", "c.nrm")
    cos_ab = _cos("va.v", "va.nrm", "vb.v", "vb.nrm")
    lam, pen = MMR_LAMBDA, round(1 - MMR_LAMBDA, 1)
    sql = f"""
WITH {_D},
q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n
      WHERE vec_id IN {QUERY_IDS}),
cands AS (
    SELECT query_id, neighbor_id, cosine_sim FROM (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               {cos_qc} AS cosine_sim,
               row_number() OVER (
                   PARTITION BY q.query_id
                   ORDER BY {cos_qc} DESC, c.vec_id
               ) AS rank
        FROM n c CROSS JOIN q
        WHERE c.vec_id <> q.query_id
    ) WHERE rank <= {TOPK}
),
pair AS (
    SELECT a.query_id, a.neighbor_id AS i, b.neighbor_id AS j,
           {cos_ab} AS s
    FROM cands a
    JOIN cands b ON a.query_id = b.query_id
                AND a.neighbor_id <> b.neighbor_id
    JOIN n va ON va.vec_id = a.neighbor_id
    JOIN n vb ON vb.vec_id = b.neighbor_id
),
selu1 AS (
    SELECT query_id, neighbor_id, 1 AS mmr_rank,
           {lam} * cosine_sim - {pen} * 0.0 AS raw
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id
            ORDER BY {lam} * cosine_sim - {pen} * 0.0 DESC, neighbor_id
        ) AS rn FROM cands
    ) WHERE rn = 1
)"""
    for t in range(2, MMR_SELECT + 1):
        prev = f"selu{t - 1}"
        sql += f""",
step{t} AS (
    SELECT query_id, neighbor_id, {t} AS mmr_rank, raw FROM (
        SELECT c.query_id, c.neighbor_id,
               {lam} * c.cosine_sim - {pen} * ms.m AS raw,
               row_number() OVER (
                   PARTITION BY c.query_id
                   ORDER BY {lam} * c.cosine_sim - {pen} * ms.m DESC,
                            c.neighbor_id
               ) AS rn
        FROM cands c
        LEFT JOIN {prev} done
               ON done.query_id = c.query_id
              AND done.neighbor_id = c.neighbor_id
        JOIN (SELECT p.query_id, p.i, max(p.s) AS m
              FROM pair p
              JOIN {prev} s ON s.query_id = p.query_id
                           AND s.neighbor_id = p.j
              GROUP BY 1, 2) ms
          ON ms.query_id = c.query_id AND ms.i = c.neighbor_id
        WHERE done.neighbor_id IS NULL
    ) WHERE rn = 1
),
selu{t} AS (SELECT * FROM {prev} UNION ALL SELECT * FROM step{t})"""
    sql += f"""
SELECT query_id, neighbor_id, CAST(mmr_rank AS INTEGER) AS mmr_rank,
       round(raw, 6) AS mmr_score
FROM selu{MMR_SELECT}
"""
    return sql


@register("sim_mmr_diversify", oracle=_mmr_oracle(), tags=("ext", "similarity"))
def sim_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance — the diversification stage that
    completes the retrieval stack (generate → fuse → re-rank →
    DIVERSIFY): from each query's brute-force top-K, greedily pick
    MMR_SELECT results maximizing ``lam·relevance − (1−lam)·max
    similarity to the already-picked`` — the standard dedup-at-serving
    move when the top of the ranking is dominated by near-duplicates.

    Scale shape: relevance and the candidate×candidate cosines are
    computed as codegen'd expressions (K-bounded: K² pairs per query);
    the inherently SEQUENTIAL greedy loop runs per query inside ONE
    applyInPandas kernel over K·(K−1) pre-scored rows — queries
    parallelize across executors, no driver loop, no Python dot
    products (the kernel only composes the already-rounded sims, so
    both engines argmax bit-identical doubles; ties break on
    neighbor_id). The oracle replays the greedy loop as MMR_SELECT
    unrolled CTE steps."""
    import pandas as pd

    e = load_table(spark, sf_dir, "embeddings")
    cands = S.brute_force_topk(
        e, e.filter(F.col("vec_id").isin(list(QUERY_IDS))), TOPK
    )
    vec = e.select(
        "vec_id",
        S.as_double(F.col("embedding")).alias("v"),
        S.norm(F.col("embedding")).alias("nrm"),
    )
    a = (
        cands.select(
            "query_id",
            F.col("neighbor_id").alias("i"),
            F.col("cosine_sim").alias("rel"),
        )
        .join(vec, F.col("i") == F.col("vec_id"))
        .select("query_id", "i", "rel",
                F.col("v").alias("vi"), F.col("nrm").alias("ni"))
    )
    b = (
        cands.select("query_id", F.col("neighbor_id").alias("j"))
        .join(vec, F.col("j") == F.col("vec_id"))
        .select("query_id", "j",
                F.col("v").alias("vj"), F.col("nrm").alias("nj"))
    )
    # self-pairs (i == j) stay IN so a query with a single candidate
    # still reaches the kernel (the oracle's selu1 emits its rank-1 row
    # regardless of pair count); the kernel ignores them when scoring
    pairs = (
        a.join(b, "query_id")
        .select(
            "query_id", "i", "rel", "j",
            F.round(
                S.dot_raw(F.col("vi"), F.col("vj"))
                / (F.col("ni") * F.col("nj")),
                6,
            ).alias("s"),
        )
    )

    lam, pen, m_out = MMR_LAMBDA, round(1 - MMR_LAMBDA, 1), MMR_SELECT

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = pdf["query_id"].iloc[0]
        rel = dict(pdf.groupby("i")["rel"].first())
        sim = {(r.i, r.j): r.s for r in pdf.itertuples() if r.i != r.j}
        selected, rows = [], []
        remaining = sorted(rel)
        for step in range(1, m_out + 1):
            if not remaining:
                break
            best_i, best_raw = None, None
            for i in remaining:  # ascending id -> strict > keeps smallest on ties
                maxs = max((sim[(i, j)] for j in selected), default=0.0)
                raw = lam * rel[i] - pen * maxs
                if best_raw is None or raw > best_raw:
                    best_i, best_raw = i, raw
            selected.append(best_i)
            remaining.remove(best_i)
            rows.append((qid, best_i, step, best_raw))
        return pd.DataFrame(
            rows, columns=["query_id", "neighbor_id", "mmr_rank", "mmr_score"]
        )

    out = pairs.groupBy("query_id").applyInPandas(
        greedy,
        schema="query_id long, neighbor_id long, mmr_rank int, mmr_score double",
    )
    return out.select(
        "query_id", "neighbor_id", "mmr_rank",
        F.round("mmr_score", 6).alias("mmr_score"),
    )
