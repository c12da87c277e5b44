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


def _ivf_oracle() -> str:
    cos_ac = _cos("a.v", "a.nrm", "c.cv", "c.cnrm")
    cos_qc = _cos("q.qv", "q.qn", "c.cv", "c.cnrm")
    cos_qn = _cos("q.qv", "q.qn", "b.v", "b.nrm")
    return f"""
WITH {_D},
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
)
SELECT query_id, neighbor_id, cosine_sim,
       CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id
       ) AS INTEGER) AS rank
FROM scored
QUALIFY rank <= {TOPK}
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
