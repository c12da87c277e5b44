"""Deterministic sampling + benchmark-contamination screening — the
selection/safety stages of a training-data pipeline.

Scale design:

- **Deterministic hash sampling**: keep a row iff a uniform value derived
  from md5(id‖salt) falls under the fraction. A pure filter — no shuffle,
  no RNG state, reproducible across runs/engines/partitionings (unlike
  ``df.sample``, whose output depends on partitioning). Stratified
  variant: per-stratum fractions via one CASE expression — still a pure
  filter.
- **Contamination screen**: n-gram (shingle) overlap of the corpus
  against a benchmark/eval set. One shuffle join keyed on shingle; the
  benchmark side is tiny in practice (broadcasts under AQE). This is the
  standard "did the eval set leak into training data" gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16-bit resolution is ample for sampling fractions and keeps the hex →
# int conversion cheap to replay in ANSI SQL
_BUCKETS = 1 << 16

# The weighted race needs a far finer draw: ties resolve by ascending id,
# so 16 bits would systematically favor low ids at corpus scale. 48 bits
# (12 hex chars) stay exactly representable in a double.
_WIDE_BUCKETS = 1 << 48


def hash_uniform(id_col: Column, salt: str) -> Column:
    """Deterministic uniform [0, 1) from md5(id ‖ salt) — the first 4 hex
    chars as a 16-bit integer over 65536 buckets."""
    nibble = F.conv(
        F.substring(F.md5(F.concat(id_col.cast("string"), F.lit(salt))), 1, 4),
        16,
        10,
    ).cast("double")
    return nibble / F.lit(float(_BUCKETS))


def sample_deterministic(
    df: DataFrame, id_col: str, fraction: float, salt: str = "s0"
) -> DataFrame:
    """Reproducible fraction sample: same ids survive regardless of
    partitioning, ordering, cluster size, or engine."""
    return df.filter(hash_uniform(F.col(id_col), salt) < fraction)


def sample_stratified(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "s0",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. domain re-weighting:
    keep 80% of books, 10% of web). One CASE expression — a pure filter,
    no per-stratum jobs."""
    frac: Column = F.lit(default_fraction)
    for value, f in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == value, F.lit(f)).otherwise(frac)
    return df.filter(hash_uniform(F.col(id_col), salt) < frac)


def split_assign(
    df: DataFrame,
    id_col: str,
    splits: list[tuple[str, float]],
    salt: str = "split",
) -> DataFrame:
    """Disjoint, exhaustive train/val/test assignment: each row gets
    exactly one split label by where its deterministic uniform draw falls
    among the cumulative fractions. ``splits`` is ordered
    [(label, fraction), …]; fractions must sum to 1 (the last split takes
    the remainder including rounding slack). A pure projection — no
    shuffle, stable under repartitioning, re-runs, and engine swaps, so a
    doc can never migrate between train and eval across pipeline runs
    (the property that actually matters for leakage)."""
    u = hash_uniform(F.col(id_col), salt)
    expr = F.lit(splits[-1][0])
    cum = 0.0
    bounds = []
    for label, frac in splits[:-1]:
        cum += frac
        bounds.append((label, cum))
    for label, bound in reversed(bounds):
        expr = F.when(u < F.lit(bound), F.lit(label)).otherwise(expr)
    return df.withColumn("split", expr)


def contamination_screen(
    corpus_shingles: DataFrame,
    benchmark_shingles: DataFrame,
    min_overlap: int,
) -> DataFrame:
    """Flag corpus docs sharing ≥ ``min_overlap`` distinct shingles with
    any benchmark doc. Inputs are (doc, shingle) tables (see
    ``dedup.doc_shingles``); output one row per contaminated corpus doc:
    (doc, n_benchmarks, max_overlap)."""
    bench = benchmark_shingles.select(
        F.col("doc").alias("bench_doc"), "shingle"
    )
    overlaps = (
        corpus_shingles.join(bench, "shingle")
        .filter(F.col("doc") != F.col("bench_doc"))
        .groupBy("doc", "bench_doc")
        .agg(F.count(F.lit(1)).alias("overlap"))
        .filter(F.col("overlap") >= min_overlap)
    )
    return overlaps.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_benchmarks"),
        F.max("overlap").alias("max_overlap"),
    )


def sample_group_cap(
    df: DataFrame,
    id_col: str,
    group_col: str,
    cap: int,
    salt: str = "s0",
) -> DataFrame:
    """Cap the number of rows kept per group (e.g. at most N documents
    per source domain — the anti-domination rule of crawl curation).
    Selection within a group follows the deterministic uniform hash (a
    reproducible "random" N, not the first N by id), tie-broken by id.

    One window over the group key: shuffle ∝ data, state ∝ group size.
    A pathologically hot group concentrates its rank computation on one
    reducer — for those, pre-filter with ``sample_deterministic`` at a
    fraction that overshoots the cap, then apply the exact cap to the
    survivors."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        hash_uniform(F.col(id_col), salt), F.col(id_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
        .drop("_rk")
    )


def shard_shuffle(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    salt: str = "ep1",
) -> DataFrame:
    """Deterministic epoch shuffle + shard assignment for training-data
    serving: every row gets ``(shard, pos)`` from a salted hash — a
    reproducible global permutation, readable shard by shard, identical
    on any cluster size, partitioning, or engine (change ``salt`` per
    epoch for a fresh permutation; no RNG state anywhere).

    Plan: ONE hash exchange (the window's partition on shard) and a
    per-shard sort. At 100 TB this holds because n_shards is chosen so a
    shard is task-sized (training shards are ~1 GB by construction —
    shard count scales WITH the data, the per-task sort does not).
    Hash ties are broken by the unique id, so ``pos`` is total and
    deterministic."""
    from pyspark.sql import Window

    u = hash_uniform(F.col(id_col), salt)
    w = Window.partitionBy("shard").orderBy(F.col("_u"), F.col(id_col))
    return (
        df.withColumn("_u", u)
        .withColumn(
            "shard", F.floor(F.col("_u") * n_shards).cast("int")
        )
        .withColumn("pos", F.row_number().over(w))
        .drop("_u")
    )


def sample_weighted_topk(
    df: DataFrame,
    id_col: str,
    weight: Column,
    k: int,
    salt: str = "w0",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, fixed size k (Efraimidis-
    Spirakis exponential race): each row draws a deterministic uniform
    from md5(id‖salt) and competes with key ``-ln(u)/w`` — the k
    smallest keys win, and inclusion probability tracks the weight.
    Same engine-portability contract as the other hash samplers (no RNG
    state, identical on any partitioning); the key is ROUNDED to 12 dp
    before ranking so a final-ulp ln() difference between engines can
    never flip the selected set, with the unique id as tie-break.

    The uniform draw takes 48 bits of the digest (12 hex chars — exactly
    representable in a double), not 16: at corpus scale a 65,536-value
    draw collides constantly and every collision resolves by ascending
    id, a systematic low-id bias. 48 bits put the collision knee past
    ~16M rows per weight class, and residual ties still break by id.
    Rows with NULL or non-positive weight are EXCLUDED before the race
    (w <= 0 means "never sample"; the key would otherwise be NULL or
    negative and sort first, always winning).

    Plan: a pure projection + TakeOrderedAndProject (bounded heap, no
    global sort) — the same shape as ext_topk, linear at any scale."""
    draw = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 12
        ),
        16,
        10,
    ).cast("double")
    # (n + 0.5)/2^48 keeps u strictly inside (0, 1): ln(0) is -inf in
    # one engine and NULL in the other — never let it happen
    u = (draw + F.lit(0.5)) / F.lit(float(_WIDE_BUCKETS))
    key = F.round(-F.log(u) / weight, 12)
    return (
        df.filter(weight.isNotNull() & (weight > 0))
        .withColumn("_wkey", key)
        .orderBy(F.col("_wkey"), F.col(id_col))
        .limit(k)
        .drop("_wkey")
    )
