#!/usr/bin/env python3
"""Headline benchmark: runs the engine's representative queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is forced through full execution with the noop sink (count()
would let Catalyst short-circuit column work). Timings are wall-clock per
query on a warm session; `value` is the total.

Scale-evidence section (`sf1` key in the JSON): a 10× fixture derived
from the sf0.1 tables at CONSTANT cluster/duplicate density — each of 10
replicas keeps the base data's internal structure, with keys offset,
labels made replica-distinct (so quantizer-based ops see 10× clusters of
the SAME size, not 10×-bigger buckets) and embeddings shifted by a large
per-replica vector (so LSH does not collide replicas into artificial
cross-replica near-dup pairs). The five historically most expensive
queries run once each at sf1; near-linear wall-clock vs their sf0.1
numbers is the claim being evidenced. Set SPARK_GRAFT_SKIP_SF1=1 to skip.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from component_iceberg_spark.plans import load_all  # noqa: E402
from component_iceberg_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.abspath(__file__))
SF1_DIR = os.path.join(REPO, ".scale", "sf1")
SF1_REPLICAS = 10
# 30x spot-check (VERDICT r4 ask #7): one extra point on the scaling
# curve for the dedup family, to confirm the candidate-volume curve holds
# past 10x. Only the two tables those queries read are materialized.
SF3_DIR = os.path.join(REPO, ".scale", "sf3")
SF3_REPLICAS = 30
SF3_QUERIES = (
    "dedup_semantic",
    "dedup_minhash_lsh",
    # r7: the vocabulary-bound claim, one more decade out — BPE fit+encode
    # over 30× corpus should grow only in the two corpus passes (token
    # aggregate + encode join), never in the per-round merge work
    "text_bpe_encode",
    # r8: the winnowing pair join's candidate volume one more decade out:
    # constant-density replication keeps per-fingerprint df flat, so the
    # df-capped pair counts should grow ~linearly with the corpus, never
    # quadratically
    "text_winnow_fingerprint",
    # r9 (VERDICT r8 stretch): extend the 30x curve beyond the dedup
    # family — the histogram-prefix budget twin's two corpus passes, and
    # the salted grid join (constant-AREA fixture, so 30x density: pair
    # OUTPUT grows ~quadratically in occupancy by construction — the wall
    # tracks output, per the r8 salting-boundary note, not a shuffle
    # defect)
    "pipeline_token_budget_scalable",
    "ext_spatial_grid_join_salted",
    # r10: the join-idiom family one more decade out — the fused chain's
    # post-agg relation is (part x nation)-bounded and the rolling
    # outlier's windowed relation is (brand x flag x month)-bounded, so
    # both walls should track the 30x fact scans through the join chain,
    # never the downstream relations
    "ext_join_multipass_fused",
    "ext_window_rolling_outlier",
    # r11 (VERDICT r10 #6): the trailing-distinct-users watch item — its
    # sf1 wall ratio (3.54x) tracks the distinct (day, user) PAIR volume
    # (constant-density replication offsets user ids, so pairs grow with
    # the replicas), while event-volume independence is pinned by the
    # doubled-events shuffle test; the 30x row extends the pair-volume
    # curve one more decade
    "ext_active_users_trailing",
    # r11 continuation: the pattern matcher is ONE window over the full
    # event stream (wall should track the keyed exchange ~linearly);
    # the interpolator is calendar-spine-bounded after its daily
    # pre-aggregation (wall should be ~flat past the fact scans)
    "ext_pattern_negation",
    "ext_interpolate_linear",
    # r12 (VERDICT r11 #7): the q23 capstone's first 30x row — two fused
    # fact passes with a localCheckpoint'ed metadata-sized discovery
    # relation; the wall should track the two fact scans and the grouped
    # relation stay (part x month)-bounded
    "ext_frequent_best_readout",
)

# Representative slice of the registry: scan, agg, joins, windows,
# mutation, dedup (exact + LSH), text, similarity, streaming ingest.
HEADLINE = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "scan_projection",
    "ext_window_rank",
    "ext_sessionize",
    "ext_agg_rollup",
    "upsert_by_key",
    "dedup_last_wins",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_quality",
    "sim_topk_bruteforce",
    "sim_ann_ivf",
    "sim_ann_hyperplane",
    "stream_window_counts",
    "sink_parquet",
    "ext_asof_join",
    "ext_range_join",
    "ext_global_rank",
    "func_json",
    "snap_compact",
    # round-2 additions: cluster formation, frame fan-out, sampling
    "dedup_clusters",
    "mm_frame_features",
    "ext_sample_stratified",
    # round-2 late additions: TPC-H depth, span dedup, semantic dedup
    "q21_waiting_supplier",
    "text_span_dedup",
    "dedup_semantic",
)

# The 5 historically most expensive headline queries plus the dedup/text
# family — the sf1 section re-runs these to evidence the scaling shape
# (LSH candidate volume, CC rounds, IVF probe cost, streaming state,
# compaction I/O, shingle/shuffle volume).
SCALE_QUERIES = (
    "dedup_semantic",
    "sim_ann_hyperplane",
    "stream_window_counts",
    "sim_ann_ivf",
    "snap_compact",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "text_span_dedup",
    "q3_shipping_priority",
    "q21_waiting_supplier",
    "upsert_by_key",
    "dedup_last_wins",
    "ext_sessionize",
    # late-r5: interval-overlap join — the equi-key + band shape's
    # candidate volume must stay linear in replicas (keys are offset per
    # replica, so co-shipment groups never cross replicas)
    "ext_interval_join",
    # r7 additions (ROADMAP item 5, unfrozen once their r6 gate rows
    # landed): PQ ADC shortlist + exact re-rank, and the Misra-Gries
    # candidates + exact-verify heavy hitters — both claim sub-linear
    # per-row cost, which the 10x ratio evidences
    "sim_ann_pq",
    "ext_heavy_hitters",
    # r7 second wave: containment's df-cap interaction with replication
    # (common shingles cross the cap at 10x — candidate volume must not
    # blow up), the stored-index partition-pruned serving path, and the
    # vocabulary-bound BPE fit (should be ~flat in corpus size)
    "dedup_containment",
    "sim_ann_ivf_stored",
    "text_bpe_merges",
    # r7 third wave: the grid distance join's candidate volume must track
    # point density (cells scale with replicas, 3×3 neighborhoods stay
    # local), and the DPP join's fact scan must stay partition-bounded —
    # at 10× its wall should track the SURVIVING partitions, not the table
    "ext_spatial_grid_join",
    "snap_dpp_join",
    # r7 fifth wave: the skyline's staircase must stay |distinct prices|-
    # bounded while the corpus shuffle grows 10×; BPE encode adds one
    # corpus join pass over the flat fit — together they bracket the
    # "collapse then join back" pattern's scaling
    "ext_skyline",
    "text_bpe_encode",
    # r7 sixth wave: the per-source window sort is the only corpus-sized
    # stage in the budget pipeline — its wall should track the sort, with
    # the fixed 20k budget making the output CONSTANT across scale
    "pipeline_token_budget",
    # r7 seventh wave: greedy packing is an O(group) integer kernel per
    # source — at 10x each source's stream is 10x longer but sources
    # still parallelize, so wall should be ~linear with no shuffle growth
    # beyond the single hash Exchange on source
    "pipeline_pack_sequences",
    # r11 continuation: one keyed window over 10x events (pattern
    # matcher — ~linear) and the spine-bounded interpolator (~flat past
    # the fact scans); both also carry 30x rows in SF3_QUERIES
    "ext_pattern_negation",
    "ext_interpolate_linear",
    # r8 wave: the last r7 corpus-sized ops whose 10x candidate volume
    # hasn't been measured (winnow's fingerprint-pair join; the
    # temperature sampler's hash-filter scan; MMR's greedy kernel over a
    # fixed top-k shortlist — should be ~flat), plus the two scalable
    # twins: histogram-prefix budget selection (the per-source sort is
    # gone — wall should track the two corpus passes) and sharded packing
    # (same kernel, 8x smaller max task)
    "text_winnow_fingerprint",
    "pipeline_temperature_mix",
    "sim_mmr_diversify",
    "pipeline_token_budget_scalable",
    "pipeline_pack_sequences_sharded",
    # the salted grid join should track its plain twin's ratio (the
    # fixture has no extreme hot cell; the row proves salting costs
    # nothing when density is mild)
    "ext_spatial_grid_join_salted",
    # r8 second wave: the TPC-DS windows claim metadata-sized windowed
    # relations (days / grouping sets) — their 10x wall should track the
    # fact-scan aggregate only; the leakage split adds the CC + broadcast
    # path on 10x the pair volume
    "ext_window_crossover",
    "ext_rollup_rank",
    "pipeline_split_leakage_safe",
    # r10 wave: the deep-join idioms. The multipass chain's two year
    # passes each scan one year of a 10x fact through 4 growing SMJs —
    # wall should track the fact scans (the cross-year join input is
    # items x nations, metadata-sized). The intersect-join and rolling
    # windows claim ONE fact pass with metadata-sized post-agg relations.
    "ext_join_multipass",
    "ext_join_multipass_fused",
    "ext_intersect_join",
    "ext_window_rolling_outlier",
    "ext_active_users_trailing",
    # r11: the q23 capstone claims exactly two fact passes with a
    # checkpointed metadata-sized discovery relation — its 10x wall
    # should track the two fact scans
    "ext_frequent_best_readout",
    # r13: the range-compressed DV apply claims a shuffle-free,
    # run-count-bounded broadcast probe at ANY delete density — at 10x
    # the dense band deletes 10x the rows but the broadcast payload
    # stays a handful of (start, end) runs per file, so the wall should
    # track the table scans (write + addressing + read), never the
    # deleted-row count
    "snap_delete_dv_ranges",
    # r14: the auto-dispatch matrix at 10x. Each lane is a full
    # create + mutate + read cycle, so the wall should track the table
    # scans ~linearly; the dispatch itself must contribute nothing that
    # scales worse — the stats-served range lane decides from footer
    # metadata (file-count-sized driver reads), the modulo lanes pay
    # one combined aggregate, and the range lane's 10x-bigger
    # contiguous DV still broadcasts as ONE run per file (the r14
    # contiguity preference), never a positions-sized payload
    "snap_delete_auto",
)


def zipf_tokens(spark, n: int, vocab: int = 100_000):
    """Deterministic Zipf(s=1) token stream: rank = vocab^u is the exact
    inverse-CDF (density ∝ 1/(r·ln V)), u a multiplicative hash of the
    row id — ONE definition shared by the sf1 and sf3 @zipf rows so the
    30x ratio really compares the same fixture at different N."""
    from pyspark.sql import functions as F

    u = ((F.col("id") * 2654435761) % 1_000_000) / 1_000_000.0
    return spark.range(n).select(
        F.concat(
            F.lit("t"),
            F.floor(F.pow(F.lit(float(vocab)), u)).cast("long").cast("string"),
        ).alias("token")
    )


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _single_file(dir_path: str, dest: str) -> None:
    """Collapse a 1-part Spark parquet dir into a plain file (the
    streaming fixture stage copies the events table as one file)."""
    parts = glob.glob(os.path.join(dir_path, "part-*.parquet"))
    assert len(parts) == 1, parts
    shutil.move(parts[0], dest)
    shutil.rmtree(dir_path)


def ensure_scale(
    spark,
    out_dir: str,
    n_replicas: int,
    tables: tuple[str, ...] = (
        "embeddings", "events", "documents", "tpch",
    ),
) -> None:
    """Materialize an n× fixture at constant cluster/duplicate density
    (cached on disk across runs). ``tables`` selects which families to
    build — the sf3 spot-check needs only what its two queries read."""
    from pyspark.sql import functions as F

    import numpy as np

    marker = os.path.join(out_dir, "_DONE")
    # marker carries source fingerprints: the fixture regenerates when
    # the driver rewrites the sf0.1 tables (content change at same path)
    def _fp(t):
        st = os.stat(os.path.join(SF_DIR, f"{t}.parquet"))
        return f"{t}={st.st_size}:{st.st_mtime_ns}"

    src_tables = []
    if "embeddings" in tables:
        src_tables.append("embeddings")
    if "events" in tables:
        src_tables.append("events")
    if "documents" in tables:
        src_tables.append("documents")
    if "customer" in tables and "tpch" not in tables:
        src_tables.append("customer")
    if "tpch" in tables:
        src_tables += [
            "orders", "lineitem", "customer", "supplier", "part", "nation",
        ]
    stamp = f"v6-rot|r={n_replicas}|" + "|".join(_fp(t) for t in src_tables)
    if os.path.exists(marker) and open(marker).read().strip() == stamp:
        return
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def replicate(table: str, project):
        base = spark.read.parquet(os.path.join(SF_DIR, f"{table}.parquet"))
        out = None
        for r in range(n_replicas):
            part = project(base, r)
            out = part if out is None else out.unionByName(part)
        return out

    # embeddings: keys/labels replica-offset; each replica's vectors get a
    # deterministic COORDINATE PERMUTATION — norms and all within-replica
    # cosines are preserved exactly (constant near-dup/cluster density by
    # construction), while cross-replica cosines and LSH signatures
    # decorrelate (a shift would instead inflate every within-replica
    # cosine toward 1 once |shift| dominates |vec| — measured: it turned
    # 240 near-dup pairs into 2M).
    # v6 (r12): random ORTHOGONAL ROTATION per replica, not a coordinate
    # permutation. Both preserve norms and all within-replica cosines
    # exactly (constant cluster/near-dup density by construction); the
    # difference is cross-replica decorrelation. Measured on the r12
    # driver fixture, permutations were NOT enough: its embeddings are
    # anisotropic enough that permuted replicas still cross-correlate —
    # 90% of sf1 nearest-centroid assignments landed on a FOREIGN
    # replica's centroid and 7,379 of 8,137 threshold pairs were
    # cross-replica, turning dedup_semantic's 10x/30x rows into
    # output-driven super-linear walls (pairs 34x/185x vs the 10x/30x a
    # constant-density fixture gives). A Haar-random rotation drives
    # cross-replica cosines to ~N(0, 1/64) regardless of the base
    # distribution's shape, restoring the invariant the whole scale
    # section depends on.
    def _rotation(r: int):
        if r == 0:
            return np.eye(64)
        q, _ = np.linalg.qr(np.random.RandomState(2000 + r).randn(64, 64))
        return q

    rots = [_rotation(r) for r in range(n_replicas)]

    def emb(base, r):
        rot = rots[r]
        offset = base.select(
            (F.col("vec_id") + r * 10**9).alias("vec_id"),
            F.col("embedding").cast("array<float>").alias("embedding"),
            (F.col("label") + r * 1000).alias("label"),
        )
        if r == 0:  # identity: keep replica 0 byte-identical to the base
            return offset

        def apply_rot(batches):
            for pdf in batches:
                vecs = np.array(pdf["embedding"].tolist(), dtype=np.float64)
                out = (vecs @ rot.T).astype(np.float32)
                pdf = pdf.copy()
                pdf["embedding"] = [row.tolist() for row in out]
                yield pdf

        return offset.mapInPandas(apply_rot, schema=offset.schema)

    if "embeddings" in tables:
        replicate("embeddings", emb).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, "_tmp_embeddings"))
        _single_file(
            os.path.join(out_dir, "_tmp_embeddings"),
            os.path.join(out_dir, "embeddings.parquet"),
        )

    def ev(base, r):
        cols = [
            (F.col("event_id") + r * 10**9).alias("event_id"),
            (F.col("user_id") + r * 10**6).alias("user_id"),
        ]
        rest = [c for c in base.columns if c not in ("event_id", "user_id")]
        return base.select(*cols, *rest)

    if "events" in tables:
        replicate("events", ev).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, "_tmp_events")
        )
        _single_file(
            os.path.join(out_dir, "_tmp_events"),
            os.path.join(out_dir, "events.parquet"),
        )

    # documents: within-replica dup/near-dup structure is preserved EXACTLY
    # (every doc in a replica undergoes the identical transformation);
    # cross-replica near-dup relations are broken by interleaving a
    # replica tag token every 4 tokens — ~3/4 of all 3-gram shingles then
    # contain a tag position, pushing cross-replica Jaccard of same-base
    # copies far below the 0.8 threshold (constant pair density at 10×).
    def docs(base, r):
        if r == 0:
            return base
        toks = F.split(F.trim(F.col("text")), r"\s+")
        chunks = F.transform(
            F.sequence(F.lit(0), F.size(toks) - 1, F.lit(4)),
            lambda s: F.array_join(F.slice(toks, s + 1, 4), " "),
        )
        txt = F.array_join(chunks, f" zzrep{r} ")
        rest = [
            c for c in base.columns if c not in ("doc_id", "text", "n_chars")
        ]
        return base.select(
            (F.col("doc_id") + r * 10**9).alias("doc_id"),
            txt.alias("text"),
            *rest,
            F.length(txt).alias("n_chars"),
        )

    if "documents" in tables:
        replicate("documents", docs).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, "_tmp_documents"))
        _single_file(
            os.path.join(out_dir, "_tmp_documents"),
            os.path.join(out_dir, "documents.parquet"),
        )

    # TPC-H relational tables: each replica is a self-contained
    # sub-database — every foreign key gets the same per-replica offset
    # as the primary key it references, so replica-r orders join only
    # replica-r lineitems/customers (join cardinality scales linearly,
    # never cross-replica). nation/region are bounded dims: copied as-is
    # and shared by all replicas (exactly how a 100 TB fact table shares
    # its dimension tables).
    _KEY_OFFSETS = {
        "o_orderkey": 10**9, "o_custkey": 10**6,
        "l_orderkey": 10**9, "l_suppkey": 10**6, "l_partkey": 10**6,
        "c_custkey": 10**6,
        "s_suppkey": 10**6,
        "p_partkey": 10**6,
    }

    def keyed(base, r):
        return base.select(
            *[
                (F.col(c) + r * _KEY_OFFSETS[c]).alias(c)
                if c in _KEY_OFFSETS else F.col(c)
                for c in base.columns
            ]
        )

    # standalone customer build (sf3 spatial row) — same keyed offsets as
    # the tpch family so the fixture is a valid subset of a full build
    if "customer" in tables and "tpch" not in tables:
        replicate("customer", keyed).coalesce(2).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, "customer.parquet"))

    if "tpch" in tables:
        for table, parts in (
            ("orders", 4), ("lineitem", 8), ("customer", 2), ("supplier", 1),
            ("part", 1),
        ):
            replicate(table, keyed).coalesce(parts).write.mode(
                "overwrite"
            ).parquet(os.path.join(out_dir, f"{table}.parquet"))
        spark.read.parquet(os.path.join(SF_DIR, "nation.parquet")).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, "nation.parquet"))

    with open(marker, "w") as f:
        f.write(stamp)


def calibration_probe(spark) -> dict:
    """Fixed-work machine-speed token recorded with every artifact (r12
    methodology pin — VERDICT r11 #2). The r10→r11 headline moved +35%
    UNIFORMLY across 28 queries including untouched code; a controlled
    r12 re-measure reproduced the r11 numbers within 1%, proving the
    shift was the MACHINE's steady state changing between rounds, not
    the plans. This probe makes that diagnosis one division instead of
    a forensic session: same code + same calibration ⇒ compare walls
    directly; calibration moved ⇒ normalize by it before reading any
    per-query ratio as a regression. Two tokens: a JVM codegen-bound
    aggregate (CPU speed) and a fixture re-scan (I/O + page cache)."""
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    # double lanes: an int sum of id*id overflows long under ANSI mode
    spark.range(200_000_000).select(
        F.avg(F.col("id") * 1.5).alias("a"),
        F.sum(F.col("id") % 97).alias("s"),
    ).collect()
    cpu_sec = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    force(spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")))
    scan_sec = round(time.perf_counter() - t0, 3)
    try:
        load1, load5, _ = (
            open("/proc/loadavg").read().split()[:3]
        )
    except OSError:
        load1 = load5 = None
    return {
        "jvm_agg_2e8_sec": cpu_sec,
        "lineitem_rescan_sec": scan_sec,
        "loadavg_1m": float(load1) if load1 else None,
        "loadavg_5m": float(load5) if load5 else None,
    }


def _gc_point() -> None:
    """Inter-query hygiene, run strictly OUTSIDE timed regions: a full
    Python gc pass releases py4j wrappers for the previous queries'
    DataFrames/broadcasts (CPython frees reference CYCLES only on gc
    passes, and a wrapper held in a cycle keeps its JVM twin — and
    whatever broadcast/RDD state the ContextCleaner would otherwise
    reclaim — alive indefinitely). Session-aging forensics (r15): rows
    measured ~700 query-invocations into the bench session read 1.5-2×
    their fresh-session isolated walls, and the drift class tracks
    accumulated session state, not any specific query. This point
    bounds that accumulation without touching what any timed rep
    computes — cross-query plan/data reuse lives in Spark's cache
    manager and scratch staging, neither of which gc touches."""
    import gc

    gc.collect()


def main() -> None:
    registry = load_all()
    # Bounded status-store retention, bench session only: the driver
    # otherwise retains metadata for the LAST 1000 executions/jobs/stages
    # (SQLAppStatusListener's in-memory KVStore — alive even with the UI
    # disabled), and a ~2000-invocation bench session both churns and
    # walks ever-larger listener state. Measurement-infrastructure
    # config, not engine tuning — the engine's session defaults are
    # unchanged for real workloads.
    spark = get_spark("bench", extra_conf={
        "spark.sql.ui.retainedExecutions": "50",
        "spark.ui.retainedJobs": "100",
        "spark.ui.retainedStages": "100",
        "spark.ui.retainedTasks": "1000",
    })
    # getOrCreate silently ignores extra_conf when a session already
    # exists in this process — the retention bounds (the r15 fix for
    # measured session-aging drift) would be dropped with no signal
    # (ADVICE r15). The bench is its own process, so this is a guard,
    # not a code path: warn loudly if it ever trips.
    if spark.conf.get("spark.sql.ui.retainedExecutions", None) != "50":
        print(
            "WARNING: pre-existing SparkSession — bench status-store "
            "retention bounds were NOT applied; session-aging drift "
            "may inflate late rows",
            file=sys.stderr,
        )
    # warm the JVM/codegen paths so timings measure the plans, not startup
    force(registry["scan_full"].fn(spark, SF_DIR))

    # UNTIMED full warm-up pass (r12 methodology pin): one run of every
    # headline query before any timing. Best-of-3 alone does NOT reach
    # steady state from a cold page cache — measured: a cold-cache
    # probe's best-of-3 summed 26.2 s vs 19.8 s for an identical probe
    # run immediately after (q1: 2.28 s vs 0.69 s best — all three cold
    # reps paid I/O). With this pass, every timed rep runs against a
    # warm cache, so round-over-round deltas reflect plans + machine,
    # never the accident of what was cached when the bench started.
    for name in HEADLINE:
        force(registry[name].fn(spark, SF_DIR))

    calibration = calibration_probe(spark)

    # best-of-3 in one warm session: run 1 pays one-off codegen/JIT, runs
    # 2-3 measure the plan; the min kills transient GC/contention noise
    # (the drift class seen on sub-second queries between rounds) while
    # keeping intentional cross-query reuse (shared LSH pair cache) alive.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        _gc_point()  # between queries, never inside a timed rep
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            force(registry[name].fn(spark, SF_DIR))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    try:
        sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    result = {
        "metric": "headline_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "calibration": calibration,
    }

    # Ops added this round, timed under their own key so the headline
    # stays comparable round-over-round (promotion into HEADLINE happens
    # the round AFTER a gate row exists).
    NEW_OPS = (
        "dedup_incremental_minhash",
        "pipeline_domain_mix",
        "ext_split_train_test",
        "sim_ann_pq",
        "sim_ann_pq_stored",
        "sim_ann_pq_kmeans",
        "snap_cluster_rewrite",
        "ext_heavy_hitters",
        "ext_percentile_scalable",
        "stream_incremental_dedup",
        "ext_agg_grouping_sets",
        "ext_join_salted",
        "func_array",
        "ext_join_bucketed",
        "text_hybrid_topk",
        "snap_compact_manifests",
        "ext_funnel",
        "ext_cohort_retention",
        "ext_gap_fill",
        "ext_fuzzy_join",
        "text_collocations",
        "pipeline_quality_buckets",
        "snap_wap_publish",
        "snap_incremental_agg",
        "snap_changelog_cdc",
        "func_stats",
        "ext_window_time_range",
        "ext_event_transitions",
        "ext_profile_columns",
        "ext_hierarchy_flatten",
        "ext_entity_merge",
        "text_tfidf_topterms",
        "ext_anomaly_zscore",
        "ext_session_paths",
        "ext_pagerank",
        "snap_expire_branches",
        "ext_integrity_check",
        "func_bitwise",
        "ext_timeseries_features",
        # late-r5 batch (gate rows land in r6; timed here from day one)
        "snap_merge_multi",
        "snap_orphan_cleanup",
        "snap_zorder_rewrite",
        "ext_graph_triangles",
        "ext_interval_join",
        "ext_corr_matrix",
        "ext_pca_project",
        "ext_shard_shuffle",
        "ext_dbscan_grid",
        "stream_anomaly_alerts",
        "snap_scd2_apply",
        "text_url_canonicalize",
        "ext_histogram",
        "mm_train_record",
        "sim_knn_graph_clusters",
        "ext_sample_weighted",
        # new in r7
        "snap_append_ordered",
        "text_rerank_topk",
        "stream_topk_trending",
        "ext_histogram_equidepth",
        "sim_ann_ivf_stored",
        "mm_neardup_features",
        "dedup_containment",
        "text_bpe_pair_stats",
        "text_bpe_merges",
        "snap_checked_append",
        "ext_abtest_lift",
        "stream_late_data_drop",
        "ext_ndcg_eval",
        "func_map",
        "ext_spatial_grid_join",
        "snap_dpp_join",
        "snap_files_meta",
        "stream_replay_idempotent",
        "ext_window_yoy",
        "snap_timetravel_asof",
        "ext_skyline",
        "ext_regression_ols",
        "text_bpe_encode",
        "stream_state_eviction",
        "ext_dq_expectations",
        "pipeline_token_budget",
        "stream_rocksdb_state",
        "snap_upsert_evolve",
        "sim_mmr_diversify",
        "pipeline_pack_sequences",
        "pipeline_temperature_mix",
        "text_winnow_fingerprint",
        # new in r8
        "pipeline_token_budget_scalable",
        "ext_profile_columns_approx",
        "pipeline_pack_sequences_sharded",
        "ext_spatial_grid_join_salted",
        "ext_window_crossover",
        "ext_rollup_rank",
        "pipeline_split_leakage_safe",
        # new in r9
        "ext_window_rolling_outlier",
        "ext_active_users_trailing",
        # new in r10
        "ext_join_multipass",
        "ext_join_multipass_fused",
        "ext_multiband_counts",
        "stream_active_users_trailing",
        "ext_intersect_join",
        "source_binaryfile",
        "stream_binaryfile_ingest",
        # new in r11
        "snap_delete_mor_positional",
        "snap_rewrite_pos_deletes",
        "snap_partitions_meta",
        "source_text_lines",
        "ext_frequent_best_readout",
        # new in the r11 continuation session
        "snap_history_meta",
        "snap_refs_meta",
        "snap_rename_column",
        "snap_drop_column",
        "snap_widen_column",
        "snap_bloom_pruned_scan",
        "ext_interpolate_linear",
        "stream_static_enrich",
        "ext_pattern_negation",
        "snap_maintenance_report",
        # r12 additions
        "snap_add_files",
        "ext_funnel_negation",
        "snap_delete_dv",
        "snap_rewrite_to_dv",
        "snap_entries_meta",
        "snap_cherry_pick",
        "dedup_semantic_ivf",
        # r13 additions
        "snap_delete_auto",
        "snap_delete_dv_ranges",
        "snap_update_mor",
        "snap_update_auto",
        "snap_all_manifests_meta",
        "snap_all_data_files_meta",
        "snap_metadata_log",
        "stream_stream_outer_join",
        "stream_stream_full_outer_join",
        # r14 additions
        "snap_concurrent_commit",
        # r15 additions
        "snap_dv_ranges_stored",
        "snap_time_pruned_scan",
    )
    # best-of-3 (was 2 through r11): measured on the PQ family, rep 1
    # pays Arrow/BLAS worker warm-up (10.9 s) and rep 2 is still not
    # steady (3.1 s vs 2.0 s at rep 3) — the r11 artifact's sim_ann_pq
    # "3x regression" was exactly this undersampling on a slower
    # machine, with operators/similarity.py untouched.
    # SPARK_GRAFT_HEADLINE_ONLY=1 skips NEW_OPS (and, combined with
    # SPARK_GRAFT_SKIP_SF1, the scale sections): the fast probe for
    # normalized round-over-round readouts of the HEADLINE set — the
    # full run takes ~10 min, the headline probe ~3. Never canonical.
    new_ops: dict[str, float] = {}
    # rep CURVES (r15, VERDICT r14 #5): best-of-3 samples a 3-4-rep
    # Arrow/BLAS warm-up convergence for some queries (r13's
    # dedup_incremental_minhash, r14's sim_ann_pq both read as false
    # regressions until a fresh-process probe produced the curve), so
    # the artifact now carries every query's raw rep vector — an
    # outlier self-explains as "rep 1 warm-up" vs "all reps slow"
    # without a post-hoc normalization probe.
    new_ops_reps: dict[str, list] = {}
    if not os.environ.get("SPARK_GRAFT_HEADLINE_ONLY"):
        for name in NEW_OPS:
            if name not in registry:
                continue
            _gc_point()  # between queries, never inside a timed rep
            reps = []
            for _ in range(3):
                t0 = time.perf_counter()
                force(registry[name].fn(spark, SF_DIR))
                reps.append(round(time.perf_counter() - t0, 3))
            new_ops[name] = min(reps)
            new_ops_reps[name] = reps
    result["new_ops"] = new_ops  # r5+ additions (key renamed from new_ops_r5 in r7)
    result["new_ops_reps"] = new_ops_reps

    if not os.environ.get("SPARK_GRAFT_SKIP_SF1"):
        t0 = time.perf_counter()
        ensure_scale(spark, SF1_DIR, SF1_REPLICAS)
        gen_sec = round(time.perf_counter() - t0, 3)
        # warm the page cache + Python workers on the sf1 fixture so the
        # first timed query measures its plan, not first-touch I/O
        for t in (
            "embeddings", "events", "orders", "documents",
            "lineitem", "customer", "supplier", "part", "nation",
        ):
            force(spark.read.parquet(os.path.join(SF1_DIR, f"{t}.parquet")))
        # best-of-2, mirroring the sf0.1 methodology: the sf0.1 numbers
        # are warm-session minimums (and dedup_minhash_lsh's reads the
        # session pair cache by design), so a single COLD sf1 run would
        # compare a cache read against a full build and report a fake
        # 100×+ "blowup" that is really first-materialization cost.
        sf1_timings: dict[str, float] = {}
        sf1_cold: dict[str, float] = {}
        base_t = {**new_ops, **timings}  # sf0.1 baselines for ratios
        # best-of-3 (was 2): measured on sim_ann_hyperplane at sf1, run 2
        # still carries JVM codegen + python-worker spin-up for the big
        # BLAS plan (24.5 s cold, 10.7 s run 2, 3.2 s steady state) — the
        # third run is what the plan actually costs
        sf1_reps: dict[str, list] = {}  # raw rep curves (VERDICT r14 #5)
        for name in SCALE_QUERIES:
            _gc_point()  # between queries, never inside a timed rep
            reps = []
            for i in range(3):
                t0 = time.perf_counter()
                force(registry[name].fn(spark, SF1_DIR))
                took = time.perf_counter() - t0
                if i == 0:
                    sf1_cold[name] = round(took, 3)
                reps.append(round(took, 3))
            sf1_timings[name] = min(reps)
            sf1_reps[name] = reps
        # Second salted-grid row at a PRODUCTION-shaped threshold
        # (ADVICE/VERDICT r8 #5): the registered query ships with
        # _SPATIAL_HOT=1 so the oracle exercises the salt lanes on the
        # sparse fixture — an adversarial configuration where EVERY
        # 2+-point cell pays the 8x lane fan-out. This row sets the
        # threshold to the fixture's p99 cell occupancy (30 at sf1,
        # measured: 12,699 cells, max 40), so only genuinely hot cells
        # salt and cold cells run at plain-twin cost — the intended
        # regime the knob documents.
        import component_iceberg_spark.plans.queries_analytics as _QA

        _prod_key = "ext_spatial_grid_join_salted@hot30"
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            force(
                _QA._grid_distance_pairs(
                    _QA._spatial_points(spark, SF1_DIR),
                    _QA._SPATIAL_D,
                    hot_threshold=30,
                    salt_buckets=8,
                )
            )
            took = time.perf_counter() - t0
            if i == 0:
                sf1_cold[_prod_key] = round(took, 3)
            best = min(best, took)
        sf1_timings[_prod_key] = round(best, 3)
        # Third: the VERIFY-HEAVY dense-fixture twins (VERDICT r9 #5) —
        # the regime where the r8 DESIGN_NOTES boundary note says salting
        # WINS: candidates quadratic, output small. One 400-unit grid
        # cell holds a 48k-point blob while the verify distance stays 10
        # (~2.3G candidate pairs -> 2.18M surviving output, a ~10^3:1
        # verify kill), over a 40k uniform background whose cells stay
        # under the threshold. Auto-broadcast is OFF for both twins: at
        # 100 TB neither join side fits under any broadcast threshold,
        # and a broadcast hash probe has no skew to salt (measured: with
        # broadcast on, plain wins at every blob size because every core
        # probes its own slice — no straggler exists). AQE's skew split
        # does not absorb the shape either — it sizes partitions in
        # BYTES (the blob is ~2 MB) and cannot see quadratic pair work.
        # hot_threshold=30 salts only the blob cell; best-of-2 to bound
        # the bench cost of the deliberately expensive plain twin.
        from pyspark.sql import functions as F

        _bg = spark.range(40_000).select(
            F.col("id"),
            ((F.col("id") * 2654435761) % 10_000_000 / 1000.0).alias("x"),
            ((F.col("id") * 40503) % 10_000_000 / 1000.0).alias("y"),
        )
        _blob = spark.range(48_000).select(
            (F.col("id") + 10_000_000).alias("id"),
            (5000.0 + ((F.col("id") * 48271) % 400_000) / 1000.0).alias("x"),
            (5000.0 + ((F.col("id") * 16807) % 400_000) / 1000.0).alias("y"),
        )
        _dense_pts = _bg.unionByName(_blob)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            for _dense_key, _kw in (
                ("ext_spatial_grid_join@dense", {}),
                (
                    "ext_spatial_grid_join_salted@dense",
                    {"hot_threshold": 30, "salt_buckets": 8},
                ),
            ):
                best = float("inf")
                for i in range(2):
                    t0 = time.perf_counter()
                    force(
                        _QA._grid_distance_pairs(
                            _dense_pts, 10.0, cell=400.0, **_kw
                        )
                    )
                    took = time.perf_counter() - t0
                    if i == 0:
                        sf1_cold[_dense_key] = round(took, 3)
                    best = min(best, took)
                sf1_timings[_dense_key] = round(best, 3)
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
        # Realistic-vocabulary heavy-hitters row (VERDICT r10 #3): the
        # registered query's word-soup fixture is the verify pass's
        # WORST case (vocab ≤ k+1 ⇒ the semi-join filters nothing);
        # this row runs the same operator over a crafted Zipf(s=1)
        # stream with a ~100k-word vocabulary at the sf1 token volume —
        # the regime the r10 audit predicted: MG candidates ≈ k (34
        # over 99k words) and the semi-join admits only heavy-token
        # occurrences (~31% of the stream), so the verify passes scan a
        # minority of it. rank = V^u is the exact Zipf inverse-CDF; the
        # multiplicative hash makes u deterministic.
        from component_iceberg_spark.operators import sketch as _SK

        _zipf_items = zipf_tokens(spark, 3_300_000)
        _zkey = "ext_heavy_hitters@zipf"
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            force(_SK.heavy_hitters_exact(_zipf_items, "token", k=32))
            took = time.perf_counter() - t0
            if i == 0:
                sf1_cold[_zkey] = round(took, 3)
            best = min(best, took)
        sf1_timings[_zkey] = round(best, 3)

        # Measured shuffle VOLUME for the flagship scale idioms (VERDICT
        # r10 #2): per-query shuffle-write/read bytes from Spark's task
        # metrics at BOTH sf0.1 and sf1, against the on-disk source
        # bytes each query reads (stage-reported input bytes
        # under-report locally — see component_iceberg_spark.metrics).
        # This converts the "only partial states / deduped pairs cross
        # the exchange" claims from plan topology to byte counts; the
        # saturation twin-pins live in tests/test_shuffle_volume.py.
        from component_iceberg_spark.metrics import (
            dataframe_volume,
            source_bytes,
        )

        _VOLUME_QUERIES = {
            "ext_multiband_counts": ("events",),
            "ext_join_multipass_fused": (
                "lineitem", "orders", "customer", "supplier", "part",
                "nation",
            ),
            # the two-pass twin beside the fused one: same oracle, same
            # group space — the artifact shows what the fusion saves
            "ext_join_multipass": (
                "lineitem", "orders", "customer", "supplier", "part",
                "nation",
            ),
            "ext_active_users_trailing": ("events",),
            # the q23 capstone: "exactly two fact passes, group-bounded
            # exchange" as bytes — shuffle carries (part,cust) partial
            # states + the readout lanes, never lineitem rows
            "ext_frequent_best_readout": ("lineitem", "orders"),
        }
        volume: dict[str, dict] = {
            "note": (
                "shuffle bytes are serializer-level task counters; "
                "source_bytes is the on-disk (snappy-parquet) size of "
                "the tables read. multiband shuffles partial states "
                "only (bytes independent of input); the fused chain's "
                "states are group-space-bounded (the constant-density "
                "fixture grows the group space with the replicas, so "
                "the ratio holds ~flat); trailing's shuffle tracks "
                "distinct (day,user) PAIRS, which this fixture grows "
                "with the replicas BY CONSTRUCTION (user ids offset "
                "per replica) — its event-volume independence is the "
                "doubled-events saturation pin in "
                "tests/test_shuffle_volume.py (exactly flat bytes at "
                "2x events, same pairs)"
            )
        }
        for name, tabs in _VOLUME_QUERIES.items():
            row: dict[str, dict] = {}
            for sf_label, d in (("sf0.1", SF_DIR), ("sf1", SF1_DIR)):
                m = dataframe_volume(registry[name].fn(spark, d))
                src = source_bytes(d, tabs)
                row[sf_label] = {
                    "shuffle_write_bytes": m.shuffle_write_bytes,
                    "shuffle_read_bytes": m.shuffle_read_bytes,
                    "source_bytes": src,
                    "write_over_source": round(
                        m.shuffle_write_bytes / src, 4
                    ),
                }
            volume[name] = row

        # Streaming STATE volume (the stream-side sibling of the shuffle
        # section): peak stateOperators rows/bytes for the windowed
        # aggregate at both SFs, beside the input rows it absorbed. The
        # state tracks the (window, type) KEY SPACE, and the sf1 fixture
        # replicates events WITHIN the same time range — so this IS a
        # 10x saturation measurement: input rows 100k -> 1M while peak
        # state stays EXACTLY 3,600 rows / 847 KB (measured). The 2x
        # twin-pin with engineered identical windows lives in
        # tests/test_state_volume.py.
        from component_iceberg_spark.metrics import (
            state_volume_from_progress,
        )
        from component_iceberg_spark.plans.queries_streaming import (
            _stream as _events_stream,
        )
        from component_iceberg_spark.streaming import events as _SE

        state_vol: dict[str, dict] = {}
        for sf_label, d in (("sf0.1", SF_DIR), ("sf1", SF1_DIR)):
            agg = _SE.windowed_counts(_events_stream(spark, d))
            _, prog = _SE.stream_to_memory_progress(agg, spark, "complete")
            state_vol[sf_label] = state_volume_from_progress(prog).as_dict()

        # Data-bound scaling rows (r16, VERDICT r15 #2): at sf0.1 every
        # headline query sits at the per-job scheduling/py4j floor, so
        # the driver's 8-vs-32-core comparison reads ≈1 for all 28 rows
        # (ten were FASTER at 8 cores in r15) and a parallelism
        # regression would be invisible. Re-expose two sf1 walls —
        # already timed above with the same best-of-3 warm methodology —
        # in the per-query map the scaling comparison reads: both are
        # CPU/data-bound at 10x volume (regex fingerprint aggregation;
        # 10x TPC-H join+agg), so their 8-core/32-core ratio carries a
        # real parallelism signal. ADDITIVE only: the headline total
        # (``value``) and the original 28 rows are untouched, and the
        # rows exist in both the 32-core and the driver's low-core run,
        # so the ratio compares identical work.
        for _sn in ("dedup_exact", "q3_shipping_priority"):
            if _sn in sf1_timings:
                result["queries"][f"{_sn}@sf1"] = sf1_timings[_sn]
        result["sf1"] = {
            "queries": sf1_timings,
            "first_run": sf1_cold,
            "reps": sf1_reps,
            "gen_sec": gen_sec,
            "replicas": SF1_REPLICAS,
            "shuffle_volume": volume,
            "stream_state_volume": {
                "stream_window_counts": state_vol,
                "note": (
                    "peak stateOperators rows/bytes vs input rows; the "
                    "sf1 fixture replicates events within the same time "
                    "range, so sf0.1->sf1 is a 10x saturation "
                    "measurement: input 10x, state exactly flat "
                    "((window,type)-space-bounded); the engineered 2x "
                    "twin-pins live in tests/test_state_volume.py"
                ),
            },
            "ratio_vs_sf0.1": {
                n: round(sf1_timings[n] / base_t[n], 2)
                for n in SCALE_QUERIES
                if base_t.get(n)
            },
            "note": (
                "10x replication at constant cluster/duplicate density; "
                "best-of-3 per query (same warm-session methodology as "
                "the sf0.1 column); first_run records the cold pass; "
                "the @hot30 row re-runs the salted grid join with the "
                "production-shaped threshold (p99 cell occupancy) where "
                "only genuinely hot cells salt — the registered query's "
                "threshold=1 measures the adversarial all-cells-hot case; "
                "the @dense twins are the crafted verify-heavy fixture "
                "(one 48k-point hot cell, ~10^3:1 verify kill, "
                "auto-broadcast off — the 100 TB shuffle-join regime) "
                "where salting WINS, evidencing the r8 boundary note's "
                "claim from the other side"
            ),
        }

    if not os.environ.get("SPARK_GRAFT_SKIP_SF1") and not os.environ.get(
        "SPARK_GRAFT_SKIP_SF3"
    ):
        # 30× spot-check: one extra point on the dedup scaling curve
        # (r10: plus the join-idiom family — the tpch group replaces the
        # standalone customer build; customer content is identical, same
        # keyed offsets, so the spatial row's basis is unchanged). Same
        # constant-density construction and warm methodology as sf1.
        t0 = time.perf_counter()
        ensure_scale(
            spark, SF3_DIR, SF3_REPLICAS,
            tables=("embeddings", "documents", "tpch", "events"),
        )
        gen3 = round(time.perf_counter() - t0, 3)
        for t in ("embeddings", "documents", "customer", "lineitem", "events"):
            force(spark.read.parquet(os.path.join(SF3_DIR, f"{t}.parquet")))
        sf3_timings: dict[str, float] = {}
        sf3_cold: dict[str, float] = {}
        for name in SF3_QUERIES:
            _gc_point()  # between queries, never inside a timed rep
            best = float("inf")
            for i in range(3):
                t0 = time.perf_counter()
                force(registry[name].fn(spark, SF3_DIR))
                took = time.perf_counter() - t0
                if i == 0:
                    sf3_cold[name] = round(took, 3)
                best = min(best, took)
            sf3_timings[name] = round(best, 3)
        # Zipf heavy-hitters one more decade out: 3x the sf1 token
        # volume at the SAME 100k-word vocabulary — candidates should
        # stay ~k and the wall should track the two linear passes (the
        # sf1 @zipf row is this fixture at 3.3M tokens).
        _zipf3 = zipf_tokens(spark, 9_900_000)
        _z3key = "ext_heavy_hitters@zipf"
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            force(_SK.heavy_hitters_exact(_zipf3, "token", k=32))
            took = time.perf_counter() - t0
            if i == 0:
                sf3_cold[_z3key] = round(took, 3)
            best = min(best, took)
        sf3_timings[_z3key] = round(best, 3)
        # semantic-dedup OUTPUT volume (r12): the sfN walls for
        # dedup_semantic are PAIR-driven, and pair volume is a property
        # of the scenario, not the engine — the quantizer's centroid set
        # grows with the replica count (one per replica-distinct label),
        # argmax selection over more centroids concentrates buckets, and
        # the conditional cosine tail inside sharper buckets fattens, so
        # threshold pairs grow super-linearly even though the gram-stage
        # work (sum of bucket², recorded here) is measured LINEAR in
        # replicas and raw cross-replica cosines are rotation-decorrelated
        # to the uniform d=64 tail (~5e-4). Recording both numbers makes
        # the artifact self-explaining: wall tracks pairs, work tracks
        # sum b².
        sem_vol = {}
        for sfd, key in ((SF_DIR, "sf0.1"), (SF1_DIR, "sf1"), (SF3_DIR, "sf3")):
            from pyspark.sql import Window as _W
            from pyspark.sql import functions as _F

            from component_iceberg_spark.io.tables import load_table as _lt
            from component_iceberg_spark.operators import similarity as _S

            _e = _lt(spark, sfd, "embeddings")
            _w = _W.partitionBy("label").orderBy("vec_id")
            _cent = (
                _e.withColumn("rn", _F.row_number().over(_w))
                .filter("rn = 1")
                .select(
                    _F.col("vec_id").alias("cent_id"),
                    _F.col("embedding").alias("cent_vec"),
                    _S.norm(_F.col("embedding")).alias("cent_norm"),
                )
            )
            _asg = _S.nearest_assign(
                _e.select(
                    "vec_id",
                    _S.as_double(_F.col("embedding")).alias("embedding"),
                ),
                _cent, "vec_id", "embedding", "bucket", keep=("embedding",),
            )
            _sizes = _asg.groupBy("bucket").count()
            _stats = _sizes.agg(
                _F.sum(_F.col("count") * _F.col("count")).alias("ss")
            ).collect()[0]
            _pairs = _S.bucketed_threshold_pairs(
                _asg, "bucket", "vec_id", "embedding", 0.40
            ).count()
            sem_vol[key] = {"pairs": _pairs, "sum_bucket_sq": _stats.ss}
        sf1_q = result.get("sf1", {}).get("queries", {})
        result["sf3"] = {
            "queries": sf3_timings,
            "first_run": sf3_cold,
            "gen_sec": gen3,
            "replicas": SF3_REPLICAS,
            "dedup_semantic_volumes": sem_vol,
            # base_t (headline + new_ops), not bare timings: winnow and
            # bpe_encode carry their sf0.1 numbers under new_ops, and
            # bare timings silently dropped them from the 30x curve
            "ratio_vs_sf0.1": {
                n: round(sf3_timings[n] / base_t[n], 2)
                for n in SF3_QUERIES
                if base_t.get(n)
            },
            "ratio_vs_sf1": {
                n: round(sf3_timings[n] / sf1_q[n], 2)
                for n in (*SF3_QUERIES, _z3key)
                if sf1_q.get(n)
            },
            "note": (
                "dedup_semantic's sfN walls are OUTPUT-driven — see "
                "dedup_semantic_volumes: gram-stage work (sum_bucket_sq) "
                "is measured linear in replicas, but the label-derived "
                "centroid set grows WITH the replicas, argmax over more "
                "centroids concentrates buckets, and the conditional "
                "cosine tail inside sharper buckets fattens, so "
                "threshold pairs (and the wall that processes them) "
                "grow super-linearly by scenario construction; the v6 "
                "rotation fixture pins raw cross-replica cosines at the "
                "uniform d=64 tail, so none of this is residual "
                "replica correlation. "
                "30x constant-density spot-check: the dedup family plus "
                "the r9 additions pipeline_token_budget_scalable (warm "
                "read is session-cached by design; cold in first_run) "
                "and ext_spatial_grid_join_salted. Sub-linear-in-30x "
                "wall confirms the candidate-volume curve for the dedup "
                "rows; the salted-grid wall is intentionally "
                "super-linear — output pairs grow quadratically on the "
                "constant-area fixture (see the SF3_QUERIES comment) — "
                "so its row tracks pair output, not a plan defect. "
                "r10 adds the join-idiom family (fused multipass chain, "
                "rolling-outlier window) — their 30x walls should track "
                "the fact scans, their post-agg relations stay "
                "metadata-bounded"
            ),
        }

    blob = json.dumps(result)
    # Durable copy: the driver captures stdout, which has been observed
    # truncated (BENCH_r04.json "parsed": null lost q1/q3/q5 and the
    # headline total). A file in the repo survives regardless.
    # Durable artifact (VERDICT r4 ask #3: survive driver stdout
    # truncation) — written ONLY for the canonical full run, so a smoke
    # run at another SF or with the scale sections skipped can never
    # clobber the real numbers.
    canonical = (
        SF_DIR.rstrip("/").endswith("sf0.1")
        and not os.environ.get("SPARK_GRAFT_SKIP_SF1")
        and not os.environ.get("SPARK_GRAFT_HEADLINE_ONLY")
    )
    local = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"
    )
    prior = None
    try:  # prior canonical, read BEFORE overwriting: feeds the compact
        with open(local) as fh:  # tail line's worst-regression readout
            prior = json.load(fh)
    except (OSError, ValueError):
        prior = None
    if canonical:
        try:
            with open(local, "w") as fh:
                fh.write(blob + "\n")
        except OSError:
            pass
    print(blob)
    # Compact summary as the LAST line (VERDICT r13 #5 — the driver's
    # per-round artifact has carried "parsed": null since r4 because its
    # stdout capture truncates the full blob). The verdict asked for the
    # summary FIRST, but the r4 evidence says the capture keeps the END
    # of stdout (BENCH_r04.json's tail terminates exactly at the blob's
    # final brace), so only a trailing line survives; the driver's
    # JSON-line scan then finds this complete, schema-compliant record
    # (metric/value/unit/queries/sf) even when the full blob is cut.
    compact = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": result["unit"],
        "queries": result["queries"],
        "sf": result["sf"],
        "calibration": result.get("calibration"),
        "detail": "compact tail record; full artifact in the preceding "
                  "JSON line (and BENCH_LOCAL.json for canonical runs)",
    }
    if (
        prior
        and isinstance(prior.get("queries"), dict)
        and prior.get("sf") == result["sf"]  # probes at another SF would
    ):                                       # compare apples to oranges
        ratios = [
            (name, round(t / prior["queries"][name], 2))
            for name, t in result["queries"].items()
            if prior["queries"].get(name)
        ]
        if ratios:
            name, ratio = max(ratios, key=lambda nr: nr[1])
            compact["worst_vs_prior_canonical"] = {
                "query": name, "ratio": ratio,
            }
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
