"""Measured shuffle-VOLUME pins for the flagship scale idioms (VERDICT
r10 #2): the registry's 100 TB claims — "the only shuffled rows are
partial aggregation states", "dedup happens BEFORE the fan-out", "the
post-agg relation is group-space-bounded" — asserted as byte counts from
Spark's own task metrics, not just plan topology.

Two pin shapes per query:

1. RATIO: shuffle-write bytes ≪ the on-disk source bytes the query
   reads (stage-reported input bytes under-report locally — see
   component_iceberg_spark.metrics — so the denominator is the fixture
   file size, exactly what "input" means at 100 TB).
2. SATURATION (the strong one): doubling the INPUT while holding the
   bounded quantity fixed (same (day, user) pairs; same join-group
   space) must leave shuffle bytes ~FLAT. A plan that shuffled fact
   rows — Generate before dedup, a self-join of un-aggregated rows —
   would double. Measured at sf0.1 while writing these pins: trailing
   665,684 → 665,684 bytes (1.000×) and the fused chain 3,061,983 →
   3,059,733 (0.999×) at 2× input; thresholds carry generous headroom
   for partition-layout noise, not for regressions.
"""

from __future__ import annotations

import glob
import os
import shutil

import pytest

from component_iceberg_spark.metrics import dataframe_volume, source_bytes
from component_iceberg_spark.plans import load_all

REGISTRY = load_all()


def _single_parquet(df, dest_dir: str, name: str) -> None:
    tmp = os.path.join(dest_dir, f"_t_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))
    assert len(part) == 1
    shutil.move(part[0], os.path.join(dest_dir, f"{name}.parquet"))
    shutil.rmtree(tmp)


@pytest.fixture(scope="module")
def doubled_events_dir(spark, sf_dir):
    """Events doubled with event_id offsets but IDENTICAL (user, day)
    pairs — 2× input, same bounded state space."""
    from pyspark.sql import functions as F

    out = "/tmp/cis_scratch/vol_pin_events2x"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    base = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    dbl = base.unionByName(
        base.withColumn("event_id", F.col("event_id") + 10**9)
    )
    _single_parquet(dbl, out, "events")
    yield out
    shutil.rmtree(out, ignore_errors=True)


@pytest.fixture(scope="module")
def doubled_lineitem_dir(spark, sf_dir):
    """Lineitem (the fact) duplicated row-for-row — 2× fact volume,
    IDENTICAL (part, cust-nation) group space — dims copied as-is."""
    out = "/tmp/cis_scratch/vol_pin_li2x"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    _single_parquet(li.unionByName(li), out, "lineitem")
    for t in ("orders", "customer", "supplier", "part", "nation", "region"):
        shutil.copyfile(
            os.path.join(sf_dir, f"{t}.parquet"),
            os.path.join(out, f"{t}.parquet"),
        )
    yield out
    shutil.rmtree(out, ignore_errors=True)


def test_multiband_shuffles_only_partial_states(spark, sf_dir):
    """q88 idiom: 8 bands × 2 lanes + total in ONE aggregate — the only
    exchange carries 17-lane partial states, KILOBYTES regardless of
    input volume (147 bytes at sf0.1's 2 MB events)."""
    m = dataframe_volume(REGISTRY["ext_multiband_counts"].fn(spark, sf_dir))
    src = source_bytes(sf_dir, ("events",))
    assert m.shuffle_write_bytes < 64 * 1024, m.as_dict()
    assert m.shuffle_write_bytes < 0.01 * src, (m.as_dict(), src)


def test_multiband_shuffle_flat_under_doubled_input(
    spark, sf_dir, doubled_events_dir
):
    m1 = dataframe_volume(REGISTRY["ext_multiband_counts"].fn(spark, sf_dir))
    m2 = dataframe_volume(
        REGISTRY["ext_multiband_counts"].fn(spark, doubled_events_dir)
    )
    assert m2.shuffle_write_bytes <= 1.3 * m1.shuffle_write_bytes + 1024, (
        m1.as_dict(),
        m2.as_dict(),
    )


def test_trailing_users_shuffle_bounded_by_pairs(
    spark, sf_dir, doubled_events_dir
):
    """Rolling 7-day distinct users: dedup BEFORE the 7× Generate means
    shuffle volume is bounded by |distinct (day, user) pairs|, never
    event volume. Doubling the events while keeping the pair set
    identical must leave shuffle bytes flat (measured: exactly equal at
    sf0.1); a fan-out-before-dedup plan would double."""
    m1 = dataframe_volume(
        REGISTRY["ext_active_users_trailing"].fn(spark, sf_dir)
    )
    m2 = dataframe_volume(
        REGISTRY["ext_active_users_trailing"].fn(spark, doubled_events_dir)
    )
    assert m2.shuffle_write_bytes <= 1.3 * m1.shuffle_write_bytes + 1024, (
        m1.as_dict(),
        m2.as_dict(),
    )
    # and the ratio side: pairs are a small fraction of raw events
    src = source_bytes(sf_dir, ("events",))
    assert m1.shuffle_write_bytes < src, (m1.as_dict(), src)


def test_blob_ingest_shuffle_is_row_sized(spark):
    """Streaming blob ingest: the stream reduces each file to (doc_id,
    n_bytes, content_md5) BEFORE any exchange, state, or sink — so the
    run's shuffle volume is ROW-sized, independent of blob size.
    Saturation pin: ~100x bigger blobs at the same file count leave
    shuffle bytes flat, while a plan that shuffled content would grow
    ~100x. (At 100 TB of media this is the difference between shuffling
    the corpus and shuffling a manifest.)"""
    from component_iceberg_spark.metrics import run_with_volume
    from component_iceberg_spark.plans.queries_streaming import (
        blob_ingest_stream,
    )

    base = "/tmp/cis_scratch/vol_pin_blobs"
    shutil.rmtree(base, ignore_errors=True)
    sizes = {}
    for label, blob_bytes in (("small", 200), ("big", 20_000)):
        src = os.path.join(base, label, "src")
        os.makedirs(src)
        for i in range(40):
            with open(os.path.join(src, f"doc_{i}.bin"), "wb") as f:
                f.write(bytes((i + j) % 251 for j in range(blob_bytes)))
        wh = os.path.join(base, label, "wh")
        out = {}
        m = run_with_volume(
            spark,
            lambda s=src, w=wh, o=out: o.setdefault(
                "rows", blob_ingest_stream(spark, s, w).collect()
            ),
        )
        assert len(out["rows"]) == 40
        assert all(r["n_bytes"] == blob_bytes for r in out["rows"])
        sizes[label] = m.shuffle_write_bytes
    shutil.rmtree(base, ignore_errors=True)
    # 100x the blob bytes, flat shuffle (content never crosses a wire)
    assert sizes["big"] <= 1.3 * sizes["small"] + 2048, sizes
    # and absolutely row-sized: far below even the small corpus' bytes
    assert sizes["big"] < 40 * 20_000 * 0.2, sizes


def test_ann_ivf_shuffle_is_topk_sized(spark, sf_dir):
    """IVF ANN's registry claim is ZERO-SHUFFLE BLAS assignment: the
    centroid matmul happens inside each Arrow batch and only the
    K-bounded candidate/top-k partials ever cross an exchange. In
    bytes: the whole query's shuffle is ~4 KB of top-k partials and
    CONSTANT across scale (measured 3.9 KB at both sf0.001 and sf0.1,
    i.e. 0.5% of sf0.1's 798 KB of embeddings) — so the pin is the
    absolute bound, with a lenient ratio guard for the tiny test SF."""
    m = dataframe_volume(REGISTRY["sim_ann_ivf"].fn(spark, sf_dir))
    src = source_bytes(sf_dir, ("embeddings",))
    assert m.shuffle_write_bytes < 64 * 1024, m.as_dict()
    assert m.shuffle_write_bytes < 0.05 * src, (m.as_dict(), src)


def test_multipass_fused_shuffle_bounded_by_group_space(
    spark, sf_dir, doubled_lineitem_dir
):
    """q64 fused chain: dims broadcast at this scale, so every shuffled
    byte is a partial aggregation state at (part, cust-nation) grain.
    Doubling the FACT with the group space held fixed must leave
    shuffle bytes flat (measured 0.999× at sf0.1) — fact rows never
    cross an exchange."""
    m1 = dataframe_volume(
        REGISTRY["ext_join_multipass_fused"].fn(spark, sf_dir)
    )
    m2 = dataframe_volume(
        REGISTRY["ext_join_multipass_fused"].fn(spark, doubled_lineitem_dir)
    )
    assert m2.shuffle_write_bytes <= 1.3 * m1.shuffle_write_bytes + 1024, (
        m1.as_dict(),
        m2.as_dict(),
    )
    src = source_bytes(
        sf_dir,
        ("lineitem", "orders", "customer", "supplier", "part", "nation"),
    )
    assert m1.shuffle_write_bytes < src, (m1.as_dict(), src)


def test_frequent_best_shuffle_is_state_sized(
    spark, sf_dir, doubled_lineitem_dir
):
    """q23 capstone: the discovery grouping-sets pass and the readout
    pass shuffle (part, cust)-grain partial states and the qualifier
    lanes, never fact rows. Exact flatness under doubling is NOT the
    contract here — doubled multiplicities push more items past the
    frequency THRESHOLD, so the qualifier relation legitimately grows —
    but the shuffle must stay state-sized. At this file's tiny test SF
    (sf0.001) the (part, cust)-grain state floor is a few KB against
    ~150 KB of source, so the bound here is 10%; the bench's
    shuffle_volume section records the ratio at sf0.1 and sf1, where the
    group-bounded states shrink toward 0% of the fact."""
    src = source_bytes(sf_dir, ("lineitem", "orders"))
    m1 = dataframe_volume(
        REGISTRY["ext_frequent_best_readout"].fn(spark, sf_dir)
    )
    assert m1.shuffle_write_bytes < 0.10 * src, (m1.as_dict(), src)
    m2 = dataframe_volume(
        REGISTRY["ext_frequent_best_readout"].fn(spark, doubled_lineitem_dir)
    )
    src2 = source_bytes(doubled_lineitem_dir, ("lineitem", "orders"))
    assert m2.shuffle_write_bytes < 0.10 * src2, (m2.as_dict(), src2)


def test_dv_read_shuffle_free_vs_positional(spark, sf_dir):
    """The DV format's 100 TB claim, in bytes, at the density the probe
    is FOR (sparse — below the r13 density gate): the positional-file
    format anti-joins a row-count-sized build side — under the no-auto-
    broadcast regime (what a 100 TB build side forces) that plan
    hash-exchanges the whole scan — while the DV relation broadcasts and
    the read shuffles ~NOTHING. Same table, same doomed rows, two
    formats. (The DENSE regime, where the gate flips the DV apply to
    the anti-join, is pinned by test_dv_read_density_gate_flips_apply.)"""
    from pyspark.sql import functions as F

    from component_iceberg_spark.io.snaptable import SnapCatalog

    wh_root = "/tmp/cis_scratch/vol_pin_dv"
    shutil.rmtree(wh_root, ignore_errors=True)
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    reads = {}
    for fmt in ("positional", "dv"):
        cat = SnapCatalog(os.path.join(wh_root, fmt))
        cat.create_or_replace("ns", "t", o)
        addressed = cat.read_with_positions(spark, "ns", "t")
        # ~1% of rows: below DV_PROBE_MAX_DENSITY, so the DV read stays
        # on the broadcast-probe branch
        doomed = addressed.filter(F.col("o_orderkey") % 97 == 0).select(
            cat.POS_FILE_COL, cat.POS_IDX_COL
        )
        if fmt == "dv":
            cat.delete_positions_dv(spark, "ns", "t", doomed)
        else:
            cat.delete_positions(spark, "ns", "t", doomed)
        reads[fmt] = cat, "ns", "t"
    want = o.filter("o_orderkey % 97 <> 0").count()
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        vols = {}
        for fmt, (cat, ns, t) in reads.items():
            df = cat.read(spark, ns, t)
            assert df.count() == want, fmt
            vols[fmt] = dataframe_volume(cat.read(spark, ns, t))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    dv, pos = vols["dv"], vols["positional"]
    # DV: explicit broadcast of the file-count-sized relation — the
    # read plans no shuffle at all
    assert dv.shuffle_write_bytes < 64 * 1024, dv.as_dict()
    # positional under the 100 TB join regime: the anti-join exchanges
    # the scan + the delete side
    assert pos.shuffle_write_bytes > 10 * max(dv.shuffle_write_bytes, 1), (
        pos.as_dict(),
        dv.as_dict(),
    )
    shutil.rmtree(wh_root, ignore_errors=True)


def test_dv_read_density_gate_flips_apply(spark, sf_dir):
    """The r13 shape gate, pinned on all THREE apply plans over the SAME
    table (VERDICT r12 #2): a sparse DV (~1% doomed) applies as the
    broadcast ordinal probe (BroadcastExchange + array_contains, no
    exchange of the scan); a dense SCATTERED DV (a third doomed, every
    3rd ordinal — runs don't compress) flips to the exploded (file, pos)
    LeftAnti join — no probe, no positions-sized broadcast (the ADVICE
    r12 OOM vector), linear work; a dense CONTIGUOUS DV (a prefix band —
    the realistic dense shape: time-range delete) collapses to
    run-count-bounded ranges and stays a shuffle-free broadcast probe at
    ANY density (BroadcastExchange + the _dv_starts range probe, no
    LeftAnti, no array_contains)."""
    from pyspark.sql import functions as F

    from component_iceberg_spark.io.snaptable import SnapCatalog

    wh_root = "/tmp/cis_scratch/vol_pin_dv_gate"
    shutil.rmtree(wh_root, ignore_errors=True)
    o = (
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")  # files carry contiguous key bands
    )
    n = o.count()
    band_hi = o.approxQuantile("o_orderkey", [0.4], 0.0)[0]
    cases = {
        "sparse": "o_orderkey % 97 = 0",
        "dense_scattered": "o_orderkey % 3 = 0",
        "dense_contiguous": f"o_orderkey <= {int(band_hi)}",
    }
    plans = {}
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # no auto-broadcast: any BroadcastExchange in the plan is OURS
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        for label, pred in cases.items():
            cat = SnapCatalog(os.path.join(wh_root, label))
            cat.create_or_replace("ns", "t", o)
            addressed = cat.read_with_positions(spark, "ns", "t")
            cat.delete_positions_dv(
                spark, "ns", "t",
                addressed.filter(pred).select(
                    cat.POS_FILE_COL, cat.POS_IDX_COL
                ),
            )
            df = cat.read(spark, "ns", "t")
            assert df.count() == n - o.filter(pred).count(), label
            plans[label] = df._jdf.queryExecution().executedPlan().toString()
        # r14 contiguity preference, its own deterministic fixture (the
        # orders fixture's rows-per-file sits below the 64x prefer
        # factor at test SF): 20k rows in 4 range-disjoint files, a 4%
        # prefix band = 800 positions in ONE run — sparse by every
        # density gate, yet the ordinal probe would pay 800 comparisons
        # per row where the range probe pays one between()
        cat = SnapCatalog(os.path.join(wh_root, "sparse_contiguous"))
        ids = spark.range(20_000).select(
            F.col("id"), (F.col("id") * 2).alias("v")
        )
        cat.create_or_replace(
            "ns", "t", ids.repartitionByRange(4, "id")
        )
        addressed = cat.read_with_positions(spark, "ns", "t")
        cat.delete_positions_dv(
            spark, "ns", "t",
            addressed.filter("id < 800").select(
                cat.POS_FILE_COL, cat.POS_IDX_COL
            ),
        )
        df = cat.read(spark, "ns", "t")
        assert df.count() == 19_200
        plans["sparse_contiguous"] = (
            df._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    sparse = plans["sparse"]
    assert "array_contains" in sparse and "BroadcastExchange" in sparse, (
        sparse
    )
    assert "LeftAnti" not in sparse, sparse
    scat = plans["dense_scattered"]
    assert "array_contains" not in scat and "BroadcastExchange" not in scat, (
        scat
    )
    assert "LeftAnti" in scat, scat
    cont = plans["dense_contiguous"]
    assert "_dv_starts" in cont and "BroadcastExchange" in cont, cont
    assert "LeftAnti" not in cont and "array_contains" not in cont, cont
    spco = plans["sparse_contiguous"]
    assert "_dv_starts" in spco and "BroadcastExchange" in spco, spco
    assert "LeftAnti" not in spco and "array_contains" not in spco, spco
    shutil.rmtree(wh_root, ignore_errors=True)


def test_kernel_width_small_input_and_scale_noop(spark, sf_dir):
    """kernel_width sizes tiny file-backed kernel inputs to a handful of
    tasks (each Python-kernel task pays a fixed worker round-trip) and
    declines — None — for big inputs and non-file plans, so cluster-width
    policies stand at scale. kernel_sized applies it as a shuffle-free
    coalesce."""
    from component_iceberg_spark.io.tables import load_table
    from component_iceberg_spark.operators.similarity import (
        kernel_sized,
        kernel_width,
    )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    w = kernel_width(e)
    # invariants, not a constant band (ADVICE r15): the exact width
    # depends on defaultParallelism and the fixture's on-disk bytes —
    # pin the derivation instead so a low-core runner or a regenerated
    # fixture can't fail the test without a product regression
    from component_iceberg_spark.io.tables import table_path

    par = spark.sparkContext.defaultParallelism
    src = os.path.getsize(table_path(sf_dir, "embeddings"))
    expected = min(par, max(2, src // (8 << 20) + 1))
    assert w == expected, (w, expected, src, par)
    assert kernel_sized(e).rdd.getNumPartitions() <= w

    # big input (threshold forced to 1 byte/task): decline
    assert kernel_width(e, per_task_bytes=1) is None
    # non-file-backed plan: decline
    assert kernel_width(spark.range(10)) is None


def test_pagerank_checkpoint_cadence_paths_agree(spark, monkeypatch):
    """r16: the rank loop cuts lineage only every _CHECKPOINT_EVERY
    rounds (a short fixed-iteration query runs as one lazy chain — no
    per-round eager-checkpoint job). The checkpointed and unbroken
    chains must produce identical ranks: run 5 iterations with the
    cadence at 2 (two cuts) and at 100 (no cuts) on a single-partition
    graph and compare exactly."""
    import component_iceberg_spark.operators.relational as R

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (2, 5)],
        "u long, v long",
    ).coalesce(1)

    def run():
        return sorted(
            (r["node"], r["rank"])
            for r in R.pagerank_undirected(
                edges, "u", "v", iterations=5
            ).collect()
        )

    monkeypatch.setattr(R, "_CHECKPOINT_EVERY", 2)
    cut = run()
    monkeypatch.setattr(R, "_CHECKPOINT_EVERY", 100)
    unbroken = run()
    assert cut == unbroken
    assert len(cut) == 5 and all(rk > 0 for _, rk in cut)


def test_local_relation_slice_count_and_rows(spark):
    """local_relation parallelizes metadata-sized rows into a handful of
    slices (a bare createDataFrame uses defaultParallelism slices, one
    Python-worker round-trip each on materialization) and round-trips
    the rows exactly."""
    from component_iceberg_spark.session import local_relation

    rows = [(i, f"n{i}") for i in range(100)]
    df = local_relation(spark, rows, schema="id long, name string")
    assert df.rdd.getNumPartitions() == 1
    got = sorted((r["id"], r["name"]) for r in df.collect())
    assert got == rows

    big = local_relation(
        spark, [(i,) for i in range(20000)], schema="id long"
    )
    assert 2 <= big.rdd.getNumPartitions() <= 3
    assert big.count() == 20000
