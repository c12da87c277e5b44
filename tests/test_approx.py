"""Sketch-aggregate accuracy: approx results have no cross-engine oracle,
but they must track the exact answers within tolerance."""

from __future__ import annotations

from component_iceberg_spark.plans import load_all

REGISTRY = load_all()


def test_approx_tracks_exact(spark, sf_dir, oracle_con):
    approx = {
        r["l_returnflag"]: r
        for r in (
            row.asDict() for row in REGISTRY["ext_agg_approx"].fn(spark, sf_dir).collect()
        )
    }
    exact = {
        r[0]: r
        for r in oracle_con.execute(
            """
            SELECT l_returnflag,
                   count(DISTINCT l_orderkey),
                   quantile_cont(l_extendedprice, 0.5),
                   quantile_cont(l_extendedprice, 0.95)
            FROM lineitem GROUP BY 1
            """
        ).fetchall()
    }
    assert set(approx) == set(exact)
    for flag, a in approx.items():
        _, nd, p50, p95 = exact[flag]
        assert abs(a["approx_orders"] - nd) / nd < 0.05, (flag, a, nd)  # rsd=0.02
        assert abs(a["p50_price"] - p50) / p50 < 0.05
        assert abs(a["p95_price"] - p95) / p95 < 0.05


def test_ivf_kmeans_recall(spark, sf_dir):
    """k-means-fitted IVF must (a) be deterministic across runs and
    (b) reach recall@10 ≥ 0.5 vs the brute-force ground truth at nprobe=4
    of 10 buckets — and not degrade below the seed-centroid quantizer by
    more than one neighbor per query."""
    from component_iceberg_spark.plans import load_all

    reg = load_all()
    brute = reg["sim_topk_bruteforce"].fn(spark, sf_dir).collect()
    truth = {}
    for r in brute:
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    def recall(rows):
        got = {}
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        per_q = [
            len(got.get(q, set()) & t) / len(t) for q, t in truth.items()
        ]
        return sum(per_q) / len(per_q)

    km1 = reg["sim_ann_ivf_kmeans"].fn(spark, sf_dir).collect()
    km2 = reg["sim_ann_ivf_kmeans"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, km1)) == sorted(map(tuple, km2)), "nondeterministic"

    seed_rows = reg["sim_ann_ivf"].fn(spark, sf_dir).collect()
    r_km, r_seed = recall(km1), recall(seed_rows)
    assert r_km >= 0.5, f"k-means IVF recall too low: {r_km}"
    assert r_km >= r_seed - 0.1, f"k-means fit degraded recall: {r_km} vs {r_seed}"


def test_quantized_topk_recall(spark, sf_dir):
    """int8 quantization must preserve nearly all of the float top-10:
    the int8 step (~1/254 of the dynamic range) is far below the
    fixture's neighbor separation."""
    from component_iceberg_spark.plans import load_all

    reg = load_all()
    truth = {}
    for r in reg["sim_topk_bruteforce"].fn(spark, sf_dir).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got = {}
    for r in reg["sim_quantized_topk"].fn(spark, sf_dir).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    per_q = [len(got.get(q, set()) & t) / len(t) for q, t in truth.items()]
    recall = sum(per_q) / len(per_q)
    assert recall >= 0.9, f"int8 quantization lost too much recall: {recall}"
