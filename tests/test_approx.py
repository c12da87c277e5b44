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
