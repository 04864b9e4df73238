"""Property tests for relational operators whose outputs the DuckDB oracle
can't check exactly (sketches), plus spot invariants. Exact-parity coverage
for the rest of the module lives in tools/oracle_check.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from akkastreamprocessnpmpackagedependencies_spark.operators import relational
from akkastreamprocessnpmpackagedependencies_spark.session import load_table


def test_approx_sketches_within_error_bounds(spark, sf_dir):
    exact = {
        r.l_returnflag: r
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        )
        .collect()
    }
    for r in relational.approx_sketches(spark, sf_dir).collect():
        e = exact[r.l_returnflag]
        # HLL++ at rsd=0.02: allow 5 sigma
        assert abs(r.approx_parts - e.n_parts) <= max(5, 0.10 * e.n_parts)
        assert abs(r.approx_supps - e.n_supps) <= max(5, 0.10 * e.n_supps)
        # quantile sketch with accuracy 10000 on small data is near-exact
        assert abs(r.price_quantiles[0] - e.p50) <= 0.05 * e.p50
        assert r.price_quantiles[0] <= r.price_quantiles[1] <= r.price_quantiles[2]


def test_window_rank_variants_internal_consistency(spark, sf_dir):
    rows = relational.window_rank_variants(spark, sf_dir).collect()
    by_part: dict[str, list] = {}
    for r in rows:
        by_part.setdefault(r.o_orderpriority, []).append(r)
    for rs in by_part.values():
        rs.sort(key=lambda r: r.rnk)
        n = len(rs)
        assert rs[0].rnk == 1 and rs[0].prnk == 0.0
        assert rs[0].cheapest_key == rs[0].o_orderkey
        assert rs[-1].next_key == -1
        assert {r.quartile for r in rs} <= {1, 2, 3, 4}
        for r in rs:
            assert abs(r.prnk - (r.rnk - 1) / (n - 1)) < 1e-12


def test_observation_metrics_on_pricing_summary(spark, sf_dir):
    """df.observe() attaches accumulator-style metrics to a query without a
    second scan — the monitoring hook a production pipeline exports
    (row counts, sums) alongside its result."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F
    from akkastreamprocessnpmpackagedependencies_spark.session import load_table

    l = load_table(spark, sf_dir, "lineitem")
    obs = Observation("scan_stats")
    observed = l.observe(
        obs,
        F.count(F.lit(1)).alias("rows_scanned"),
        F.sum("l_quantity").alias("qty_total"),
    )
    out = observed.groupBy("l_returnflag").count().collect()
    assert len(out) > 0
    got = obs.get
    assert got["rows_scanned"] == l.count()
    assert got["qty_total"] == l.agg(F.sum("l_quantity")).first()[0]
