"""join_strategy_advisor invariants beyond the DuckDB oracle row: the
decision logic must be internally consistent with the profiling stats it
is derived from, and with the salted_join parameterization it feeds."""

from __future__ import annotations

from akkastreamprocessnpmpackagedependencies_spark.operators import advisor
from akkastreamprocessnpmpackagedependencies_spark.session import load_table


def test_join_strategy_advisor_decisions_consistent(spark, sf_dir):
    rows = {
        (r.fact_table, r.dim_table, r.join_key): r
        for r in advisor.join_strategy_advisor(spark, sf_dir).collect()
    }
    assert set(rows) == {(f, d, k) for f, k, d, _ in advisor._EDGES}
    for r in rows.values():
        # profiling stats are sane
        assert r.dim_rows > 0 and r.dim_bytes_est >= 8 * r.dim_rows
        assert 1 <= r.max_cnt and r.n_keys >= 1
        assert r.ceil_skew >= 1  # ceil(max/mean) with max >= mean
        # the decision is a pure function of the stats
        def expect(bytes_est):
            if bytes_est <= advisor._BROADCAST_BYTES:
                return "broadcast"
            return "salted" if r.ceil_skew >= advisor._SKEW_FACTOR else "shuffle"
        assert r.strategy == expect(r.dim_bytes_est)
        assert r.strategy_1000x == expect(r.dim_bytes_est * advisor._SCALE_FACTOR)
        # salt counts: 1 unless salted; salted => power of two in [2, 32]
        # covering the skew (or capped)
        if r.strategy_1000x == "salted":
            s = r.n_salts_1000x
            assert s in (1, 2, 4, 8, 16, 32) and (s & (s - 1)) == 0
            assert s >= min(r.ceil_skew, 32) or s == 32
        else:
            assert r.n_salts_1000x == 1


def test_join_strategy_advisor_key_stats_match_ground_truth(spark, sf_dir):
    """Spot-check one edge's numbers against a direct computation."""
    out = {
        (r.fact_table, r.dim_table): r
        for r in advisor.join_strategy_advisor(spark, sf_dir).collect()
    }[("lineitem", "supplier")]
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    counts = li.groupby("l_suppkey").size()
    assert out.n_keys == len(counts)
    assert out.max_cnt == counts.max()
    assert out.ceil_skew == -(-int(counts.max()) * len(counts) // int(counts.sum()))
    sup = load_table(spark, sf_dir, "supplier").toPandas()
    assert out.dim_rows == len(sup)
    assert out.dim_bytes_est == int(sup.s_name.str.len().sum()) + 8 * 3 * len(sup)


def test_advised_join_dispatch_equivalence(spark, sf_dir):
    """All three physical dispatches must be value-identical to the plain
    join; thresholds force each path."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    want = sorted(
        map(tuple, li.join(
            o.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey"
        ).collect())
    )

    # defaults at test scale: broadcast
    plan = advisor.plan_join(li, o.withColumnRenamed("o_orderkey", "l_orderkey"),
                             "l_orderkey", "l_orderkey")
    assert plan.strategy == "broadcast" and plan.n_salts == 1
    got_b = advisor.advised_join(li, o, "l_orderkey", "o_orderkey")
    # broadcast_bytes=0 disables broadcast; skew_factor decides the rest
    plan_s = advisor.plan_join(
        li, o.withColumnRenamed("o_orderkey", "l_orderkey"),
        "l_orderkey", "l_orderkey", broadcast_bytes=0, skew_factor=1,
    )
    assert plan_s.strategy == "salted"
    assert plan_s.n_salts >= 2 and (plan_s.n_salts & (plan_s.n_salts - 1)) == 0
    got_s = advisor.advised_join(li, o, "l_orderkey", "o_orderkey",
                                 broadcast_bytes=0, skew_factor=1)
    plan_p = advisor.plan_join(
        li, o.withColumnRenamed("o_orderkey", "l_orderkey"),
        "l_orderkey", "l_orderkey", broadcast_bytes=0, skew_factor=10**9,
    )
    assert plan_p.strategy == "shuffle" and plan_p.n_salts == 1
    got_p = advisor.advised_join(li, o, "l_orderkey", "o_orderkey",
                                 broadcast_bytes=0, skew_factor=10**9)
    for got in (got_b, got_s, got_p):
        assert got.columns == ["l_orderkey", "l_quantity", "o_orderpriority"]
        assert sorted(map(tuple, got.collect())) == want
