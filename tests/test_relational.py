"""Property tests for relational operators whose outputs the DuckDB oracle
can't check exactly (sketches), plus spot invariants. Exact-parity coverage
for the rest of the module lives in tools/oracle_check.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from akkastreamprocessnpmpackagedependencies_spark.operators import relational
from akkastreamprocessnpmpackagedependencies_spark.session import load_table


def test_approx_sketches_within_error_bounds(spark, sf_dir):
    """Sketch estimates vs the exact companions the row itself now carries:
    HLL++ at rsd=0.02 has sigma = 2% of the true cardinality, so 5 sigma =
    10% (floor of 5 absolute for tiny groups); the quantile sketch at
    accuracy 10000 is near-exact at test scale."""
    exact_p50 = {
        r.l_returnflag: r.p50
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.expr("percentile(l_extendedprice, 0.5)").alias("p50"))
        .collect()
    }
    rows = relational.approx_sketches(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        # HLL++ at rsd=0.02: allow 5 sigma = 10% relative error
        assert abs(r.approx_parts - r.exact_parts) <= max(5, 0.10 * r.exact_parts)
        assert abs(r.approx_supps - r.exact_supps) <= max(5, 0.10 * r.exact_supps)
        # quantile sketch with accuracy 10000 on small data is near-exact
        assert abs(r.p50 - exact_p50[r.l_returnflag]) <= 0.05 * exact_p50[r.l_returnflag]
        assert r.p50 <= r.p90 <= r.p99


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


def test_dq_expectations_fire_on_corrupted_world(spark, tmp_path):
    """The expectation suite must COUNT violations, not just pass on clean
    data: a hand-corrupted mini-world (negative quantity, discount > 1,
    bogus return flag, duplicated order key, orphan FK rows on both
    probes) yields exactly the planted violation counts."""
    from akkastreamprocessnpmpackagedependencies_spark.operators.relational import (
        dq_expectations,
    )

    d = str(tmp_path)
    spark.createDataFrame(
        [
            # (orderkey, qty, discount, returnflag): one violation each
            (1, -5.0, 0.1, "A"),     # qty <= 0
            (1, 10.0, 1.5, "N"),     # discount > 1
            (1, 10.0, 0.2, "X"),     # flag outside domain
            (99, 10.0, 0.0, "R"),    # orphan l_orderkey (no order 99)
        ],
        "l_orderkey long, l_quantity double, l_discount double, l_returnflag string",
    ).write.parquet(f"{d}/lineitem.parquet")
    spark.createDataFrame(
        [(1, 100), (1, 100), (2, 777)],  # dup o_orderkey 1; custkey 777 orphan
        "o_orderkey long, o_custkey long",
    ).write.parquet(f"{d}/orders.parquet")
    spark.createDataFrame([(100,)], "c_custkey long").write.parquet(
        f"{d}/customer.parquet"
    )

    got = {r.rule: (r.n_violations, r.n_checked) for r in dq_expectations(spark, d).collect()}
    assert got == {
        "lineitem.l_quantity_positive": (1, 4),
        "lineitem.l_discount_in_unit_range": (1, 4),
        "lineitem.l_returnflag_in_domain": (1, 4),
        "orders.o_orderkey_unique": (1, 3),
        "orders.o_custkey_fk_customer": (1, 3),
        "lineitem.l_orderkey_fk_orders": (1, 4),
    }


def test_snapshot_diff_classifies_planted_changes(spark, sf_dir):
    """The diff classes must be disjoint, complete, and agree with the
    planted derivation: added = keys ∉ old snapshot (div by 7) that are in
    new; removed = keys ≡3 mod 5 that are in old; changed = repriced keys
    (div by 3) present in both."""
    from akkastreamprocessnpmpackagedependencies_spark.operators.relational import (
        snapshot_diff,
    )
    from akkastreamprocessnpmpackagedependencies_spark.session import load_table

    rows = snapshot_diff(spark, sf_dir).collect()
    keys = [r.o_orderkey for r in rows]
    assert len(keys) == len(set(keys))  # one verdict per key
    for r in rows:
        k = r.o_orderkey
        if r.change_type == "added":
            assert k % 7 == 0 and k % 5 != 3
            assert r.old_price is None and r.new_price is not None
        elif r.change_type == "removed":
            assert k % 5 == 3 and k % 7 != 0
            assert r.new_price is None and r.old_price is not None
        else:
            assert r.change_type == "changed"
            assert k % 3 == 0 and k % 7 != 0 and k % 5 != 3
            assert r.new_price == pytest.approx(r.old_price * 1.1)
    all_keys = {
        r.o_orderkey
        for r in load_table(spark, sf_dir, "orders").select("o_orderkey").collect()
    }
    want_changed = {k for k in all_keys if k % 3 == 0 and k % 7 != 0 and k % 5 != 3}
    got_changed = {r.o_orderkey for r in rows if r.change_type == "changed"}
    assert got_changed == want_changed


def test_equi_depth_deciles_empty_input_is_schema_stable(spark, tmp_path):
    """Round-4 ADVICE: an empty orders table must yield an empty frame
    with the query's exact output schema, not a driver-side TypeError
    from min/max returning NULL (the write_zordered guard, applied
    here)."""
    import pandas as pd

    pd.DataFrame(
        {
            "o_orderkey": pd.Series([], dtype="int64"),
            "o_totalprice": pd.Series([], dtype="float64"),
        }
    ).to_parquet(tmp_path / "orders.parquet")
    out = relational.equi_depth_deciles(spark, str(tmp_path))
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "decile", "n_orders", "lo", "hi", "total_price",
    ]


def test_equi_depth_deciles_all_null_prices_is_empty_both_engines(spark, tmp_path):
    """An all-NULL o_totalprice table must mean 'empty' — the NULL rows
    are dropped by the same IS NOT NULL predicate the oracle applies, so
    the engines can't diverge on unrankable rows (review finding on the
    empty-input guard)."""
    import pandas as pd

    pd.DataFrame(
        {
            "o_orderkey": pd.Series([1, 2, 3], dtype="int64"),
            "o_totalprice": pd.Series([None, None, None], dtype="float64"),
        }
    ).to_parquet(tmp_path / "orders.parquet")
    assert relational.equi_depth_deciles(spark, str(tmp_path)).count() == 0


def test_bucketed_prefix_sum_matches_pandas_under_adversarial_buckets(spark):
    """bucketed_prefix_sum must equal the naive ordered cumsum under the
    shapes that break sloppy prefix sums: empty buckets (ids that map to
    no rows), a single bucket holding most rows (skew), negative values,
    and ties in the order columns resolved by the tiebreaker."""
    import pandas as pd

    from akkastreamprocessnpmpackagedependencies_spark.operators.relational import (
        bucketed_prefix_sum,
    )

    rows = [
        # (k, v): k drives both order and bucket; bucket 0 gets one row,
        # bucket 1 is empty (no k in [10, 20)), bucket 2 holds the rest
        (1, 5), (25, -3), (25, 7), (26, 2), (27, 0), (30, 11), (31, -6),
    ]
    df = spark.createDataFrame(rows, "k int, v long").withColumn(
        "rid", F.monotonically_increasing_id()
    )
    bucket = (F.col("k") / 10).cast("int")
    out = bucketed_prefix_sum(df, bucket, ["k", "rid"], "v", "cum").collect()
    pdf = (
        pd.DataFrame([(r.k, r.rid, r.v) for r in out], columns=["k", "rid", "v"])
        .sort_values(["k", "rid"])
        .reset_index(drop=True)
    )
    want = pdf.v.cumsum()
    got = (
        pd.DataFrame([(r.k, r.rid, r.cum) for r in out], columns=["k", "rid", "cum"])
        .sort_values(["k", "rid"])
        .reset_index(drop=True)
        .cum
    )
    assert list(got) == list(want)
    assert {c for r in out for c in r.asDict()} == {"k", "v", "rid", "cum"}
