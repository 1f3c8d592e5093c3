"""Unit tests: connected components (iterative) and salted join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from turnover_odata_etl_spark.operators.cluster import connected_components
from turnover_odata_etl_spark.operators.skew import salted_join
from turnover_odata_etl_spark.tables import load_table


def _cc(spark, pairs):
    df = spark.createDataFrame(pairs, "a long, b long")
    out = connected_components(df, "a", "b")
    return {r.node: r.label for r in out.collect()}


def test_cc_two_components(spark):
    labels = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cc_chain_needs_propagation(spark):
    """An 11-edge chain exercises multi-round convergence (diameter 11)."""
    chain = [(i, i + 1) for i in range(1, 12)]
    labels = _cc(spark, chain)
    assert set(labels.values()) == {1}
    assert len(labels) == 12


def test_cc_cycle_and_self_consistency(spark):
    labels = _cc(spark, [(5, 6), (6, 7), (7, 5), (3, 7)])
    assert set(labels.values()) == {3}


def test_cc_max_iter_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(1, 12)], "a long, b long")
    with pytest.raises(RuntimeError, match="no convergence"):
        connected_components(df, "a", "b", max_iter=2)


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    salted = salted_join(li, s, "l_suppkey", "s_suppkey", salt=4)
    plain = li.join(s, li.l_suppkey == s.s_suppkey)
    assert salted.count() == plain.count()
    a = sorted(map(tuple, salted.collect()))
    b = sorted(map(tuple, plain.collect()))
    assert a == b


def test_salted_join_left_outer_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "x"), (2, "y")], "k long, v string")
    small = spark.createDataFrame([(1, "dim")], "k2 long, d string")
    out = salted_join(big, small, "k", "k2", salt=4, how="left")
    rows = {r.v: r.d for r in out.collect()}
    assert rows == {"x": "dim", "y": None}


def test_salted_join_rejects_small_side_preserving_how(spark):
    """right/full-outer would emit each unmatched small row `salt`
    times (the small side is replicated); the operator must refuse."""
    import pytest

    big = spark.createDataFrame([(1, "x")], "k long, v string")
    small = spark.createDataFrame([(1, "dim")], "k2 long, d string")
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(big, small, "k", "k2", salt=4, how=how)
