"""Bucketed-layout plan regression: writing the two fact tables bucketed on
their join key must eliminate every Exchange from the Q18 core (SCALE.md's
claimed fix for the 15M-group exchange measured at the 100× run), while
producing identical results to the unbucketed plan."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from mapreduce_weather_analysis_spark.functions.compat import dsum
from mapreduce_weather_analysis_spark.sources.bucketed import (
    big_orders_bucketed,
    write_bucketed,
)
from mapreduce_weather_analysis_spark.sources.tables import load_table

from .conftest import SMOKE_SF


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


@pytest.fixture()
def no_broadcast(spark):
    """Force sort-merge joins so any surviving shuffle is visible as an
    Exchange (a broadcast would hide it at smoke scale)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_fact_fact_join_has_no_exchange(spark, tmp_path, no_broadcast):
    li = load_table(spark, SMOKE_SF, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, SMOKE_SF, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "li_b_test", str(tmp_path / "li"), "l_orderkey", buckets=8)
    write_bucketed(o, "o_b_test", str(tmp_path / "o"), "o_orderkey", buckets=8)
    try:
        bucketed = big_orders_bucketed(spark, "li_b_test", "o_b_test")
        plan = _plan(bucketed)
        # the whole point: agg + fact-fact join, zero shuffles of any kind
        assert "Exchange" not in plan, plan
        assert ") SortMergeJoin" in plan

        # unbucketed twin of the same query: both the pre-agg and the join
        # pay hash-partitioning exchanges
        li_qty = (
            li.groupBy("l_orderkey")
            .agg(dsum("l_quantity", alias="total_qty"))
            .where(F.col("total_qty") > 300)
        )
        flat = li_qty.join(o, li_qty.l_orderkey == o.o_orderkey).select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").cast("double").alias("totalprice"),
            "total_qty",
        )
        flat_plan = _plan(flat)
        # formatted mode: operators appear as "(n) Exchange" headers with the
        # hashpartitioning spec on a following Arguments line
        assert flat_plan.count(") Exchange") >= 2
        assert "hashpartitioning" in flat_plan

        # layout changes the plan, never the answer
        assert sorted(map(tuple, bucketed.collect())) == sorted(
            map(tuple, flat.collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS li_b_test")
        spark.sql("DROP TABLE IF EXISTS o_b_test")


def test_bucketed_sorted_window_is_a_streaming_pass(spark, tmp_path):
    """The SCALE.md window posture: lineitem bucketed on l_suppkey and
    sorted on (l_suppkey, l_shipdate, l_orderkey, l_linenumber) makes the
    per-supplier running-sum window plan with NO Exchange and NO Sort —
    the scan's bucket partitioning + file sort order satisfy the window's
    distribution and ordering requirements outright."""
    from pyspark.sql import Window as W

    cols = ["l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber", "l_quantity"]
    li = load_table(spark, SMOKE_SF, "lineitem").select(*cols)
    write_bucketed(
        li,
        "li_ws_test",
        str(tmp_path / "li_ws"),
        "l_suppkey",
        buckets=4,
        sort_cols=["l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber"],
    )
    old = spark.conf.get(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
    )
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")

    def running(df):
        w = (
            W.partitionBy("l_suppkey")
            .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        return df.select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .over(w)
            .cast("double")
            .alias("running_qty"),
        )

    try:
        windowed = running(spark.table("li_ws_test"))
        plan = _plan(windowed)
        assert ") Exchange" not in plan, plan
        assert ") Sort" not in plan, plan
        # layout never changes the answer
        assert sorted(map(tuple, windowed.collect())) == sorted(
            map(tuple, running(li).collect())
        )
    finally:
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", old
        )
        spark.sql("DROP TABLE IF EXISTS li_ws_test")
