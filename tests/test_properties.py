"""Property-based spot checks (SURVEY.md §5.2 item 4): aggregation
invariants over generated weather-shaped data, dedup idempotence, and the
two month-derivation paths agreeing on valid dates."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (location_id, month 1-12, day 1-28, precip or None)
weather_rows = st.lists(
    st.tuples(
        st.integers(0, 4),
        st.integers(1, 12),
        st.integers(1, 28),
        st.one_of(st.none(), st.integers(0, 240).map(lambda x: x / 10.0)),
    ),
    min_size=1,
    max_size=40,
)


def _weather_df(spark, rows):
    data = [
        (loc, f"{m}/{d}/2023", 20.0, p)
        for loc, m, d, p in rows
    ]
    return spark.createDataFrame(
        data, "location_id int, date string, temperature_2m_mean double, precipitation_hours double"
    )


@given(rows=weather_rows)
@settings(**_SETTINGS)
def test_group_sums_equal_global_sum(spark, rows):
    """Σ per-month sums == global sum (Job2 semantics: nulls dropped)."""
    wx = _weather_df(spark, rows)
    monthly = (
        wx.where(F.col("precipitation_hours").isNotNull())
        .groupBy(F.concat_ws("-", F.lit("2023"), F.lpad(F.split("date", "/")[0], 2, "0")))
        .agg(F.sum(F.col("precipitation_hours").cast("decimal(18,1)")).alias("s"))
    )
    total_of_groups = monthly.agg(F.sum("s")).collect()[0][0] or 0
    direct = (
        wx.agg(F.sum(F.col("precipitation_hours").cast("decimal(18,1)"))).collect()[0][0]
        or 0
    )
    assert float(total_of_groups) == float(direct)


@given(rows=weather_rows)
@settings(**_SETTINGS)
def test_argmax_month_is_max_of_groups(spark, rows):
    """q_max_month returns a real month key whose total equals the max."""
    from mapreduce_weather_analysis_spark.plans.weather import q_max_month

    wx = _weather_df(spark, rows)
    res = q_max_month(wx).collect()
    monthly = {
        r[0]: r[1]
        for r in wx.where(F.col("precipitation_hours").isNotNull())
        .groupBy(F.date_format(F.to_date("date", "M/d/yyyy"), "yyyy-MM").alias("ym"))
        .agg(F.sum("precipitation_hours").alias("s"))
        .collect()
    }
    if not monthly:
        assert res == []
        return
    [row] = res
    assert row.year_month in monthly
    best = max(monthly.values())
    assert abs(row.total_precipitation_hours - best) < 1e-9
    # tie-break: earliest among the maxima
    winners = sorted(ym for ym, s in monthly.items() if abs(s - best) < 1e-12)
    assert row.year_month == winners[0]


@given(rows=weather_rows)
@settings(**_SETTINGS)
def test_exact_dedup_idempotent(spark, rows):
    from mapreduce_weather_analysis_spark.operators.dedup import exact_dedup

    df = _weather_df(spark, rows).select(
        F.col("location_id").alias("doc_id"), F.col("date").alias("text")
    )
    once = exact_dedup(df, ["text"], "doc_id")
    twice = exact_dedup(
        once.select(F.col("canonical_id").alias("doc_id"), "text"), ["text"], "doc_id"
    )
    a = sorted((r.text, r.canonical_id) for r in once.collect())
    b = sorted((r.text, r.canonical_id) for r in twice.collect())
    assert a == b
    assert all(r.n_copies == 1 for r in twice.collect())


@given(rows=weather_rows)
@settings(**_SETTINGS)
def test_month_bucket_paths_agree_on_valid_dates(spark, rows):
    """Job1's typed parse path and Job2's string-split path must agree for
    every well-formed M/d/yyyy date (quirk Q2 can only bite on garbage)."""
    from mapreduce_weather_analysis_spark.functions.datetime_fns import (
        month_bucket,
        month_bucket_string_path,
    )

    wx = _weather_df(spark, rows)
    diff = wx.select(
        month_bucket("date").alias("a"), month_bucket_string_path("date").alias("b")
    ).where(F.col("a") != F.col("b"))
    assert diff.count() == 0


# (user, ts, is_left)
asof_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 1000), st.booleans()),
    min_size=1,
    max_size=30,
)


@given(rows=asof_rows)
@settings(**_SETTINGS)
def test_asof_join_matches_bruteforce(spark, rows):
    """asof_join (union + carry-forward) must pick, per left row, the max
    right ts ≤ left ts within the key — verified against a python brute
    force on generated data, including equal-timestamp ties."""
    from mapreduce_weather_analysis_spark.operators.asof import asof_join

    lefts = [(u, ts, i) for i, (u, ts, is_l) in enumerate(rows) if is_l]
    rights = [(u, ts, 1000 + i) for i, (u, ts, is_l) in enumerate(rows) if not is_l]
    if not lefts or not rights:
        return
    ldf = spark.createDataFrame(lefts, "user_id long, ts_us long, event_id long")
    rdf = spark.createDataFrame(rights, "user_id long, ts_us long, event_id long")
    got = {
        r.event_id: r.r_ts_us
        for r in asof_join(
            ldf, rdf, key="user_id", ts="ts_us",
            left_cols=["event_id"], right_cols=["ts_us"],
        ).collect()
    }
    for u, ts, eid in lefts:
        cands = [rts for ru, rts, _ in rights if ru == u and rts <= ts]
        expected = max(cands) if cands else None
        assert got[eid] == expected, (eid, got[eid], expected)


@given(rows=weather_rows)
@settings(**_SETTINGS)
def test_salted_agg_equals_plain_agg(spark, rows):
    """Two-phase salted aggregation must be result-identical to the plain
    groupBy for any input (decimal sums commute across salt partials)."""
    from mapreduce_weather_analysis_spark.operators.skew import salted_agg

    wx = _weather_df(spark, rows)
    salted = {
        (r.location_id): (r.s, r.n)
        for r in salted_agg(
            wx,
            ["location_id"],
            [
                F.sum(F.col("precipitation_hours").cast("decimal(18,1)")).alias("_s"),
                F.count(F.lit(1)).alias("_n"),
            ],
            [
                F.sum("_s").cast("double").alias("s"),
                F.sum("_n").alias("n"),
            ],
            salt_cols=["date"],
        ).collect()
    }
    plain = {
        (r.location_id): (r.s, r.n)
        for r in wx.groupBy("location_id")
        .agg(
            F.sum(F.col("precipitation_hours").cast("decimal(18,1)"))
            .cast("double")
            .alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert salted == plain
