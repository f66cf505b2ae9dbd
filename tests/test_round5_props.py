"""Property tests for the round-5 kernels (q343-q352 families).

Each test executes the invariant the query docstrings CLAIM: the TWA
is a convex combination of observed values, the exact truncated EWMA
equals a sequential fixed-point replay, KN continuation counts
conserve the bigram-type total, the hash-derived discrete-Laplace
noise is geometric(1/2)-shaped and cap-bounded, and RRF fusion ranks are
consistent with the pools.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

_SETTLE = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ----------------------------------------------- TWA convexity


@settings(**_SETTLE)
@given(
    obs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000_000),  # t offset us
            st.integers(min_value=1, max_value=50_000),  # cents
        ),
        min_size=2,
        max_size=30,
        unique_by=lambda tv: tv[0],
    )
)
def test_twa_is_convex_combination_and_matches_sequential(spark, obs):
    """floor-scaled TWA must (a) equal the sequential sum of
    value x gap over the span and (b) lie within [min, max] of the
    observed values (a time-weighted mean is a convex combination)."""
    rows = sorted(obs)
    df = spark.createDataFrame(
        [(1, t, c) for t, c in rows], "user_id int, t_us long, c long"
    )
    w = Window.partitionBy("user_id").orderBy("t_us")
    stepped = df.withColumn("_gap", F.lead("t_us").over(w) - F.col("t_us"))
    agg = (
        stepped.groupBy("user_id")
        .agg(F.sum(F.col("c") * F.col("_gap")).alias("num"),
             F.sum("_gap").alias("den"))
        .filter(F.col("den") > 0)
        .select(
            F.expr(
                "(num div den) * 1000000L + ((num % den) * 1000000L) div den"
            ).alias("twa_micro")
        )
        .collect()
    )
    num = sum(c * (rows[i + 1][0] - rows[i][0]) for i, (t, c) in enumerate(rows[:-1]))
    den = rows[-1][0] - rows[0][0]
    want = (num // den) * 1_000_000 + ((num % den) * 1_000_000) // den
    got = agg[0]["twa_micro"]
    assert got == want
    held = [c for _, c in rows[:-1]]  # last value carries no weight
    assert min(held) * 1_000_000 <= got <= max(held) * 1_000_000


# ----------------------------------------------- EWMA sequential replay


@settings(**_SETTLE)
@given(
    cents=st.lists(
        st.integers(min_value=0, max_value=10_000_000), min_size=1, max_size=40
    )
)
def test_truncated_ewma_matches_sequential_weights(spark, cents):
    """The explode+join EWMA must equal a sequential replay of
    sum_{i=0..min(9,t)} c_{t-i} * 2^(9-i) / (2^10 - 2^(9-m)) on a
    dense daily series — and a constant series must give back the
    constant exactly (weights sum to the divisor)."""
    daily = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "d long, c long"
    )
    offs = daily.select(
        "d", "c", F.explode(F.sequence(F.lit(0), F.lit(9))).alias("off")
    ).select((F.col("d") + F.col("off")).alias("t"), "off", "c")
    num = (
        offs.join(daily.select(F.col("d").alias("t")), "t")
        .groupBy("t")
        .agg(
            F.sum(
                F.col("c")
                * F.pow(F.lit(2.0), F.lit(9) - F.col("off")).cast("long")
            ).alias("num")
        )
    )
    got = {
        r["t"]: r["ewma"]
        for r in num.select(
            "t",
            F.expr(
                "(num * 1000000L) div (1024L -"
                " CAST(pow(2.0, 9 - least(t, 9L)) AS BIGINT))"
            ).alias("ewma"),
        ).collect()
    }
    for t in range(len(cents)):
        m = min(9, t)
        n = sum(cents[t - i] * (1 << (9 - i)) for i in range(m + 1))
        den = 1024 - (1 << (9 - m))
        assert got[t] == (n * 1_000_000) // den, (t, cents)
    if len(set(cents)) == 1:
        assert all(v == cents[0] * 1_000_000 for v in got.values())


# ----------------------------------------------- KN conservation


def test_kn_continuation_conserves_type_total(spark):
    """sum over words of N1+(.w) must equal the total distinct bigram
    type count T, and every kn_prob_micro is a valid floor share of
    1e6 (the whole-relation window total is consistent)."""
    from product_analytics_spark.operators import text as t
    from product_analytics_spark.qcommon import _t

    d = _t(spark, "/root/testdata/sf0.001", "documents").withColumn(
        "_tk", t.tokens(F.col("text"))
    )
    tk = F.col("_tk")
    n1 = F.greatest(F.size(tk) - F.lit(1), F.lit(0))
    pairs = (
        d.select(
            F.explode(
                F.zip_with(
                    F.slice(tk, 1, n1),
                    F.slice(tk, 2, n1),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            ).alias("bg")
        )
        .select("bg.a", "bg.b")
        .distinct()
    )
    total_types = pairs.count()
    per_w = pairs.groupBy("b").agg(F.count(F.lit(1)).alias("cc"))
    s = per_w.agg(F.sum("cc").alias("s"), F.max("cc").alias("mx")).collect()[0]
    assert s["s"] == total_types
    assert (s["mx"] * 1_000_000) // total_types <= 1_000_000


# ----------------------------------------------- DP noise shape


def test_dp_noise_is_cap_bounded_and_geometric_shaped(spark):
    """The ctz CASE ladder over uniform hashes must produce magnitudes
    bounded by the cap with P[mag=0] near 1/2 and each further level
    halving (binomial tolerance), and both signs must occur."""
    from product_analytics_spark.driver_queries_ext57 import _geo_noise_sql
    from product_analytics_spark.operators.text import portable_hash60

    n = 4096
    df = spark.range(n).select(
        portable_hash60(F.concat(F.lit("probe:"), F.col("id").cast("string"))).alias(
            "_h"
        )
    ).select(F.expr(_geo_noise_sql("_h")).alias("noise"))
    rows = [r["noise"] for r in df.collect()]
    mags = [abs(v) for v in rows]
    assert max(mags) <= 16
    frac0 = sum(1 for m in mags if m == 0) / n
    assert 0.45 < frac0 < 0.55
    frac1 = sum(1 for m in mags if m == 1) / n
    assert 0.20 < frac1 < 0.30
    assert any(v > 0 for v in rows) and any(v < 0 for v in rows)


# ----------------------------------------------- RRF consistency


def test_rrf_fusion_ranks_consistent(spark):
    """Every fused row's ranks must agree with independently computed
    pool ranks, and the top fused score must belong to a vector
    present in at least one pool."""
    from product_analytics_spark.driver_queries_ext57 import (
        q346_reciprocal_rank_fusion,
    )

    out = q346_reciprocal_rank_fusion(spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    for r in out:
        assert r["rank_cosine"] >= 1 or r["rank_cosine"] == -1
        assert r["rank_l2"] >= 1 or r["rank_l2"] == -1
        want = 0
        if r["rank_cosine"] > 0:
            want += 1_000_000_000_000 // (60 + r["rank_cosine"])
        if r["rank_l2"] > 0:
            want += 1_000_000_000_000 // (60 + r["rank_l2"])
        assert r["rrf_score_pico"] == want
    scores = [r["rrf_score_pico"] for r in out]
    assert scores == sorted(scores, reverse=True)


# ----------------------------------------------- batch-63 certificates


def test_map_dup_key_policy_is_the_real_divergence(spark):
    """Certify the divergence q359 documents: Spark's DEFAULT
    mapKeyDedupPolicy=EXCEPTION errors on duplicate map_concat keys,
    while DuckDB silently keeps the last value — so the portable
    semantics q359 pins (explicit LAST_WIN) is a real requirement,
    not a stylistic choice."""
    import duckdb
    import pytest
    from pyspark.errors import PySparkException

    prev = spark.conf.get("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
    try:
        spark.conf.set("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
        with pytest.raises(PySparkException):
            spark.sql(
                "SELECT map_concat(map(1, 10), map(1, 99)) AS m"
            ).collect()
        spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        [row] = spark.sql(
            "SELECT element_at(map_concat(map(1, 10), map(1, 99)), 1) AS v"
        ).collect()
        assert row["v"] == 99
    finally:
        spark.conf.set("spark.sql.mapKeyDedupPolicy", prev)
    con = duckdb.connect()
    assert con.execute(
        "SELECT map_concat(MAP{1: 10}, MAP{1: 99})[1][1]"
    ).fetchone()[0] == 99


def test_duckdb_map_extract_is_a_list_not_a_scalar():
    """The second q359-documented divergence: DuckDB m[k] returns a
    LIST (empty when missing); Spark element_at returns the scalar
    (NULL when missing). q359's portable form is m[k][1] + coalesce."""
    import duckdb

    con = duckdb.connect()
    present, missing = con.execute(
        "SELECT MAP{1: 10}[1], MAP{1: 10}[9]"
    ).fetchone()
    assert present == [10] and missing == []
    assert con.execute(
        "SELECT coalesce(MAP{1: 10}[9][1], -1)"
    ).fetchone()[0] == -1


def test_collation_merges_casing_variants(spark):
    """q361: every UTF8_LCASE group must have merged exactly the two
    deterministic casing variants, and the collated literal filter
    must count the full merged 'building' group."""
    from product_analytics_spark.driver_queries_ext63 import q361_collation_door

    rows = q361_collation_door(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_casings"] == 2
        expect = r["n_customers"] if r["segment"] == "building" else 0
        assert r["n_eq_building_ci"] == expect


def test_xml_roundtrip_certifies_escaping(spark):
    """q362: every row must round-trip through to_xml/from_xml with
    the & entity escaped in the wire form and restored on parse."""
    from product_analytics_spark.driver_queries_ext63 import q362_xml_door

    rows = q362_xml_door(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    for r in rows:
        assert r["roundtrip_ok"] and r["escaped_ok"]
        assert r["parsed_name"].endswith(" & co")
        assert str(r["xp_nation"]) == r["xp_nation_str"]


# ----------------------------------------------- batch-64 certificates


def test_months_between_fractional_divergence(spark):
    """q364-documented divergence #2: Spark months_between is
    FRACTIONAL with a both-month-ends special case; DuckDB
    date_diff('month') counts calendar-boundary crossings — the
    portable form is the integer month index year*12+month."""
    import duckdb

    [r] = spark.sql(
        "SELECT months_between(DATE'2024-03-31', DATE'2024-01-31') a,"
        "       months_between(DATE'2024-03-30', DATE'2024-01-31') b"
    ).collect()
    assert r["a"] == 2.0
    assert abs(r["b"] - 1.96774194) < 1e-8
    con = duckdb.connect()
    a, b = con.execute(
        "SELECT date_diff('month', DATE'2024-01-31', DATE'2024-03-31'),"
        "       date_diff('month', DATE'2024-01-31', DATE'2024-03-30')"
    ).fetchone()
    assert (a, b) == (2, 2)  # boundary count: both land on 2


def test_dayofweek_numbering_divergence(spark):
    """q364-documented divergence #1: Spark dayofweek is 1..7 Sun=1,
    DuckDB dayofweek is 0..6 Sun=0; the portable ISO numbering is
    Spark weekday(d)+1 == DuckDB isodow(d).  2024-02-15 is a
    Thursday."""
    import duckdb

    [r] = spark.sql(
        "SELECT dayofweek(DATE'2024-02-15') dw, weekday(DATE'2024-02-15') wd"
    ).collect()
    assert (r["dw"], r["wd"] + 1) == (5, 4)
    con = duckdb.connect()
    dw, iso = con.execute(
        "SELECT dayofweek(DATE'2024-02-15'), isodow(DATE'2024-02-15')"
    ).fetchone()
    assert (dw, iso) == (4, 4)


def test_bitmap_rollup_matches_exact_distinct(spark):
    """q365: the bitmap_or_agg rollup must equal the exact global
    distinct, and per-priority bitmap counts the exact per-priority
    distinct — on real sf0.001 orders."""
    from product_analytics_spark.driver_queries_ext64 import q365_bitmap_distinct
    from product_analytics_spark.qcommon import _t

    rows = q365_bitmap_distinct(spark, "/root/testdata/sf0.001").collect()
    o = _t(spark, "/root/testdata/sf0.001", "orders")
    total = o.select("o_custkey").distinct().count()
    assert all(r["n_custs_total"] == total for r in rows)
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in o.groupBy("o_orderpriority")
        .agg(__import__("pyspark.sql.functions", fromlist=["F"]).countDistinct(
            "o_custkey").alias("n"))
        .collect()
    }
    assert {r["priority"]: r["n_custs"] for r in rows} == exact


def test_avro_interchange_gate(spark):
    """Round-probed env gate (like tws/protobuf): when the Avro data
    source is loadable, certify a to_avro/from_avro round-trip;
    auto-skip while the package is absent from the sandbox."""
    import pytest

    try:
        from pyspark.sql.avro.functions import from_avro, to_avro

        df = spark.sql("SELECT id FROM range(3)")
        df.select(to_avro("id").alias("b")).collect()
    except Exception:
        pytest.skip("Avro data source not loaded in this environment")
    schema = '{"type":"long"}'
    out = df.select(
        from_avro(to_avro("id"), schema).alias("rt"), "id"
    ).collect()
    assert all(r["rt"] == r["id"] for r in out)


# ----------------------------------------------- batch-65 certificates


def test_stream_source_replay_is_identical(spark):
    """q367's exactly-once claim, tested directly: readBetweenOffsets
    (the restart-replay path) must regenerate byte-identical rows to
    the original read() batches over any offset split."""
    from product_analytics_spark.sources.pyds import CdcStreamReader

    r = CdcStreamReader({"total_rows": "100", "batch_rows": "32"})
    live, off = [], r.initialOffset()
    while True:
        it, nxt = r.read(off)
        batch = list(it)
        if not batch:
            break
        live.extend(batch)
        off = nxt
    assert len(live) == 100
    replay = list(r.readBetweenOffsets({"pos": 0}, {"pos": 100}))
    assert replay == live
    mid = list(r.readBetweenOffsets({"pos": 37}, {"pos": 41}))
    assert mid == live[37:41]


def test_stream_source_restart_continues_from_checkpoint(spark, tmp_path):
    """End-to-end restart: drain a 3-batch feed against a checkpoint,
    stop, then restart the SAME checkpoint with a longer feed — the
    continuation must process only the new offsets and land on the
    closed-form total (no duplicates, no gaps)."""
    from pyspark.sql import functions as F

    from product_analytics_spark.sources import pyds

    pyds.register_stream(spark)
    ckpt = str(tmp_path / "ckpt")

    def run(total):
        src = (
            spark.readStream.format("cdc_stream")
            .option("total_rows", str(total))
            .option("batch_rows", "32")
            .load()
        )
        agg = src.agg(
            F.count(F.lit(1)).alias("n"), F.sum("op_id").alias("s")
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("t367_restart")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        q.awaitTermination(30)
        [row] = spark.sql("SELECT * FROM t367_restart").collect()
        return row["n"], row["s"]

    assert run(96) == (96, 95 * 96 // 2)
    assert run(160) == (160, 159 * 160 // 2)


# ----------------------------------------------- batch-66 certificates


def test_cast_narrowing_divergence(spark):
    """q369-documented divergence #1: CAST(double AS INT) truncates
    toward zero in Spark, rounds in DuckDB — the portable form is an
    explicit floor()/ceil() before the cast."""
    import duckdb

    [r] = spark.sql(
        "SELECT CAST(2.7D AS INT) a, CAST(-2.7D AS INT) b"
    ).collect()
    assert (r["a"], r["b"]) == (2, -2)
    con = duckdb.connect()
    a, b = con.execute(
        "SELECT CAST(CAST(2.7 AS DOUBLE) AS INT), CAST(CAST(-2.7 AS DOUBLE) AS INT)"
    ).fetchone()
    assert (a, b) == (3, -3)


def test_overflow_and_widening_divergence(spark):
    """q369-documented divergence #2: both engines refuse int64*int64
    overflow, but sum(BIGINT) silently widens to HUGEINT in DuckDB
    while Spark (ANSI) raises past 2^63 — DECIMAL(38,0) is the
    portable widening and stays exact in both."""
    import duckdb
    import pytest
    from pyspark.errors import PySparkException

    i64max = 9223372036854775807
    with pytest.raises(PySparkException):
        spark.sql(f"SELECT {i64max}L * 2L").collect()
    con = duckdb.connect()
    with pytest.raises(duckdb.OutOfRangeException):
        con.execute(f"SELECT CAST({i64max} AS BIGINT) * CAST(2 AS BIGINT)")
    # sum widening: DuckDB exact past 2^63; Spark ANSI raises.
    big = con.execute(
        f"SELECT sum(x) FROM (VALUES (CAST({i64max} AS BIGINT)),"
        f" (CAST({i64max} AS BIGINT))) t(x)"
    ).fetchone()[0]
    assert int(big) == 2 * i64max
    with pytest.raises(PySparkException):
        spark.sql(
            f"SELECT sum(x) FROM VALUES ({i64max}L), ({i64max}L) t(x)"
        ).collect()
    # the portable widening, identical in both engines:
    [r] = spark.sql(
        f"SELECT CAST(sum(CAST(x AS DECIMAL(38,0))) AS STRING) s"
        f" FROM VALUES ({i64max}L), ({i64max}L) t(x)"
    ).collect()
    assert r["s"] == str(2 * i64max)
    ds = con.execute(
        f"SELECT CAST(CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0))"
        f" AS VARCHAR) FROM (VALUES (CAST({i64max} AS BIGINT)),"
        f" (CAST({i64max} AS BIGINT))) t(x)"
    ).fetchone()[0]
    assert ds == str(2 * i64max)


# ----------------------------------------------- batch-68 properties


def test_interp_hits_observations_and_stays_bracketed(spark):
    """q373: at every observed grid day the lerp must reproduce the
    observation exactly, and every interpolated value must lie within
    its bracketing observations."""
    from pyspark.sql import functions as F

    from product_analytics_spark.driver_queries_ext68 import (
        INTERP_KEY_MOD,
        q373_linear_interp_resample,
    )
    from product_analytics_spark.qcommon import _money_cents, _t

    sf = "/root/testdata/sf0.001"
    rows = q373_linear_interp_resample(spark, sf).collect()
    obs = {
        r["x"]: r["y"]
        for r in _t(spark, sf, "orders")
        .select(
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1992-01-01").cast("date")
            ).alias("x"),
            _money_cents("o_totalprice").alias("c"),
        )
        .filter(F.col("x") % INTERP_KEY_MOD == 0)
        .groupBy("x")
        .agg(F.sum("c").alias("y"))
        .collect()
    }
    xs = sorted(obs)
    for r in rows:
        if r["is_observed"]:
            assert r["cents_interp"] == obs[r["day_idx"]]
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r["seg_start"], []).append(r["cents_interp"])
    for s, vals in by_seg.items():
        nxt = xs[xs.index(s) + 1]
        lo, hi = min(obs[s], obs[nxt]), max(obs[s], obs[nxt])
        assert all(lo - 1 <= v <= hi for v in vals), (s, lo, hi)


def test_lttb_keeps_endpoints_and_one_point_per_bucket(spark):
    """q372: the LTTB endpoint rule — first bucket keeps the series'
    first day, last bucket keeps its last day — and exactly one row
    per bucket."""
    from product_analytics_spark.driver_queries_ext68 import q372_lttb_downsample

    rows = q372_lttb_downsample(spark, "/root/testdata/sf0.001").collect()
    bkts = [r["bkt"] for r in rows]
    assert len(bkts) == len(set(bkts))
    days = [r["day"] for r in rows]
    assert days == sorted(days)
    assert rows[0]["score"] == -1 and rows[-1]["score"] == -1


# ----------------------------------------------- batch-69 certificates


def test_dynamic_vs_static_partition_overwrite(spark, tmp_path):
    """q374's documented divergence: with partitionOverwriteMode=
    static (the default), INSERT OVERWRITE truncates the whole table
    before writing — dynamic mode replaces only the incoming
    partitions. Both modes demonstrated on a 2-partition toy table."""
    path = str(tmp_path / "t")
    tbl = "t374_props"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "id int, p string"
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    try:
        (
            df.write.mode("overwrite")
            .format("parquet")
            .partitionBy("p")
            .option("path", path)
            .saveAsTable(tbl)
        )
        spark.createDataFrame([(9, "a")], "id int, p string").createOrReplaceTempView(
            "t374_in"
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        spark.sql(
            f"INSERT OVERWRITE TABLE {tbl} PARTITION (p) SELECT id, p FROM t374_in"
        )
        rows = {(r["id"], r["p"]) for r in spark.table(tbl).collect()}
        assert rows == {(9, "a"), (3, "b")}  # partition b untouched
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
        spark.sql(
            f"INSERT OVERWRITE TABLE {tbl} PARTITION (p) SELECT id, p FROM t374_in"
        )
        rows = {(r["id"], r["p"]) for r in spark.table(tbl).collect()}
        assert rows == {(9, "a")}  # static truncated partition b
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


# ----------------------------------------------- batch-71 certificates


def test_regex_backreference_divergence(spark):
    """q383-documented divergence: Spark (Java regex) supports
    backreferences; DuckDB (RE2) rejects the pattern outright —
    portable regexes must stay backreference-free."""
    import duckdb
    import pytest

    [r] = spark.sql(r"SELECT 'abcabc' RLIKE '(abc)\\1' AS m").collect()
    assert r["m"] is True
    con = duckdb.connect()
    with pytest.raises(duckdb.Error):
        con.execute(r"SELECT regexp_matches('abcabc', '(abc)\1')")


# ----------------------------------------------- batch-75 properties


def test_corpus_funnel_is_monotone_and_partitions(spark):
    """q388: survivors must shrink monotonically through the gates,
    and the three splits must exactly partition the final corpus."""
    from product_analytics_spark.driver_queries_ext75 import (
        q388_corpus_build_funnel,
    )

    rows = {r["stage"]: r["docs"] for r in q388_corpus_build_funnel(
        spark, "/root/testdata/sf0.001").collect()}
    assert (
        rows["ingest"]
        >= rows["quality_gate"]
        >= rows["language_policy"]
        >= rows["exact_dedup"]
        >= rows["near_dup_dedup"]
    )
    assert rows["near_dup_dedup"] > 0
    assert (
        rows["split_train"] + rows["split_val"] + rows["split_test"]
        == rows["near_dup_dedup"]
    )


# ----------------------------------------------- batch-78 certificates


def test_calendar_name_abbreviation_divergence(spark):
    """q392-documented divergence: Spark monthname/dayname are
    ABBREVIATED; DuckDB's same-named functions are FULL names — the
    portable form is the format pattern (MMMM/EEEE vs %B/%A)."""
    import duckdb

    [r] = spark.sql(
        "SELECT monthname(DATE'2024-02-15') m, dayname(DATE'2024-02-15') d"
    ).collect()
    assert (r["m"], r["d"]) == ("Feb", "Thu")
    con = duckdb.connect()
    m, d = con.execute(
        "SELECT monthname(DATE'2024-02-15'), dayname(DATE'2024-02-15')"
    ).fetchone()
    assert (m, d) == ("February", "Thursday")


# ------------------------------------------ corpus pipeline (hypothesis)


def test_corpus_pipeline_dedup_completeness(spark):
    """Property over generated corpora: after the pipeline, no two
    SURVIVING documents may share identical text (exact-dedup
    completeness survives composition with every other stage), every
    survivor must pass the quality/language gates, and the funnel
    counts must equal direct recomputation."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from product_analytics_spark.pipelines.corpus_build import (
        KEEP_LANGS,
        MIN_CHARS,
        corpus_build,
    )

    texts = st.sampled_from(
        [
            "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3,
            "one two three four five six seven eight nine ten eleven " * 3,
            "red green blue cyan magenta yellow black white gray pink " * 3,
            "short text",  # fails the quality gate
        ]
    )
    langs = st.sampled_from(["en", "de", "zh"])

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(docs=st.lists(st.tuples(texts, langs), min_size=1, max_size=12))
    def run(docs):
        df = spark.createDataFrame(
            [
                (i, t, lang, len(t))
                for i, (t, lang) in enumerate(docs)
            ],
            "doc_id long, text string, lang string, n_chars long",
        )
        final, funnel = corpus_build(spark, df)
        rows = final.collect()
        seen = [r["text"] for r in rows]
        assert len(seen) == len(set(seen)), "exact duplicates survived"
        for r in rows:
            assert r["lang"] in KEEP_LANGS
            assert len(r["text"]) >= MIN_CHARS
        f = {x["stage"]: x["docs"] for x in funnel.collect()}
        assert f["ingest"] == len(docs)
        assert f["near_dup_dedup"] == len(rows)

    run()
