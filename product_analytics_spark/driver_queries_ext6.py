"""Round-3 driver query families, batch 5 (q154+): corpus boilerplate
removal, sketch-accuracy evaluation (the approx path the scale notes
promise, actually exercised), CUPED variance reduction, join-key skew
profiling, mergeable aggregate state (incremental-MV algebra), and a
Benford first-digit audit.

Same contract as the other driver_queries modules: every query has a
DuckDB oracle that reproduces the result bit-for-bit (portable md5
hashing, exact integer sums, fixed-order IEEE finishes).
"""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from product_analytics_spark.operators import text
from product_analytics_spark.qcommon import (
    _cents_out,
    _dec2dbl_sql,
    _hash60_sql,
    _money_cents,
    _t,
)


def _hex15(s: str) -> str:
    """DuckDB positional hex parse of a 15-char md5 prefix -> BIGINT
    (the lambda-variable form: the md5 digest is computed once per
    token, this expression only re-reads the cheap 15-char string)."""
    return (
        "CAST(list_sum(list_transform(generate_series(1,15), i -> "
        f"CAST(strpos('0123456789abcdef', substring({s}, i, 1)) - 1 AS BIGINT)"
        " * (CAST(1 AS BIGINT) << (4*(15-i))))) AS BIGINT)"
    )


# ------------------------------------------------------------- q154

SEG_TOKENS = 4      # non-overlapping segment width (tokens)
BOILER_MIN_DF = 2   # segment is boilerplate if carried by > 2 documents


def q154_segment_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate segment removal (the CCNet /
    RefinedWeb line-dedup step re-expressed over token segments, since
    the corpus has no newlines): chop each document's token stream
    into non-overlapping SEG_TOKENS-token segments, hash each segment
    (portable md5 token hashes, affine fold — the same field as the
    MinHash machinery), count per-segment document frequency, and mark
    segments carried by more than BOILER_MIN_DF documents as
    boilerplate (the absolute cutoff CCNet uses for repeated lines).
    Per-doc output: segment counts, boilerplate hits, tokens retained
    after stripping boilerplate segments.

    Scale: the segment relation carries (doc_id, 8-byte hash) — never
    document text; the DF count is one hash-agg on the segment hash;
    the boilerplate set is by construction tiny (high-DF survivors),
    so the tagging join broadcasts and the whole screen runs at scan
    speed. This is the exact shape of production line-dedup at 100 TB
    (hash lines, count, broadcast-semi-join the blocklist)."""
    d = _t(spark, sf_dir, "documents")
    th = d.select(
        "doc_id",
        text.token_hashes31(F.col("text")).alias("h"),
    ).withColumn("n", F.size("h"))
    nseg = F.floor(F.col("n") / F.lit(SEG_TOKENS)).cast("int")

    def _fold(i):
        acc = F.element_at(F.col("h"), i * SEG_TOKENS + 1)
        for r in range(1, SEG_TOKENS):
            acc = (
                acc * F.lit(text.BAND_FOLD_A)
                + F.element_at(F.col("h"), i * SEG_TOKENS + 1 + r)
            ) % F.lit(text.P31)
        return acc

    seg = th.select(
        "doc_id",
        "n",
        F.explode_outer(
            F.when(nseg > 0, F.transform(F.sequence(F.lit(0), nseg - 1), _fold))
        ).alias("hv"),
    )
    dfc = (
        seg.filter(F.col("hv").isNotNull())
        .groupBy("hv")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    boiler = dfc.filter(F.col("df") > BOILER_MIN_DF).select(
        "hv", F.lit(1).alias("b")
    )
    per = (
        seg.join(F.broadcast(boiler), "hv", "left")
        .groupBy("doc_id", "n")
        .agg(
            F.count("hv").alias("n_segments"),
            F.count("b").alias("n_boiler"),
        )
    )
    share = F.col("n_boiler") / F.col("n_segments").cast("double")
    return per.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_tokens"),
        "n_segments",
        "n_boiler",
        (F.col("n") - F.col("n_boiler") * F.lit(SEG_TOKENS))
        .cast("bigint")
        .alias("kept_tokens"),
        F.round(F.when(F.col("n_segments") > 0, share).otherwise(0.0), 6).alias(
            "boiler_share"
        ),
    )


def _q154_sql() -> str:
    p = text.P31
    sg = SEG_TOKENS
    acc = f"h[(i-1)*{sg} + 1]"
    for r in range(1, sg):
        acc = f"(({acc}) * {text.BAND_FOLD_A} + h[(i-1)*{sg} + 1 + {r}]) % {p}"
    return f"""
WITH tok AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
),
th AS (
  SELECT doc_id,
         list_transform(list_transform(t, x -> substring(md5(x), 1, 15)),
                        s -> {_hex15('s')} % {p}) AS h,
         len(t) AS n
  FROM tok
),
seg AS (
  SELECT doc_id, n,
         unnest(CASE WHEN n >= {sg}
           THEN list_transform(generate_series(1, n // {sg}), i -> {acc})
           ELSE CAST([NULL] AS BIGINT[]) END) AS hv
  FROM th
),
dfc AS (
  SELECT hv, count(DISTINCT doc_id) AS df FROM seg
  WHERE hv IS NOT NULL GROUP BY 1
),
boiler AS (SELECT hv FROM dfc WHERE df > {BOILER_MIN_DF}),
per AS (
  SELECT s.doc_id, s.n,
         count(s.hv) AS n_segments,
         count(b.hv) AS n_boiler
  FROM seg s LEFT JOIN boiler b ON b.hv = s.hv
  GROUP BY s.doc_id, s.n
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_tokens,
       n_segments,
       n_boiler,
       CAST(n - n_boiler * {sg} AS BIGINT) AS kept_tokens,
       round(CASE WHEN n_segments > 0
             THEN CAST(n_boiler AS DOUBLE) / CAST(n_segments AS DOUBLE)
             ELSE 0.0 END, 6) AS boiler_share
FROM per
"""


# ------------------------------------------------------------- q155

HLL_RSD = 0.02
HLL_REL_GATE = 0.05
PCTL_ACCURACY = 10_000


def q155_sketch_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy evaluation — actually RUNS the approximate
    aggregates the scale docs name as 100 TB swap-ins
    (approx_count_distinct = HLL++, percentile_approx = KLL-style
    rank sketch) and checks them in-plan against the exact answers:

      * hll_ok: |approx - exact| <= max(5% * exact, 2)
      * pct_ok: the approx median's rank interval [#(<v)+1, #(<=v)]
        intersects the true median rank band +- (n/100 + 2)

    The emitted columns are the exact statistics plus the two check
    booleans, so the oracle (which cannot reproduce the sketches)
    verifies the exact side and asserts the guarantees held (TRUE
    literals). Two passes: pass 1 aggregates exact+sketch per group;
    pass 2 ranks the approx median (broadcast of |groups| scalars).
    At 100 TB the exact pass is dropped and ONLY the sketch pass
    remains — this query is the harness proving that swap is safe."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        "o_custkey",
        _money_cents("o_totalprice").alias("c"),
    )
    # The exact distinct count lives in its OWN two-level agg: putting
    # countDistinct in the same agg as the sketch buffers rewrites the
    # whole aggregate through Expand (2x rows), dragging every
    # TypedImperativeAggregate buffer through the distinct path —
    # measured 4.7s vs 0.6s at sf0.1. distinct->count is the same
    # partial-combine plan countDistinct compiles to, minus the
    # poisoned co-aggregation; the 5-row join back is broadcast.
    a1 = o.groupBy("prio").agg(
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct("o_custkey", rsd=HLL_RSD).alias("nd_approx"),
        F.percentile("c", F.lit(0.5)).alias("med"),
        F.percentile_approx("c", F.lit(0.5), F.lit(PCTL_ACCURACY)).alias("amed"),
    )
    nd = (
        o.select("prio", "o_custkey")
        .distinct()
        .groupBy("prio")
        .agg(F.count(F.lit(1)).alias("nd"))
    )
    a1 = a1.join(F.broadcast(nd), "prio")
    ranks = (
        o.join(F.broadcast(a1.select("prio", "amed")), "prio")
        .groupBy("prio")
        .agg(
            F.sum(F.when(F.col("c") < F.col("amed"), 1).otherwise(0)).alias("r_lt"),
            F.sum(F.when(F.col("c") <= F.col("amed"), 1).otherwise(0)).alias("r_le"),
        )
    )
    tol2 = (F.col("n") * 2 / F.lit(100)).cast("bigint") + F.lit(4)
    hll_gate = F.greatest(
        F.ceil(F.lit(HLL_REL_GATE) * F.col("nd")), F.lit(2)
    )
    return (
        a1.join(ranks, "prio")
        .select(
            F.col("prio").alias("o_orderpriority"),
            F.col("n").alias("n_orders"),
            F.col("nd").alias("n_customers"),
            (F.col("med") / F.lit(100.0)).alias("median_price"),
            (F.abs(F.col("nd_approx") - F.col("nd")) <= hll_gate).alias("hll_ok"),
            (
                (F.lit(2) * F.col("r_le") >= F.col("n") - tol2)
                & (F.lit(2) * F.col("r_lt") <= F.col("n") + tol2)
            ).alias("pct_ok"),
        )
    )


Q155_SQL = """
WITH c AS (
  SELECT o_orderpriority AS prio, o_custkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
  FROM orders
)
SELECT prio AS o_orderpriority,
       count(*) AS n_orders,
       count(DISTINCT o_custkey) AS n_customers,
       quantile_cont(c, 0.5) / 100.0 AS median_price,
       TRUE AS hll_ok,
       TRUE AS pct_ok
FROM c GROUP BY 1
"""


# ------------------------------------------------------------- q156

CUPED_CUT = dt.datetime(1998, 1, 1)


def q156_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for an A/B readout: units are
    customers (deterministic md5-parity arm assignment — the portable
    hash, so the oracle splits identically), X = pre-period spend,
    Y = experiment-period spend, theta = cov(X,Y)/var(X) fit on the
    pooled population, adjusted metric Y - theta*(X - mean(X)).

    All moments are exact integer cents power sums (DECIMAL(38,0) on
    the per-customer relation — |customers| rows, off the hot path);
    theta / means / variances are fixed-order double finishes the
    oracle mirrors expression-for-expression, so the readout is
    bit-stable at any cluster size. Plan: one customer-keyed
    conditional agg (the only full-data shuffle), one 2-row arm agg,
    window-derived pooled sums (no constant-key join)."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.when(F.col("o_orderdate") < F.lit(CUPED_CUT), _money_cents("o_totalprice"))
        .otherwise(F.lit(0))
        .alias("xc"),
        F.when(F.col("o_orderdate") >= F.lit(CUPED_CUT), _money_cents("o_totalprice"))
        .otherwise(F.lit(0))
        .alias("yc"),
    )
    per = o.groupBy("o_custkey").agg(
        F.sum("xc").alias("x"), F.sum("yc").alias("y")
    )
    arm = (text.portable_hash60(F.col("o_custkey").cast("string")) % 2).alias("arm")
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    a = per.select(arm, "x", "y", xd.alias("xd"), yd.alias("yd")).groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("xd") * F.col("xd")).alias("sxx"),
        F.sum(F.col("xd") * F.col("yd")).alias("sxy"),
        F.sum(F.col("yd") * F.col("yd")).alias("syy"),
    )
    w = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    g = a.select(
        "*",
        F.sum("n").over(w).alias("gn"),
        F.sum("sx").over(w).alias("gsx"),
        F.sum("sy").over(w).alias("gsy"),
        F.sum("sxx").over(w).alias("gsxx"),
        F.sum("sxy").over(w).alias("gsxy"),
    )
    gnd = F.col("gn").cast("double")
    gsxd = F.col("gsx").cast("double")
    gsyd = F.col("gsy").cast("double")
    gsxxd = F.col("gsxx").cast("double")
    gsxyd = F.col("gsxy").cast("double")
    theta = (gnd * gsxyd - gsxd * gsyd) / (gnd * gsxxd - gsxd * gsxd)
    mean_x_g = gsxd / gnd
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    sxxd = F.col("sxx").cast("double")
    sxyd = F.col("sxy").cast("double")
    syyd = F.col("syy").cast("double")
    vy = syyd / nd - (syd / nd) * (syd / nd)
    cxy = sxyd / nd - (sxd / nd) * (syd / nd)
    vx = sxxd / nd - (sxd / nd) * (sxd / nd)
    vy_cuped = vy - F.lit(2.0) * theta * cxy + theta * theta * vx
    return g.select(
        F.col("arm").cast("bigint").alias("arm"),
        F.col("n").alias("n_customers"),
        (sxd / nd / F.lit(100.0)).alias("mean_pre"),
        (syd / nd / F.lit(100.0)).alias("mean_post"),
        ((syd - theta * (sxd - nd * mean_x_g)) / nd / F.lit(100.0)).alias(
            "mean_post_cuped"
        ),
        F.round(theta, 6).alias("theta"),
        F.round(F.lit(1.0) - vy_cuped / vy, 6).alias("var_reduction"),
    )


def _q156_sql() -> str:
    return f"""
WITH per AS (
  SELECT o_custkey,
         sum(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
             THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             ELSE 0 END) AS x,
         sum(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
             THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             ELSE 0 END) AS y
  FROM orders GROUP BY 1
),
a AS (
  SELECT {_hash60_sql('CAST(o_custkey AS VARCHAR)')} % 2 AS arm,
         count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))) AS sxx,
         sum(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS sxy,
         sum(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS syy
  FROM per GROUP BY 1
),
g AS (
  SELECT *,
         sum(n) OVER () AS gn, sum(sx) OVER () AS gsx, sum(sy) OVER () AS gsy,
         sum(sxx) OVER () AS gsxx, sum(sxy) OVER () AS gsxy
  FROM a
),
d AS (
  SELECT arm, n,
         CAST(n AS DOUBLE) AS nd,
         CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
         {_dec2dbl_sql('sxx')} AS sxxd, {_dec2dbl_sql('sxy')} AS sxyd,
         {_dec2dbl_sql('syy')} AS syyd,
         CAST(gn AS DOUBLE) AS gnd,
         CAST(gsx AS DOUBLE) AS gsxd, CAST(gsy AS DOUBLE) AS gsyd,
         {_dec2dbl_sql('gsxx')} AS gsxxd, {_dec2dbl_sql('gsxy')} AS gsxyd
  FROM g
),
f AS (
  SELECT arm, n, nd, sxd, syd, sxxd, sxyd, syyd,
         (gnd * gsxyd - gsxd * gsyd) / (gnd * gsxxd - gsxd * gsxd) AS theta,
         gsxd / gnd AS mean_x_g
  FROM d
),
v AS (
  SELECT arm, n, nd, sxd, syd, theta, mean_x_g,
         syyd / nd - (syd / nd) * (syd / nd) AS vy,
         sxyd / nd - (sxd / nd) * (syd / nd) AS cxy,
         sxxd / nd - (sxd / nd) * (sxd / nd) AS vx
  FROM f
)
SELECT CAST(arm AS BIGINT) AS arm,
       n AS n_customers,
       sxd / nd / 100.0 AS mean_pre,
       syd / nd / 100.0 AS mean_post,
       (syd - theta * (sxd - nd * mean_x_g)) / nd / 100.0 AS mean_post_cuped,
       round(theta, 6) AS theta,
       round(1.0 - (vy - 2.0 * theta * cxy + theta * theta * vx) / vy, 6)
         AS var_reduction
FROM v
"""


# ------------------------------------------------------------- q157

def q157_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profiler — the diagnostic that decides when the
    salted-agg / AQE-skew machinery (q55, q110) is needed: per-key
    frequencies of lineitem.l_partkey bucketed into power-of-two
    bands (bucket = floor(log2(freq)) via binary-string length — no
    transcendental, so no boundary ULP drift between engines), with
    key counts, row mass, and row share per band.

    Plan: ONE key hash-agg (the same shuffle the real join would do),
    then a |keys|-row band agg and a window total over the |bands|-row
    relation. At 100 TB this runs as a sampled sidecar (TABLESAMPLE on
    the probe side) — the band arithmetic is unchanged."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey")
    k = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
    b = (
        k.select((F.length(F.bin(F.col("cnt"))) - F.lit(1)).alias("freq_bucket"), "cnt")
        .groupBy("freq_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("cnt").alias("n_rows"),
            F.max("cnt").alias("max_freq"),
        )
    )
    w = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    total = F.sum("n_rows").over(w)
    return b.select(
        F.col("freq_bucket").cast("bigint").alias("freq_bucket"),
        "n_keys",
        "n_rows",
        F.round(F.col("n_rows").cast("double") / total.cast("double"), 6).alias(
            "row_share"
        ),
        "max_freq",
    )


Q157_SQL = """
WITH k AS (SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY 1),
b AS (
  SELECT CAST(length(bin(cnt)) - 1 AS BIGINT) AS freq_bucket,
         count(*) AS n_keys,
         sum(cnt) AS n_rows,
         max(cnt) AS max_freq
  FROM k GROUP BY 1
)
SELECT freq_bucket, n_keys,
       CAST(n_rows AS BIGINT) AS n_rows,
       round(CAST(n_rows AS DOUBLE) / CAST(sum(n_rows) OVER () AS DOUBLE), 6)
         AS row_share,
       max_freq
FROM b
"""


# ------------------------------------------------------------- q158

STATE_SPLIT = dt.datetime(1998, 1, 1)


def q158_agg_state_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable aggregate state — the algebra under incremental
    materialized-view maintenance: build per-group states (count, sum,
    min, max, sum-of-squares) over the historical partition and the
    new batch SEPARATELY, merge the two state relations algebraically
    (sum/sum/min/max/sum), and finish mean/variance from the merged
    exact sums. The oracle recomputes from scratch in one pass —
    passing proves merge(state(A), state(B)) == state(A ∪ B) exactly,
    not approximately (integer cents sums are associative; only the
    final fixed-order division touches floats).

    At 100 TB the old state is a stored |groups|-row table and only
    the new batch is scanned — this query is that refresh step run
    end-to-end."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderdate", _money_cents("o_totalprice").alias("c")
    )

    def state(df: DataFrame) -> DataFrame:
        cd = F.col("c").cast("decimal(38,0)")
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("c").alias("s1"),
            F.min("c").alias("mn"),
            F.max("c").alias("mx"),
            F.sum(cd * cd).alias("s2"),
        )

    old = state(o.filter(F.col("o_orderdate") < F.lit(STATE_SPLIT)))
    new = state(o.filter(F.col("o_orderdate") >= F.lit(STATE_SPLIT)))
    merged = (
        old.unionByName(new)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n").alias("n"),
            F.sum("s1").alias("s1"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
            F.sum("s2").alias("s2"),
        )
    )
    nd = F.col("n").cast("double")
    m1 = F.col("s1").cast("double") / nd
    m2 = F.col("s2").cast("double") / nd
    return merged.select(
        "o_orderpriority",
        F.col("n").alias("n_orders"),
        (m1 / F.lit(100.0)).alias("mean_price"),
        ((m2 - m1 * m1) / F.lit(10000.0)).alias("var_price"),
        _cents_out(F.col("mn")).alias("min_price"),
        _cents_out(F.col("mx")).alias("max_price"),
    )


def _q158_sql() -> str:
    return f"""
WITH c AS (
  SELECT o_orderpriority,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
  FROM orders
),
s AS (
  SELECT o_orderpriority,
         count(*) AS n,
         sum(c) AS s1,
         min(c) AS mn,
         max(c) AS mx,
         sum(CAST(c AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0))) AS s2
  FROM c GROUP BY 1
),
d AS (
  SELECT o_orderpriority, n, mn, mx,
         CAST(n AS DOUBLE) AS nd,
         CAST(s1 AS DOUBLE) AS s1d,
         {_dec2dbl_sql('s2')} AS s2d
  FROM s
)
SELECT o_orderpriority,
       n AS n_orders,
       s1d / nd / 100.0 AS mean_price,
       (s2d / nd - (s1d / nd) * (s1d / nd)) / 10000.0 AS var_price,
       mn / 100.0 AS min_price,
       mx / 100.0 AS max_price
FROM d
"""


# ------------------------------------------------------------- q159

BENFORD_EXPECTED = {d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)}


def q159_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit on order totals — the classic
    financial-data-quality screen: observed leading-digit shares vs
    Benford's expected log10(1 + 1/d), with per-digit chi-square
    contributions. The expected shares are Python-computed literals
    injected into BOTH engines (no engine log10 at all — transcendental
    libm calls are the one place two engines legally differ by an
    ulp). Leading digit via string head of the exact cents integer
    (shift by 100 preserves the leading digit). Plan: one 9-group
    hash-agg + a window total over the 9-row relation."""
    o = _t(spark, sf_dir, "orders").select(
        F.substring(_money_cents("o_totalprice").cast("string"), 1, 1).alias("d")
    )
    g = o.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    total = F.sum("n").over(w).cast("double")
    exp = F.lit(None).cast("double")
    for dig, e in BENFORD_EXPECTED.items():
        exp = F.when(F.col("d") == str(dig), F.lit(e)).otherwise(exp)
    obs = F.col("n").cast("double") / total
    diff = obs - exp
    return g.select(
        F.col("d").alias("lead_digit"),
        F.col("n").alias("n_orders"),
        F.round(obs, 6).alias("obs_share"),
        exp.alias("exp_share"),
        F.round(total * diff * diff / exp, 6).alias("chi2_term"),
    )


def _q159_sql() -> str:
    case = " ".join(
        f"WHEN d = '{dig}' THEN {e!r}" for dig, e in BENFORD_EXPECTED.items()
    )
    return f"""
WITH c AS (
  SELECT substring(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS VARCHAR), 1, 1) AS d
  FROM orders
),
g AS (SELECT d, count(*) AS n FROM c GROUP BY 1),
t AS (
  SELECT d, n,
         CAST(sum(n) OVER () AS DOUBLE) AS total,
         CASE {case} END AS exp
  FROM g
)
SELECT d AS lead_digit,
       n AS n_orders,
       round(CAST(n AS DOUBLE) / total, 6) AS obs_share,
       exp AS exp_share,
       round(total * ((CAST(n AS DOUBLE) / total) - exp)
                   * ((CAST(n AS DOUBLE) / total) - exp) / exp, 6) AS chi2_term
FROM t
"""


QUERIES_EXT6 = {
    "q154_segment_boilerplate": q154_segment_boilerplate,
    "q155_sketch_accuracy": q155_sketch_accuracy,
    "q156_cuped_adjustment": q156_cuped_adjustment,
    "q157_key_skew_profile": q157_key_skew_profile,
    "q158_agg_state_merge": q158_agg_state_merge,
    "q159_benford_audit": q159_benford_audit,
}

ORACLES_EXT6 = {
    "q154_segment_boilerplate": _q154_sql(),
    "q155_sketch_accuracy": Q155_SQL,
    "q156_cuped_adjustment": _q156_sql(),
    "q157_key_skew_profile": Q157_SQL,
    "q158_agg_state_merge": _q158_sql(),
    "q159_benford_audit": _q159_sql(),
}
