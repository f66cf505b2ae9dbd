"""Round-4 driver query families, batch 28 (q230-q233): k-anonymity
audit, entity-resolution blocking quality, late-arriving dimension
(inferred members), and price-volume-mix variance decomposition.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _t

# ------------------------------------------------------------- q230

K_ANON = 5


def q230_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X193: k-anonymity audit with one generalization step — the
    data-governance gate before a table leaves the boundary: under
    quasi-identifiers (nation, first-order year, order-count tier),
    every equivalence class must hold at least k={K_ANON} individuals
    or its members are re-identifiable. The audit computes class sizes
    at two generalization levels — exact year, then year coarsened to
    a 5-year band (one step up the generalization lattice) — and
    reports, per level: classes, violating classes, exposed
    individuals, and the anonymity floor (min class size). The
    coarser level must dominate (fewer-or-equal violations) — the
    monotonicity a generalization search relies on.

    All counts integer; one customer-keyed agg then two small
    class-keyed aggs.

    Scale: class-size computation is a hash agg on the QI tuple; the
    skew risk is the OPPOSITE of usual — huge classes are GOOD here;
    tiny classes (the violations) are by definition small data."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    per_cust = (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_nationkey")
        .agg(
            F.min(F.year("o_orderdate")).alias("first_year"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            "c_custkey",
            "c_nationkey",
            "first_year",
            F.when(F.col("n_orders") >= 20, F.lit("high"))
            .when(F.col("n_orders") >= 10, F.lit("mid"))
            .otherwise(F.lit("low"))
            .alias("tier"),
        )
    )

    def level(name: str, year_col) -> DataFrame:
        classes = per_cust.groupBy(
            F.col("c_nationkey"), year_col.alias("yr"), F.col("tier")
        ).agg(F.count(F.lit(1)).alias("class_size"))
        return classes.agg(
            F.lit(name).alias("level"),
            F.count(F.lit(1)).cast("bigint").alias("n_classes"),
            F.sum(F.when(F.col("class_size") < K_ANON, 1).otherwise(0))
            .cast("bigint")
            .alias("violating_classes"),
            F.sum(
                F.when(F.col("class_size") < K_ANON, F.col("class_size")).otherwise(0)
            )
            .cast("bigint")
            .alias("exposed_individuals"),
            F.min("class_size").cast("bigint").alias("anonymity_floor"),
        )

    exact = level("year_exact", F.col("first_year"))
    coarse = level(
        "year_5band", F.expr("CAST(first_year div 5 AS BIGINT) * 5")
    )
    return exact.unionByName(coarse)


Q230_SQL = f"""
WITH per_cust AS (
  SELECT c.c_custkey, c.c_nationkey,
         min(year(CAST(o.o_orderdate AS DATE))) AS first_year,
         CASE WHEN count(*) >= 20 THEN 'high'
              WHEN count(*) >= 10 THEN 'mid' ELSE 'low' END AS tier
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey, c.c_nationkey
),
exact AS (
  SELECT c_nationkey, first_year AS yr, tier, count(*) AS class_size
  FROM per_cust GROUP BY 1, 2, 3
),
coarse AS (
  SELECT c_nationkey, CAST(first_year // 5 AS BIGINT) * 5 AS yr, tier,
         count(*) AS class_size
  FROM per_cust GROUP BY 1, 2, 3
)
SELECT 'year_exact' AS level,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(CASE WHEN class_size < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
         AS violating_classes,
       CAST(sum(CASE WHEN class_size < {K_ANON} THEN class_size ELSE 0 END)
            AS BIGINT) AS exposed_individuals,
       CAST(min(class_size) AS BIGINT) AS anonymity_floor
FROM exact
UNION ALL
SELECT 'year_5band',
       CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN class_size < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CASE WHEN class_size < {K_ANON} THEN class_size ELSE 0 END)
            AS BIGINT),
       CAST(min(class_size) AS BIGINT)
FROM coarse
"""


# ------------------------------------------------------------- q231


def q231_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X194: entity-resolution blocking quality — the two numbers that
    justify any blocking scheme before the pairwise matcher runs:
    REDUCTION RATIO (what fraction of the all-pairs space the blocks
    prune) and PAIR COMPLETENESS (what fraction of true matches
    survive blocking). Ground truth = documents sharing an exact
    normalized-text fingerprint (X1's definition); candidate pairs =
    pairs co-blocked by (lang, first token). Counts use the n·(n−1)/2
    identity per block / per truth-group — NO pair relation is ever
    materialized, so the audit itself scales to corpora where
    all-pairs would not.

    Ratios are final per-row doubles over exact integer pair counts.

    Scale: two hash aggs (block sizes, truth-group sizes) + one
    block-keyed semi-join to count surviving true pairs; the audit
    costs O(|docs|), not O(|docs|²)."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.md5(F.lower(F.trim("text"))).alias("fp"),
        F.substring_index(F.trim("text"), " ", 1).alias("tok1"),
    )
    n_docs = d.count()
    total_pairs = n_docs * (n_docs - 1) // 2
    # Three groupings of the same relation, folded to ONE row via a
    # tagged union + conditional sums (three 1-row scalar joins would
    # constant-fold to nested-loop joins — the plan-guard lesson from
    # q216). True pairs that SURVIVE blocking: within a fingerprint
    # group, members sharing the block key pair up — the same
    # n·(n−1)/2 identity at (fp, block-key) grain.
    tagged = (
        d.groupBy("lang", "tok1")
        .agg(F.count(F.lit(1)).alias("sz"))
        .select(F.lit("b").alias("tag"), "sz")
        .unionByName(
            d.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("sz"))
            .select(F.lit("t").alias("tag"), "sz")
        )
        .unionByName(
            d.groupBy("fp", "lang", "tok1")
            .agg(F.count(F.lit(1)).alias("sz"))
            .select(F.lit("s").alias("tag"), "sz")
        )
    )
    row = tagged.agg(
        F.sum(F.when(F.col("tag") == "b", F.expr("sz * (sz - 1) div 2")))
        .cast("bigint")
        .alias("candidate_pairs"),
        F.sum(F.when(F.col("tag") == "t", F.expr("sz * (sz - 1) div 2")))
        .cast("bigint")
        .alias("true_pairs"),
        F.sum(F.when(F.col("tag") == "s", F.expr("sz * (sz - 1) div 2")))
        .cast("bigint")
        .alias("surviving_true_pairs"),
    )
    return row.select(
        F.lit(n_docs).cast("bigint").alias("n_docs"),
        F.lit(total_pairs).cast("bigint").alias("total_pairs"),
        "candidate_pairs",
        "true_pairs",
        "surviving_true_pairs",
        (
            F.lit(1.0)
            - F.col("candidate_pairs") / F.lit(float(total_pairs))
        ).alias("reduction_ratio"),
        # Vacuously complete when the corpus holds no true duplicate
        # pairs at all (0/0 — and this harness corpus has none at
        # some SFs); blocking can't lose what doesn't exist.
        F.when(F.col("true_pairs") == 0, F.lit(1.0))
        .otherwise(F.col("surviving_true_pairs") / F.col("true_pairs"))
        .alias("pair_completeness"),
    )


Q231_SQL = """
WITH d AS (
  SELECT doc_id, lang, md5(lower(trim(text))) AS fp,
         CASE WHEN strpos(trim(text), ' ') = 0 THEN trim(text)
              ELSE substr(trim(text), 1, strpos(trim(text), ' ') - 1) END
           AS tok1
  FROM documents
),
n AS (SELECT count(*) AS n_docs FROM d),
blocks AS (SELECT lang, tok1, count(*) AS bs FROM d GROUP BY 1, 2),
cand AS (
  SELECT CAST(sum(bs * (bs - 1) // 2) AS BIGINT) AS candidate_pairs
  FROM blocks
),
truth AS (SELECT fp, count(*) AS ts FROM d GROUP BY fp),
tp AS (
  SELECT CAST(sum(ts * (ts - 1) // 2) AS BIGINT) AS true_pairs FROM truth
),
surv AS (
  SELECT CAST(sum(ss * (ss - 1) // 2) AS BIGINT) AS surviving_true_pairs
  FROM (SELECT fp, lang, tok1, count(*) AS ss FROM d GROUP BY 1, 2, 3)
)
SELECT CAST(n.n_docs AS BIGINT) AS n_docs,
       CAST(n.n_docs * (n.n_docs - 1) // 2 AS BIGINT) AS total_pairs,
       cand.candidate_pairs,
       tp.true_pairs,
       surv.surviving_true_pairs,
       1.0 - cand.candidate_pairs
           / CAST(n.n_docs * (n.n_docs - 1) // 2 AS DOUBLE) AS reduction_ratio,
       CASE WHEN tp.true_pairs = 0 THEN 1.0
            ELSE surv.surviving_true_pairs / CAST(tp.true_pairs AS DOUBLE)
       END AS pair_completeness
FROM n, cand, tp, surv
"""


# ------------------------------------------------------------- q232


def q232_inferred_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X195: late-arriving dimension (early-arriving fact) — the
    Kimball pattern X107/X108 don't cover: facts reference dimension
    members the dimension feed hasn't delivered yet. Simulated
    deterministically: dimension load v1 is missing every 10th
    customer; the fact load joins v1, and each miss creates an
    INFERRED MEMBER (a placeholder dim row keyed by the natural key,
    flagged inferred=true) so the fact never loses referential
    integrity. When v2 (complete) arrives, the resolution pass
    retires the placeholders. Emits the per-nation audit: facts
    loaded, facts that hit an inferred member, inferred members
    created, and members resolved by v2 — the reconciliation numbers
    a dimension-manager job reports.

    Scale: the inferred-member relation is |missing keys|-sized, not
    fact-sized; both passes are key equi-joins (broadcastable dim);
    the fact table never rewrites — only the dim rows flip
    inferred→real, which is exactly why the pattern exists."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    dim_v1 = c.filter(F.col("c_custkey") % 10 != 0)
    facts = o.join(
        F.broadcast(dim_v1),
        F.col("o_custkey") == F.col("c_custkey"),
        "left",
    ).select(
        "o_orderkey",
        "o_custkey",
        F.col("c_custkey").isNull().alias("hit_inferred"),
    )
    inferred = (
        facts.filter("hit_inferred")
        .select(F.col("o_custkey").alias("ik"))
        .distinct()
    )
    resolved = inferred.join(
        F.broadcast(c), F.col("ik") == F.col("c_custkey"), "inner"
    ).select("ik", "c_nationkey")
    # Per-nation audit: nation arrives with v2's resolution (inferred
    # members had no attributes before, by definition).
    fact_nation = facts.join(
        F.broadcast(c), F.col("o_custkey") == F.col("c_custkey")
    )
    audit = fact_nation.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_facts"),
        F.sum(F.when(F.col("hit_inferred"), 1).otherwise(0))
        .cast("bigint")
        .alias("facts_on_inferred"),
    )
    res_n = resolved.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("members_resolved")
    )
    return (
        audit.join(res_n, "c_nationkey", "left")
        .select(
            F.col("c_nationkey").cast("bigint").alias("c_nationkey"),
            "n_facts",
            "facts_on_inferred",
            F.coalesce("members_resolved", F.lit(0))
            .cast("bigint")
            .alias("members_resolved"),
        )
    )


Q232_SQL = """
WITH dim_v1 AS (SELECT * FROM customer WHERE c_custkey % 10 <> 0),
facts AS (
  SELECT o.o_orderkey, o.o_custkey,
         d.c_custkey IS NULL AS hit_inferred
  FROM orders o LEFT JOIN dim_v1 d ON d.c_custkey = o.o_custkey
),
inferred AS (
  SELECT DISTINCT o_custkey AS ik FROM facts WHERE hit_inferred
),
resolved AS (
  SELECT i.ik, c.c_nationkey FROM inferred i
  JOIN customer c ON c.c_custkey = i.ik
),
audit AS (
  SELECT c.c_nationkey,
         CAST(count(*) AS BIGINT) AS n_facts,
         CAST(sum(CASE WHEN f.hit_inferred THEN 1 ELSE 0 END) AS BIGINT)
           AS facts_on_inferred
  FROM facts f JOIN customer c ON c.c_custkey = f.o_custkey
  GROUP BY c.c_nationkey
),
res_n AS (
  SELECT c_nationkey, CAST(count(*) AS BIGINT) AS members_resolved
  FROM resolved GROUP BY c_nationkey
)
SELECT CAST(a.c_nationkey AS BIGINT) AS c_nationkey,
       a.n_facts, a.facts_on_inferred,
       CAST(coalesce(r.members_resolved, 0) AS BIGINT) AS members_resolved
FROM audit a LEFT JOIN res_n r ON r.c_nationkey = a.c_nationkey
"""


# ------------------------------------------------------------- q233

PVM_Y1, PVM_Y2 = 1996, 1997
PVM_SCALE = 1_000_000  # fixed-point scale for unit price


def q233_price_volume_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X196: price-volume-mix variance decomposition — the FP&A
    bridge explaining revenue change between two years per part
    brand: volume effect = Δqty × price₁, price effect = Δprice ×
    qty₂ (the standard sequential bridge, which sums EXACTLY to
    Δrevenue by construction: ΔR = q₂p₂ − q₁p₁ = (q₂−q₁)p₁ +
    (p₂−p₁)q₂). Unit price is revenue/qty in FIXED-POINT integer
    arithmetic (cents × {PVM_SCALE} floor-divided by qty — identical
    floor on both engines), so every effect is an exact integer and
    the bridge residual (ΔR − volume − price) is reported and exactly
    reproducible rather than floating-point noise.

    Brands present in only one year drop (no bridge without both
    endpoints) — the entry/exit effect a full bridge adds as separate
    terms; reported here via the residual-free two-term core.

    Scale: one lineitem×part broadcast join, one (brand, year) agg,
    then a self-pivot over |brands| rows."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        F.col("l_quantity").cast("bigint").alias("qty"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("rev_cents"),
        F.year("l_shipdate").alias("yr"),
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    by = (
        li.filter(F.col("yr").isin(PVM_Y1, PVM_Y2))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "yr")
        .agg(
            F.sum("qty").alias("q"),
            F.sum("rev_cents").alias("r"),
        )
        .withColumn(
            "price_fp", F.expr(f"CAST(r * {PVM_SCALE} div q AS BIGINT)")
        )
    )
    y1 = by.filter(F.col("yr") == PVM_Y1).select(
        "p_brand",
        F.col("q").alias("q1"),
        F.col("r").alias("r1"),
        F.col("price_fp").alias("pf1"),
    )
    y2 = by.filter(F.col("yr") == PVM_Y2).select(
        "p_brand",
        F.col("q").alias("q2"),
        F.col("r").alias("r2"),
        F.col("price_fp").alias("pf2"),
    )
    j = y1.join(y2, "p_brand")
    return j.select(
        "p_brand",
        (F.col("r2") - F.col("r1")).cast("bigint").alias("delta_rev_cents"),
        F.expr(f"CAST((q2 - q1) * pf1 div {PVM_SCALE} AS BIGINT)").alias(
            "volume_effect_cents"
        ),
        F.expr(f"CAST((pf2 - pf1) * q2 div {PVM_SCALE} AS BIGINT)").alias(
            "price_effect_cents"
        ),
        F.expr(
            f"CAST((r2 - r1) - CAST((q2 - q1) * pf1 div {PVM_SCALE} AS BIGINT)"
            f" - CAST((pf2 - pf1) * q2 div {PVM_SCALE} AS BIGINT) AS BIGINT)"
        ).alias("residual_cents"),
    )


Q233_SQL = f"""
WITH li AS (
  SELECT l_partkey,
         CAST(l_quantity AS BIGINT) AS qty,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS rev_cents,
         year(CAST(l_shipdate AS DATE)) AS yr
  FROM lineitem
  WHERE year(CAST(l_shipdate AS DATE)) IN ({PVM_Y1}, {PVM_Y2})
),
by_brand AS (
  SELECT p.p_brand, li.yr,
         sum(li.qty) AS q, sum(li.rev_cents) AS r,
         CAST(sum(li.rev_cents) * {PVM_SCALE} // sum(li.qty) AS BIGINT)
           AS price_fp
  FROM li JOIN part p ON p.p_partkey = li.l_partkey
  GROUP BY p.p_brand, li.yr
),
y1 AS (SELECT p_brand, q AS q1, r AS r1, price_fp AS pf1
       FROM by_brand WHERE yr = {PVM_Y1}),
y2 AS (SELECT p_brand, q AS q2, r AS r2, price_fp AS pf2
       FROM by_brand WHERE yr = {PVM_Y2})
SELECT y1.p_brand,
       CAST(y2.r2 - y1.r1 AS BIGINT) AS delta_rev_cents,
       CAST((y2.q2 - y1.q1) * y1.pf1 // {PVM_SCALE} AS BIGINT)
         AS volume_effect_cents,
       CAST((y2.pf2 - y1.pf1) * y2.q2 // {PVM_SCALE} AS BIGINT)
         AS price_effect_cents,
       CAST((y2.r2 - y1.r1)
            - CAST((y2.q2 - y1.q1) * y1.pf1 // {PVM_SCALE} AS BIGINT)
            - CAST((y2.pf2 - y1.pf1) * y2.q2 // {PVM_SCALE} AS BIGINT)
            AS BIGINT) AS residual_cents
FROM y1 JOIN y2 ON y2.p_brand = y1.p_brand
"""


QUERIES_EXT28 = {
    "q230_k_anonymity_audit": q230_k_anonymity_audit,
    "q231_blocking_quality": q231_blocking_quality,
    "q232_inferred_dimension": q232_inferred_dimension,
    "q233_price_volume_mix": q233_price_volume_mix,
}


def _oracles_ext28() -> dict[str, str]:
    return {
        "q230_k_anonymity_audit": Q230_SQL,
        "q231_blocking_quality": Q231_SQL,
        "q232_inferred_dimension": Q232_SQL,
        "q233_price_volume_mix": Q233_SQL,
    }
