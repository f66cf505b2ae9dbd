"""Round-7 driver query families, batch 82 (q399-q401): function-
surface doors — string manipulation extras, the math/trig identity
certificate, and the sketch-surface gaps (hll_union, bitmap and/or
aggregates, histogram_numeric, approx_percentile, count_min_sketch).

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _money_cents, _t

# ------------------------------------------------------------- q399


def q399_string_extras_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surface door (certificate): string-manipulation extras —
    initcap, lcase, ucase, btrim, locate, overlay, elt, find_in_set,
    char, char_length, character_length, quote, soundex, sentences,
    to_number, hex/unhex/to_binary (17 builtins) — per part name
    (lowercase multi-word strings, ASCII-only in the synthetic data,
    so every transformation is locale-free).

    DuckDB twins: initcap is rebuilt word-wise (upper head + lower
    tail per split token), elt/find_in_set via list indexing/position,
    locate = strpos, overlay = substr stitching, char = chr,
    btrim = trim(s, chars). soundex and sentences have no DuckDB
    twin — they are certified in-row (soundex shape ^[A-Z][0-9]{3}$ on
    ASCII words; sentences token count == regex word count) and cross
    the boundary as booleans. to_number is certified as the exact
    inverse of format_number on real cents (all-Spark roundtrip, exact
    cents compared).

    Scale: pure per-row codegen; the one shuffle is the orderBy for
    deterministic compare."""
    p = (
        _t(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.col("p_name").alias("name"),
            _money_cents("p_retailprice").alias("cents"),
        )
        .filter(F.col("p_partkey") % 3 == 0)
    )
    k = F.col("p_partkey")
    first_word = F.split("name", " ").getItem(0)
    two_sentences = F.concat(
        F.initcap(first_word), F.lit(" is stocked. Order "), first_word, F.lit(" now!")
    )
    out = p.select(
        k.alias("pk"),
        "name",
        F.initcap("name").alias("name_title"),
        F.lcase(F.ucase("name")).alias("rt_case"),
        F.btrim(F.concat(F.lit("##"), F.col("name"), F.lit("##")), F.lit("#")).alias(
            "btrim_rt"
        ),
        F.locate("e", F.col("name")).cast("bigint").alias("loc_e"),
        F.overlay("name", F.lit("XYZ"), F.lit(3)).alias("overlay_3"),
        F.elt((k % 3 + 1).cast("int"), F.lit("alpha"), F.lit("beta"), F.lit("gamma")).alias(
            "elt_pick"
        ),
        F.find_in_set(first_word, F.lit("green,blue,red,metal,forest")).cast(
            "bigint"
        ).alias("fis"),
        F.char(k % 26 + 65).alias("char_az"),
        F.char_length("name").cast("bigint").alias("clen"),
        F.character_length("name").cast("bigint").alias("clen2"),
        F.expr("quote(name)").alias("quoted"),
        (
            F.soundex(first_word).rlike("^[A-Z][0-9]{3}$")
            | (F.soundex(first_word) == first_word)  # non-alpha heads pass through
        ).alias("soundex_shape_ok"),
        (
            (F.size(F.sentences(two_sentences)) == 2)
            & (
                F.size(F.flatten(F.sentences(two_sentences)))
                == F.size(F.split(F.regexp_replace(two_sentences, "[.!]", ""), " "))
            )
        ).alias("sentences_ok"),
        (
            F.to_number(
                F.format_number((F.col("cents") / 100).cast("decimal(18,2)"), 2),
                F.lit("999,999,999.99"),
            )
            == (F.col("cents") / 100).cast("decimal(18,2)")
        ).alias("to_number_rt_ok"),
        F.hex(F.to_binary(F.hex(k), F.lit("hex"))).alias("hex_rt"),
        F.hex(F.unhex(F.hex(k))).alias("unhex_rt"),
    )
    return out.orderBy("pk")


Q399_SQL = """
WITH p AS (
  SELECT p_partkey AS pk, p_name AS name
  FROM part WHERE p_partkey % 3 = 0
),
d AS (
  SELECT pk, name, string_split(name, ' ') AS words FROM p
)
SELECT pk, name,
       list_aggregate(list_transform(words,
         w -> upper(w[1]) || lower(w[2:])), 'string_agg', ' ') AS name_title,
       lower(upper(name)) AS rt_case,
       trim('##' || name || '##', '#') AS btrim_rt,
       CAST(strpos(name, 'e') AS BIGINT) AS loc_e,
       substr(name, 1, 2) || 'XYZ' || substr(name, 6) AS overlay_3,
       (['alpha','beta','gamma'])[CAST(pk % 3 + 1 AS INT)] AS elt_pick,
       CAST(coalesce(list_position(
         string_split('green,blue,red,metal,forest', ','), words[1]), 0)
         AS BIGINT) AS fis,
       chr(CAST(pk % 26 + 65 AS INT)) AS char_az,
       CAST(length(name) AS BIGINT) AS clen,
       CAST(length(name) AS BIGINT) AS clen2,
       chr(39) || name || chr(39) AS quoted,
       TRUE AS soundex_shape_ok,
       TRUE AS sentences_ok,
       TRUE AS to_number_rt_ok,
       CASE WHEN length(hex(pk)) % 2 = 1 THEN '0' || hex(pk)
            ELSE hex(pk) END AS hex_rt,
       CASE WHEN length(hex(pk)) % 2 = 1 THEN '0' || hex(pk)
            ELSE hex(pk) END AS unhex_rt
FROM d ORDER BY pk
"""


# ------------------------------------------------------------- q400

_TOL = 1e-9


def _rel_ok(a: F.Column, b: F.Column) -> F.Column:
    return F.abs(a - b) <= _TOL * F.greatest(F.abs(a), F.abs(b), F.lit(1.0))


def q400_math_identity_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surface door (certificate): the math/trig family — sin, cos,
    tan, cot, sec, csc, asin, acos, atan, atan2, sinh, cosh, tanh,
    asinh, acosh, atanh, radians, degrees, pi, hypot, cbrt, exp,
    expm1, log1p, power, rint, signum, positive, negate, factorial
    (30 builtins) — certified by MATHEMATICAL IDENTITY, not by
    cross-engine float equality: Java's and C's libm differ by ulps,
    so transcendental outputs never cross the engine boundary. Each
    group's compared values are exact integers (n, the identity-pass
    counts, signum/rint/factorial sums — all exactly representable);
    the oracle asserts every pass count equals n.

    Poles are handled by guards, not luck: cot/csc checks apply only
    where |sin| > 1e-6, sec where |cos| > 1e-6 (elsewhere the row
    passes by definition — division identities are meaningless at the
    pole). rint is pinned at exact .5 doubles against the HALF_EVEN
    closed form; factorial against the exact integer product.

    Scale: per-row codegen + one |groups|-row agg."""
    o = _t(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") % 4).alias("grp"),
        (F.col("o_orderkey") % 360).cast("double").alias("t"),
        ((F.col("o_orderkey") % 100) / 100.0 * 1.5 - 0.75).alias("v"),
        ((F.col("o_orderkey") % 50) + 1).cast("double").alias("x"),
        ((F.col("o_orderkey") % 10) + 0.5).alias("h"),
        (F.col("o_orderkey") % 13).cast("int").alias("fct_n"),
        (F.col("o_orderkey") % 7 - 3).cast("double").alias("sgn_in"),
    )
    u = F.radians("t")
    s, c = F.sin(u), F.cos(u)
    rows = o.select(
        "grp",
        # --- identity booleans (all Spark-side float math) ---
        _rel_ok(s * s + c * c, F.lit(1.0)).alias("pyth_ok"),
        F.when(F.abs(c) > 1e-6, _rel_ok(F.tan(u), s / c)).otherwise(True).alias(
            "tan_ok"
        ),
        F.when(F.abs(s) > 1e-6, _rel_ok(F.cot(u), c / s)).otherwise(True).alias(
            "cot_ok"
        ),
        F.when(F.abs(c) > 1e-6, _rel_ok(F.sec(u), F.lit(1.0) / c)).otherwise(
            True
        ).alias("sec_ok"),
        F.when(F.abs(s) > 1e-6, _rel_ok(F.csc(u), F.lit(1.0) / s)).otherwise(
            True
        ).alias("csc_ok"),
        _rel_ok(F.asin(F.sin("v")), F.col("v")).alias("asin_ok"),
        _rel_ok(F.acos(F.cos(F.col("v") + 1.0)), F.col("v") + 1.0).alias("acos_ok"),
        _rel_ok(F.atan(F.tan("v")), F.col("v")).alias("atan_ok"),
        _rel_ok(
            F.atan2(F.sin("v"), F.cos("v")), F.col("v")
        ).alias("atan2_ok"),
        _rel_ok(
            F.cosh("v") * F.cosh("v") - F.sinh("v") * F.sinh("v"), F.lit(1.0)
        ).alias("hyp_ok"),
        _rel_ok(F.tanh("v"), F.sinh("v") / F.cosh("v")).alias("tanh_ok"),
        _rel_ok(F.asinh(F.sinh("v")), F.col("v")).alias("asinh_ok"),
        _rel_ok(F.acosh(F.cosh(F.col("v") + 2.0)), F.col("v") + 2.0).alias(
            "acosh_ok"
        ),
        _rel_ok(F.atanh(F.tanh("v")), F.col("v")).alias("atanh_ok"),
        _rel_ok(F.degrees(F.radians("t")), F.col("t")).alias("deg_rad_ok"),
        (F.pi() == F.lit(3.141592653589793)).alias("pi_ok"),
        _rel_ok(F.hypot(F.col("x") * 3.0, F.col("x") * 4.0), F.col("x") * 5.0).alias(
            "hypot_ok"
        ),
        _rel_ok(F.cbrt(F.col("x") * F.col("x") * F.col("x")), F.col("x")).alias(
            "cbrt_ok"
        ),
        _rel_ok(
            F.power("x", F.lit(3.0)), F.col("x") * F.col("x") * F.col("x")
        ).alias("power_ok"),
        _rel_ok(F.expm1("v"), F.exp("v") - 1.0).alias("expm1_ok"),
        _rel_ok(F.log1p("v"), F.log(F.col("v") + 1.0)).alias("log1p_ok"),
        (
            F.rint("h")
            == F.when((F.col("h") - 0.5).cast("bigint") % 2 == 0, F.col("h") - 0.5)
            .otherwise(F.col("h") + 0.5)
        ).alias("rint_ok"),
        # --- exact integer lanes (compared directly) ---
        F.signum("sgn_in").cast("bigint").alias("sgn"),
        F.positive(F.col("fct_n")).alias("pos_n"),
        F.negate(F.col("fct_n")).alias("neg_n"),
        F.factorial("fct_n").alias("fact"),
        F.rint("h").cast("bigint").alias("rint_i"),
    )
    ok_cols = [
        "pyth_ok", "tan_ok", "cot_ok", "sec_ok", "csc_ok", "asin_ok",
        "acos_ok", "atan_ok", "atan2_ok", "hyp_ok", "tanh_ok", "asinh_ok",
        "acosh_ok", "atanh_ok", "deg_rad_ok", "pi_ok", "hypot_ok",
        "cbrt_ok", "power_ok", "expm1_ok", "log1p_ok", "rint_ok",
    ]
    g = rows.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        *[F.count_if(F.col(c)).alias("n_" + c) for c in ok_cols],
        F.sum("sgn").alias("sum_signum"),
        F.sum("pos_n").alias("sum_pos"),
        F.sum("neg_n").alias("sum_neg"),
        F.sum("fact").alias("sum_fact"),
        F.sum("rint_i").alias("sum_rint"),
    )
    return g.select(
        F.col("grp").cast("bigint").alias("grp"),
        "n",
        *[F.col("n_" + c).alias("n_" + c) for c in ok_cols],
        "sum_signum",
        "sum_pos",
        "sum_neg",
        "sum_fact",
        "sum_rint",
    ).orderBy("grp")


_Q400_OK = [
    "pyth_ok", "tan_ok", "cot_ok", "sec_ok", "csc_ok", "asin_ok",
    "acos_ok", "atan_ok", "atan2_ok", "hyp_ok", "tanh_ok", "asinh_ok",
    "acosh_ok", "atanh_ok", "deg_rad_ok", "pi_ok", "hypot_ok",
    "cbrt_ok", "power_ok", "expm1_ok", "log1p_ok", "rint_ok",
]

Q400_SQL = f"""
WITH b AS (
  SELECT o_orderkey % 4 AS grp,
         CAST(o_orderkey % 7 - 3 AS DOUBLE) AS sgn_in,
         CAST(o_orderkey % 13 AS INT) AS fct_n,
         (o_orderkey % 10) + 0.5 AS h
  FROM orders
)
SELECT CAST(grp AS BIGINT) AS grp,
       CAST(count(*) AS BIGINT) AS n,
       {", ".join(f"CAST(count(*) AS BIGINT) AS n_{c}" for c in _Q400_OK)},
       CAST(sum(CASE WHEN sgn_in > 0 THEN 1 WHEN sgn_in < 0 THEN -1
                     ELSE 0 END) AS BIGINT) AS sum_signum,
       CAST(sum(fct_n) AS BIGINT) AS sum_pos,
       CAST(sum(-fct_n) AS BIGINT) AS sum_neg,
       CAST(sum(CASE fct_n WHEN 0 THEN 1 ELSE fct_n! END) AS BIGINT)
         AS sum_fact,
       CAST(sum(CASE WHEN CAST(h - 0.5 AS BIGINT) % 2 = 0
                     THEN h - 0.5 ELSE h + 0.5 END) AS BIGINT) AS sum_rint
FROM b GROUP BY grp ORDER BY grp
"""


# ------------------------------------------------------------- q401

HLL_UNION_RSD = 0.05
CMS_EPS = 0.001
CMS_CONF = 0.99
CMS_SEED = 42


def q401_sketch_gap_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surface door (certificate): the remaining sketch-surface gaps —
    hll_union (pairwise sketch merge; hll_union_agg/hll_sketch_agg are
    already certified in X21), approx_percentile (the percentile_approx
    alias), histogram_numeric, count_min_sketch, bitmap_and_agg,
    bitmap_or_agg (6 builtins).

    Certification strategy per sketch (sketches are engine-specific by
    design — SURVEY.md:292 — so the oracle pins exact statistics and
    guarantee booleans, never sketch bytes):
      * hll_union: the corpus is split into even/odd user halves, each
        gets its own HLL sketch, the PAIRWISE union's estimate must
        sit within 3·rsd of the exact distinct count (compared value).
      * approx_percentile: the estimate must lie between the exact
        p45 and p55 (rank-error bound at accuracy 10k is n/10k).
      * histogram_numeric: bin heights must sum to n exactly (the
        sketch redistributes rows, never loses them).
      * count_min_sketch: the serialized sketch's byte length is a
        pure function of (eps, confidence) — pinned as a literal; CMS
        estimates are only readable through the JVM sketch API, noted.
      * bitmap_or_agg over per-type user-bucket bitmaps == exact
        distinct buckets; bitmap_and_agg == buckets present in EVERY
        type (both exact set identities, closed-form oracle).

    Scale: every lane is a mergeable partial aggregate — the shuffle
    moves sketch bytes, not rows; this door is the proof harness for
    the 100 TB swap-ins SCALE.md names."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        _money_cents("value").alias("cents"),
        # 1-based: bitmap_bit_position maps v -> (v-1) mod 32768, so a
        # 0 value would alias to bit 32767 / drop — keep buckets >= 1.
        (F.col("user_id") % 512 + 1).alias("bucket"),
    )
    half = ev.withColumn("half", (F.col("user_id") % 2).cast("int"))
    sketches = half.groupBy("half").agg(
        F.hll_sketch_agg("user_id").alias("hll")
    )
    paired = sketches.groupBy().agg(
        F.first(F.when(F.col("half") == 0, F.col("hll")), ignorenulls=True).alias(
            "h0"
        ),
        F.first(F.when(F.col("half") == 1, F.col("hll")), ignorenulls=True).alias(
            "h1"
        ),
    )
    from product_analytics_spark.qcommon import combine_single_rows

    # Exact distinct counts live in their OWN aggregate: co-aggregating
    # countDistinct with TypedImperativeAggregate buffers (percentile,
    # histogram_numeric, count_min_sketch) rewrites the whole agg
    # through Expand — 2x rows through every object buffer (the q155
    # lesson; measured 4.1s -> ~1.5s for this door at sf0.1).
    distincts = ev.groupBy().agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("bucket").alias("n_buckets_exact"),
    )
    sketches_and_stats = ev.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile(F.col("cents"), F.lit(0.45)).alias("p45"),
        F.percentile(F.col("cents"), F.lit(0.55)).alias("p55"),
        F.approx_percentile(F.col("cents"), F.lit(0.5), F.lit(10000)).alias(
            "ap50"
        ),
        F.aggregate(
            F.histogram_numeric(F.col("cents"), F.lit(10)),
            F.lit(0.0),
            lambda acc, s: acc + s.getField("y"),
        ).alias("hist_mass"),
        F.octet_length(
            F.count_min_sketch(
                "event_type", F.lit(CMS_EPS), F.lit(CMS_CONF), F.lit(CMS_SEED)
            )
        ).cast("bigint").alias("cms_bytes"),
    )
    stats = combine_single_rows(distincts, sketches_and_stats)
    # per-type bucket bitmaps -> and/or across the 5 types
    per_type = ev.groupBy("event_type").agg(
        F.bitmap_construct_agg(F.bitmap_bit_position("bucket")).alias("bm")
    )
    bm = per_type.groupBy().agg(
        F.bitmap_count(F.bitmap_or_agg("bm")).alias("n_or"),
        F.bitmap_count(F.bitmap_and_agg("bm")).alias("n_and"),
        F.count(F.lit(1)).alias("n_types"),
    )
    est = F.hll_sketch_estimate(F.hll_union(F.col("h0"), F.col("h1")))
    # Join-free single-row combine (1-row cross joins = banned BNLJ);
    # max-per-column passes the sketch binaries through untouched.
    out = (
        combine_single_rows(stats, paired, bm)
        .select(
            F.col("n").cast("bigint").alias("n"),
            F.col("n_users").cast("bigint").alias("n_users"),
            (
                F.abs(est - F.col("n_users"))
                <= F.lit(3 * HLL_UNION_RSD) * F.col("n_users")
            ).alias("hll_union_ok"),
            (
                (F.col("ap50") >= F.col("p45")) & (F.col("ap50") <= F.col("p55"))
            ).alias("approx_pctl_ok"),
            (F.abs(F.col("hist_mass") - F.col("n")) < 0.5).alias(
                "histogram_mass_ok"
            ),
            F.col("cms_bytes").alias("cms_bytes"),
            F.col("n_buckets_exact").cast("bigint").alias("n_buckets"),
            (F.col("n_or") == F.col("n_buckets_exact")).alias("bitmap_or_ok"),
            F.col("n_and").cast("bigint").alias("n_and"),
            F.col("n_types").cast("bigint").alias("n_types"),
        )
    )
    return out


Q401_SQL = f"""
WITH ev AS (
  SELECT user_id, event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         user_id % 512 + 1 AS bucket
  FROM events
),
per_bucket AS (
  SELECT bucket, count(DISTINCT event_type) AS nt FROM ev GROUP BY bucket
)
SELECT CAST((SELECT count(*) FROM ev) AS BIGINT) AS n,
       CAST((SELECT count(DISTINCT user_id) FROM ev) AS BIGINT) AS n_users,
       TRUE AS hll_union_ok,
       TRUE AS approx_pctl_ok,
       TRUE AS histogram_mass_ok,
       CAST({{cms_bytes}} AS BIGINT) AS cms_bytes,
       CAST((SELECT count(*) FROM per_bucket) AS BIGINT) AS n_buckets,
       TRUE AS bitmap_or_ok,
       CAST((SELECT count(*) FROM per_bucket
             WHERE nt = (SELECT count(DISTINCT event_type) FROM ev))
            AS BIGINT) AS n_and,
       CAST((SELECT count(DISTINCT event_type) FROM ev) AS BIGINT) AS n_types
"""


def _q401_sql() -> str:
    """The CMS byte length is a deterministic function of
    (eps, confidence) under Spark's CountMinSketchImpl: depth =
    ceil(log2(1/(1-conf))), width = ceil(2/eps), serialized as
    int version + long totalCount + int depth + int width +
    depth longs of hash seeds + depth*width longs of counters —
    20 + depth*(width+1)*8 bytes (verified against the measured
    112,076 at eps=0.001, conf=0.99). Computed from the constants so
    a parameter change re-derives the pin."""
    import math

    depth = int(math.ceil(math.log2(1.0 / (1.0 - CMS_CONF))))
    width = int(math.ceil(2.0 / CMS_EPS))
    cms_bytes = 20 + depth * (width + 1) * 8
    return Q401_SQL.replace("{cms_bytes}", str(cms_bytes))


QUERIES_EXT82 = {
    "q399_string_extras_cert": q399_string_extras_cert,
    "q400_math_identity_cert": q400_math_identity_cert,
    "q401_sketch_gap_cert": q401_sketch_gap_cert,
}


def _oracles_ext82() -> dict[str, str]:
    return {
        "q399_string_extras_cert": Q399_SQL,
        "q400_math_identity_cert": Q400_SQL,
        "q401_sketch_gap_cert": _q401_sql(),
    }
