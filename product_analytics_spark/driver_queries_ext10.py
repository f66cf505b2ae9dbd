"""Round-3 driver query families, batch 9 (q173+): prefix-filtered
set-similarity join (the AllPairs/PPJoin family — exact, unlike
MinHash), a grouped-aggregate pandas UDAF door (completing the
§2.10 UDF/UDAF/UDTF taxonomy), and keyword-in-context snippet
extraction.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _t

# ------------------------------------------------------------- q173

PPJOIN_T_NUM = 19  # Jaccard threshold = 19/20 = 0.95 as an exact rational
PPJOIN_T_DEN = 20


def q173_prefix_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered exact set-similarity self-join — the AllPairs/
    PPJoin technique: EXACT Jaccard ≥ 0.95 pairs with NO false
    negatives (MinHash banding is probabilistic; this is the
    literature's exact counterpart). Tokens get a global rarity order
    (document frequency asc, token asc — rarest first); each doc
    keeps its sorted distinct rank-set; only the first
    s − ⌈t·s⌉ + 1 ranks (the prefix) are indexed. Two sets above
    threshold MUST share a prefix token, so the candidate join is an
    equi-join on prefix ranks, shrunk further by the length filter
    ⌈t·sa⌉ ≤ sb. Verification intersects the integer rank arrays and
    compares 20·|∩| ≥ 19·|∪| — all integers, no floats until the
    reported score.

    Scale: the inverted prefix index is the shuffled relation —
    (rank, doc) pairs, a (1−t) fraction of the token data; rare-first
    ordering makes hot prefix tokens rare by construction (the skew
    remedy is part of the algorithm). Candidate verification carries
    int arrays only. The rank assignment here is a single-partition
    row_number over the |vocab| relation (fine for dim-sized vocabs);
    at 100 TB vocab scale it becomes repartitionByRange(df, token) +
    per-range offsets — the q64 two-phase prefix-sum shape — with no
    change downstream. This complements X2's MinHash: exact answer,
    same blocked-equi-join plan shape."""
    d = _t(spark, sf_dir, "documents")
    from product_analytics_spark.operators import text as tx

    toks = d.select(
        "doc_id", F.explode(F.array_distinct(tx.tokens(F.lower(F.col("text"))))).alias("tok")
    ).filter(F.col("tok") != "")
    df_rank = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .select(
            "tok",
            F.row_number()
            .over(Window.partitionBy().orderBy(F.asc("df"), F.asc("tok")))
            .alias("rk"),
        )
    )
    sets = (
        toks.join(F.broadcast(df_rank), "tok")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("rk")).alias("ra"))
        .select("doc_id", "ra", F.size("ra").alias("s"))
    )
    from product_analytics_spark import cache

    sets = cache.persist(sets)
    # prefix length p = s - ceil(t*s) + 1
    p = F.col("s") - F.ceil(F.col("s") * PPJOIN_T_NUM / F.lit(PPJOIN_T_DEN)) + 1
    prefix = sets.select(
        "doc_id",
        "s",
        F.explode(F.slice("ra", 1, p.cast("int"))).alias("rk"),
    )
    a = prefix.select(
        F.col("doc_id").alias("id_a"), F.col("s").alias("sa"), "rk"
    )
    b = prefix.select(
        F.col("doc_id").alias("id_b"), F.col("s").alias("sb"), "rk"
    )
    cand = (
        a.join(b, "rk")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("sb") * PPJOIN_T_DEN >= F.col("sa") * PPJOIN_T_NUM)
            & (F.col("sa") * PPJOIN_T_DEN >= F.col("sb") * PPJOIN_T_NUM)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    v = (
        cand.join(sets.select(F.col("doc_id").alias("id_a"), F.col("ra").alias("ra_a")), "id_a")
        .join(sets.select(F.col("doc_id").alias("id_b"), F.col("ra").alias("ra_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("ra_a", "ra_b")).alias("inter"),
            (F.size("ra_a") + F.size("ra_b")).alias("ssum"),
        )
        .select(
            "id_a",
            "id_b",
            "inter",
            (F.col("ssum") - F.col("inter")).alias("uni"),
        )
        .filter(F.col("inter") * PPJOIN_T_DEN >= F.col("uni") * PPJOIN_T_NUM)
    )
    return v.select(
        "id_a",
        "id_b",
        F.col("inter").cast("bigint").alias("n_common"),
        F.col("uni").cast("bigint").alias("n_union"),
        F.round(F.col("inter").cast("double") / F.col("uni").cast("double"), 6).alias(
            "jaccard"
        ),
    )


Q173_SQL = f"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
  FROM documents
),
tk AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
rk AS (
  SELECT tok, row_number() OVER (ORDER BY count(*) ASC, tok ASC) AS rk
  FROM tk GROUP BY tok
),
sets AS (
  SELECT doc_id, list_sort(list(rk.rk)) AS ra, count(*) AS s
  FROM tk JOIN rk USING (tok) GROUP BY doc_id
),
prefix AS (
  SELECT doc_id, s,
         unnest(ra[1:CAST(s - ceil(s * {PPJOIN_T_NUM} / {PPJOIN_T_DEN}) + 1 AS BIGINT)]) AS rk
  FROM sets
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM prefix a JOIN prefix b ON b.rk = a.rk
  WHERE a.doc_id < b.doc_id
    AND b.s * {PPJOIN_T_DEN} >= a.s * {PPJOIN_T_NUM}
    AND a.s * {PPJOIN_T_DEN} >= b.s * {PPJOIN_T_NUM}
),
v AS (
  SELECT c.id_a, c.id_b,
         len(list_filter(sa.ra, x -> list_contains(sb.ra, x))) AS inter,
         sa.s + sb.s AS ssum
  FROM cand c
  JOIN sets sa ON sa.doc_id = c.id_a
  JOIN sets sb ON sb.doc_id = c.id_b
)
SELECT id_a, id_b,
       CAST(inter AS BIGINT) AS n_common,
       CAST(ssum - inter AS BIGINT) AS n_union,
       round(CAST(inter AS DOUBLE) / CAST(ssum - inter AS DOUBLE), 6) AS jaccard
FROM v
WHERE inter * {PPJOIN_T_DEN} >= (ssum - inter) * {PPJOIN_T_NUM}
"""


# ------------------------------------------------------------- q174

def q174_udaf_door(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 UDAF door — the custom-aggregate escape hatch, Arrow-
    batched (`pandas_udf` GROUPED_AGG): an exact integer-cents median
    per group computed in numpy, joined to builtin counts on the
    |groups|-row relations. Deliberately the slow path (the builtin
    `F.percentile` twin is equivalence-tested in pytest); the door
    exists for aggregates Catalyst lacks. The plan shows ONE
    hash-partitioned exchange feeding an Arrow aggregate — group
    payloads cross the Python boundary once; at 100 TB a hot-key
    group would need the X28 salting decomposition first."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def np_median_cents(c: pd.Series) -> float:
        import numpy as np

        return float(np.median(c.to_numpy(dtype="int64")))

    o = _t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").alias("c"),
    )
    # Spark forbids mixing a GROUPED_AGG pandas UDF with non-pandas
    # aggregates in one agg; the builtin count joins back on the
    # |groups|-row relations.
    med = o.groupBy("o_orderpriority").agg(np_median_cents("c").alias("med_cents"))
    cnt = o.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))
    return cnt.join(med, "o_orderpriority").select(
        "o_orderpriority",
        "n_orders",
        (F.col("med_cents") / F.lit(100.0)).alias("median_price"),
    )


Q174_SQL = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       quantile_cont(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT), 0.5)
         / 100.0 AS median_price
FROM orders GROUP BY 1
"""


# ------------------------------------------------------------- q175

KWIC_TERM = "spark"
KWIC_WINDOW = 3


def q175_kwic_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-in-context (KWIC) snippet extraction — the corpus-
    tooling / search-preview op: every occurrence of a query term with
    ±KWIC_WINDOW tokens of context. Occurrence positions come from a
    `filter` over an index sequence (no UDF, no regex backtracking);
    context is a bounded `slice` + `concat_ws`. Entirely narrow
    (map-side) — cost per row bounded by occurrences × window, so
    document-length skew cannot concentrate work; the term filter
    pushes a `contains` predicate to the scan."""
    from product_analytics_spark.operators import text as tx

    d = _t(spark, sf_dir, "documents").filter(
        F.col("text").contains(KWIC_TERM)
    )
    t = d.select("doc_id", tx.tokens(F.lower(F.col("text"))).alias("t")).select(
        "doc_id", "t", F.size("t").alias("n")
    )
    hits = t.select(
        "doc_id",
        "t",
        "n",
        F.explode(
            F.filter(
                F.sequence(F.lit(1), F.col("n")),
                lambda i: F.element_at(F.col("t"), i) == KWIC_TERM,
            )
        ).alias("pos"),
    )
    start = F.greatest(F.lit(1), F.col("pos") - KWIC_WINDOW)
    end = F.least(F.col("n"), F.col("pos") + KWIC_WINDOW)
    return hits.select(
        "doc_id",
        F.col("pos").cast("bigint").alias("pos"),
        F.concat_ws(
            " ", F.slice("t", start.cast("int"), (end - start + 1).cast("int"))
        ).alias("snippet"),
    )


Q175_SQL = f"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
  FROM documents WHERE contains(text, '{KWIC_TERM}')
),
h AS (
  SELECT doc_id, t, len(t) AS n,
         unnest(list_filter(generate_series(1, len(t)), i -> t[i] = '{KWIC_TERM}'))
           AS pos
  FROM d
)
SELECT doc_id,
       CAST(pos AS BIGINT) AS pos,
       array_to_string(t[greatest(1, pos - {KWIC_WINDOW}):least(n, pos + {KWIC_WINDOW})], ' ')
         AS snippet
FROM h
"""


QUERIES_EXT10 = {
    "q173_prefix_similarity_join": q173_prefix_similarity_join,
    "q174_udaf_door": q174_udaf_door,
    "q175_kwic_snippets": q175_kwic_snippets,
}

ORACLES_EXT10 = {
    "q173_prefix_similarity_join": Q173_SQL,
    "q174_udaf_door": Q174_SQL,
    "q175_kwic_snippets": Q175_SQL,
}
