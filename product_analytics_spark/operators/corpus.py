"""Corpus-preparation operators: vocabulary, chunking, PII masking,
benchmark-contamination screening.

These are the remaining text-side stages of a large-scale
training-data pipeline (dedup/quality/language live in
``operators.text``): build a tokenizer vocabulary, cut documents into
fixed-size overlapping context windows, scrub PII, and screen the
corpus against an evaluation benchmark so test data never leaks into
training data.

Everything is built-in Catalyst expressions — explode/sequence/slice/
regexp — no Python in the hot path. Scale notes per function.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from product_analytics_spark.operators.text import portable_hash60, tokens, word_shingles


# ------------------------------------------------------------- vocabulary

def vocab_topk(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 100,
    min_count: int = 1,
) -> DataFrame:
    """Top-k vocabulary by token frequency: (token, n_occurrences,
    n_docs), deterministic tie-break on the token itself.

    Plan shape: explode → hash-agg with map-side partial counts
    (the shuffle moves |distinct tokens| partial rows, not |tokens|)
    → TakeOrderedAndProject for the top-k (no global sort). At 100 TB
    the distinct-token relation is million-scale — trivially
    shuffleable; the heavy explode never leaves the map side.
    """
    tok = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("token")
    )
    counts = (
        tok.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct(id_col).alias("n_docs"),
        )
        .filter(F.col("n_occurrences") >= min_count)
    )
    return counts.orderBy(
        F.col("n_occurrences").desc(), F.col("token").asc()
    ).limit(k)


# --------------------------------------------------------------- chunking

def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Cut each document into fixed-size token windows with overlap —
    the context-window prep step before model training / embedding.

    Output: one row per chunk with (id, chunk_idx, chunk_text,
    n_tokens). Chunks start every ``chunk_tokens - overlap`` tokens;
    the final partial chunk is kept (LLM pipelines keep the tail).

    Plan shape: tokens → ``sequence()`` of chunk starts → explode →
    ``slice`` + ``concat_ws``. Entirely narrow (zero shuffles): each
    task expands its own documents; output size ≈ input ·
    (1 + overlap/chunk). No window function, no per-doc state —
    survives any document-length skew because slice() bounds every
    chunk to ``chunk_tokens`` tokens.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap
    t = tokens(F.col(text_col))
    n = F.size(t)
    # Always one chunk; one more per `step` tokens beyond the first
    # chunk's coverage. A start is never emitted if the previous chunk
    # already reached the end of the document.
    num_chunks = F.lit(1) + F.greatest(
        F.ceil((n - F.lit(chunk_tokens)) / F.lit(float(step))).cast("int"), F.lit(0)
    )
    starts = F.transform(
        F.sequence(F.lit(1), num_chunks), lambda i: (i - F.lit(1)) * F.lit(step) + F.lit(1)
    )
    return (
        df.select(F.col(id_col), t.alias("_toks"), starts.alias("_starts"))
        .select(
            F.col(id_col),
            F.posexplode("_starts").alias("chunk_idx", "_start"),
            F.col("_toks"),
        )
        .select(
            F.col(id_col),
            "chunk_idx",
            F.concat_ws(
                " ", F.slice(F.col("_toks"), F.col("_start"), F.lit(chunk_tokens))
            ).alias("chunk_text"),
            F.least(
                F.lit(chunk_tokens), F.size("_toks") - F.col("_start") + F.lit(1)
            ).alias("n_tokens"),
        )
    )


# -------------------------------------------------------------- PII mask

#: Regex patterns shared verbatim with the DuckDB oracle (both engines
#: use RE2-compatible syntax for these constructs).
PHONE_RE = r"\b\d{2,3}-\d{3,4}-\d{3,4}-\d{4}\b"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def mask_pii(
    df: DataFrame,
    cols: dict[str, str],
    patterns: dict[str, str] | None = None,
    token: str = "[PII]",
) -> DataFrame:
    """Replace PII matches in the given columns with a mask token.

    ``cols`` maps input column → masked output column; ``patterns``
    maps a name → regex (defaults: phone + email). Pure
    ``regexp_replace`` chain — narrow, codegen'd, no shuffle; at
    100 TB this runs at scan speed. Also emits ``<out>_n_masked``
    (match count before masking) so downstream can audit scrub rates.
    """
    pats = patterns or {"phone": PHONE_RE, "email": EMAIL_RE}
    out = df
    for src, dst in cols.items():
        masked: Column = F.col(src)
        n = F.lit(0)
        for pat in pats.values():
            n = n + F.size(F.regexp_extract_all(masked, F.lit(pat), F.lit(0)))
            masked = F.regexp_replace(masked, pat, token)
        out = out.withColumn(dst, masked).withColumn(f"{dst}_n_masked", n.cast("int"))
    return out


# ------------------------------------------------------- contamination

def contamination_screen(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 8,
) -> DataFrame:
    """Flag training documents sharing any ``ngram``-token shingle with
    a benchmark document (eval-set leakage screen, the standard
    n-gram-overlap decontamination check used by public LLM data
    pipelines).

    Plan shape: both sides explode to (doc, shingle-hash-60bit),
    benchmark side is ``distinct()`` then a LEFT SEMI join on the
    8-byte hash, then distinct train ids. The semi join shuffles
    hashes (8 bytes/shingle), never text; the benchmark side of the
    join is small (eval sets are MBs, not TBs) so AQE broadcasts it —
    at 100 TB the screen is a broadcast-semi-join at scan speed.
    Hash collisions (~2^-60 per pair) can only over-flag a document,
    never miss a true overlap.
    """
    def shingle_hashes(df: DataFrame, keep_id: bool) -> DataFrame:
        sel = [F.col(id_col)] if keep_id else []
        return df.select(
            *sel,
            F.explode(word_shingles(F.col(text_col), ngram)).alias("_sh"),
        ).select(*([F.col(id_col)] if keep_id else []), portable_hash60(F.col("_sh")).alias("_h"))

    bench_h = shingle_hashes(benchmark, keep_id=False).distinct()
    train_h = shingle_hashes(train, keep_id=True)
    return (
        train_h.join(bench_h, "_h", "left_semi")
        .select(id_col)
        .distinct()
    )


# ---------------------------------------------------------------- tf-idf

def tfidf_topk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF-style score.

    score = tf · idf with the log-free BM25-style idf
    (N - df + 0.5) / (df + 0.5): a rational function of integer
    counts, so the double result is one exactly-rounded division and
    one multiply — bit-reproducible in any IEEE engine. (ln-based idf
    is deliberately avoided: libm ln differs across engines in the
    last ulp, which breaks cross-engine rank ties.)

    Plan shape: one explode (map-side) -> (doc, token) hash-agg for tf
    -> token hash-agg for df -> join tf-df on token -> per-doc top-k
    window. At 100 TB the df relation is |vocab| rows (millions) —
    broadcastable after a frequency floor; the top-k window
    repartitions by doc id, the only row-scale shuffle after the tf
    aggregation. Ties break on the token string ascending.
    """
    tok = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("token")
    )
    tf = tok.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    # Scalar N fetched driver-side (the engine's watermark-collect
    # pattern): a crossJoin would plan a BroadcastNestedLoopJoin and a
    # literal-key equi-join constant-folds back into one; a one-row
    # driver scalar keeps the plan nested-loop-free. Cost is one count
    # aggregation — the same pass any scalar-subquery plan would run.
    n = df.select(F.countDistinct(id_col).alias("_n")).first()["_n"]

    from pyspark.sql import Window

    idf = (F.lit(float(n)) - F.col("df").cast("double") + F.lit(0.5)) / (
        F.col("df").cast("double") + F.lit(0.5)
    )
    scored = (
        tf.join(dfreq, "token")
        .select(
            F.col(id_col),
            "token",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            (F.col("tf").cast("double") * idf).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select(id_col, "term_rank", "token", "tf", "df", "score")
    )
