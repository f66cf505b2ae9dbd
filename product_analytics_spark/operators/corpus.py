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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from product_analytics_spark.operators.text import (
    portable_hash60,
    shingle_fold31,
    token_count,
    tokens,
    with_token_hashes31,
)


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

    Plan shape: both sides explode to (doc, shingle-hash), benchmark
    side is ``distinct()`` then a LEFT SEMI join on the 8-byte hash,
    then distinct train ids. The semi join shuffles hashes, never
    text; the benchmark side of the join is small (eval sets are MBs,
    not TBs) so AQE broadcasts it — at 100 TB the screen is a
    broadcast-semi-join at scan speed. Shingle hashes are the
    token-fold form (text.shingle_hashes31 — one md5 per token, no
    shingle-string building). Hash collisions (~5e-10 per
    shingle pair in the 2^31 field) can only over-flag a document,
    never miss a true overlap.
    """
    def shingle_hashes(df: DataFrame, keep_id: bool) -> DataFrame:
        # Explode consumers must embed the fold expression directly
        # (see text.shingle_fold31): aliasing it first lets the
        # optimizer inline the whole md5 pass into the Generate.
        sel = [F.col(id_col)] if keep_id else []
        staged = with_token_hashes31(df, text_col)
        return staged.select(
            *sel,
            F.explode(
                shingle_fold31(F.col("_th31"), F.col(text_col), ngram)
            ).alias("_h"),
        )

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


# ------------------------------------------------------- sequence packing

def packed_offsets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = 2048,
    n_buckets: int = 32,
    salt: str = "pack",
) -> DataFrame:
    """Greedy-concatenation sequence packing: lay every document's
    tokens end-to-end in a deterministic global order and cut the
    stream into fixed ``seq_len`` training sequences. Returns per doc:
    ``start_tok`` (global token offset), ``n_tokens``, ``first_seq``,
    ``last_seq``, ``n_seqs`` (how many sequences the doc spans).

    The global order is (shuffle_bucket, h, id) where h is the
    portable content hash — i.e. documents arrive pre-shuffled for
    training, and the order is a pure function of content (stable
    across runs, partitionings, and engines).

    Scale design — the global running sum is a textbook two-phase
    distributed prefix sum, NOT a single-partition window:

    1. per-bucket cumulative sums: one window per shuffle_bucket
       (ONE shuffle, 100 TB/n_buckets per partition — n_buckets
       scales with the cluster);
    2. per-bucket totals: tiny agg (n_buckets rows) → running bucket
       offsets computed in a broadcast-sized window;
    3. global offset = bucket offset + in-bucket cumsum, added
       map-side via a broadcast join.

    The only full-data shuffle is the bucket window; everything else
    moves n_buckets rows.
    """
    h = portable_hash60(
        F.concat_ws("\x1f", F.col(id_col).cast("string"), F.lit(salt))
    )
    base = df.select(
        F.col(id_col),
        (h % F.lit(n_buckets)).alias("_bkt"),
        h.alias("_h"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )

    w = (
        Window.partitionBy("_bkt")
        .orderBy(F.asc("_h"), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = base.withColumn("_cum", F.sum("n_tokens").over(w))

    totals = (
        base.groupBy("_bkt")
        .agg(F.sum("n_tokens").alias("_tot"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_tot").over(
                    Window.orderBy("_bkt").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_bkt", "_off")
    )

    out = local.join(F.broadcast(totals), "_bkt").select(
        F.col(id_col),
        (F.col("_off") + F.col("_cum") - F.col("n_tokens")).alias("start_tok"),
        "n_tokens",
    )
    first_seq = F.floor(F.col("start_tok") / F.lit(seq_len))
    last_tok = F.col("start_tok") + F.greatest(F.col("n_tokens") - 1, F.lit(0))
    last_seq = F.floor(last_tok / F.lit(seq_len))
    return out.select(
        id_col,
        F.col("start_tok").cast("bigint").alias("start_tok"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        first_seq.cast("bigint").alias("first_seq"),
        last_seq.cast("bigint").alias("last_seq"),
        (last_seq - first_seq + 1).cast("bigint").alias("n_seqs"),
    )


# ---------------------------------------------------- repetition signals

def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style within-document repetition metrics, computed with
    rational arithmetic only (no log/entropy — libm transcendentals
    differ across engines in the last ulp; every metric here is one
    exactly-rounded integer division, bit-reproducible anywhere):

    - ``n_tokens``, ``n_distinct``
    - ``dup_token_frac``  = (n - n_distinct) / n — mass of repeats
    - ``top_token_frac``  = count(most frequent token) / n — the
      "fraction of chars/tokens in the most common n-gram" filter
    - ``simpson``         = Σ c_i² / n² — concentration (1/simpson is
      the effective vocabulary size; high = degenerate repetition)

    Plan shape: explode stays map-side; ONE (doc, token) hash-agg,
    then a per-doc hash-agg of |doc's distinct tokens| partial rows.
    No windows, no second pass over text. At 100 TB both shuffles move
    token *counts*, not text.
    """
    tok = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("token")
    )
    per_token = tok.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("c"))
    n = F.sum("c")
    agg = per_token.groupBy(id_col).agg(
        n.cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.max("c").cast("bigint").alias("_top"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("_sq"),
    )
    nd = F.col("n_tokens").cast("double")
    return agg.select(
        id_col,
        "n_tokens",
        "n_distinct",
        ((nd - F.col("n_distinct").cast("double")) / nd).alias("dup_token_frac"),
        (F.col("_top").cast("double") / nd).alias("top_token_frac"),
        (F.col("_sq").cast("double") / (nd * nd)).alias("simpson"),
    )


# ------------------------------------------------------------ vocab apply

def apply_vocab(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str = "token",
    unk_id: int = 0,
) -> DataFrame:
    """Map each document's tokens to integer ids via a vocabulary
    relation — the tokenize step of a training pipeline. Ids are
    assigned from the vocabulary's (frequency desc, token asc) order
    starting at 1; out-of-vocabulary tokens get ``unk_id``.

    Output: (id, token_ids ARRAY<BIGINT> in document order, n_tokens,
    n_oov).

    Plan shape: posexplode (map-side) → LEFT broadcast-hash join on
    the token string (vocabularies are ≤ a few hundred thousand rows —
    always broadcastable) → per-doc hash-agg reassembling the array
    with ``array_sort(collect_list(struct(pos, id)))``. ONE shuffle,
    keyed by doc id, carrying one (pos, id) pair per token — 12
    bytes/token instead of the text. OOV never drops a row (left
    join + coalesce).
    """
    ids = vocab.select(
        F.col(token_col).alias("_tok"),
        F.row_number()
        .over(
            Window.orderBy(F.desc("n_occurrences"), F.asc(token_col))
        )
        .cast("long")
        .alias("_id"),
    )
    tok = df.select(
        F.col(id_col),
        F.posexplode(tokens(F.lower(F.col(text_col)))).alias("pos", "_tok"),
    )
    joined = tok.join(F.broadcast(ids), "_tok", "left").select(
        F.col(id_col),
        "pos",
        F.coalesce(F.col("_id"), F.lit(unk_id)).alias("_id"),
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "_id"))).alias("_pairs"),
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum((F.col("_id") == unk_id).cast("long"))
            .cast("bigint")
            .alias("n_oov"),
        )
        .select(
            id_col,
            F.transform(F.col("_pairs"), lambda p: p.getField("_id")).alias(
                "token_ids"
            ),
            "n_tokens",
            "n_oov",
        )
    )


def bigram_counts(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
    k: int = 30,
) -> DataFrame:
    """Corpus bigram (token-pair) counts — the n-gram language-model
    statistic: top-k adjacent token pairs by frequency.

    Plan: tokens staged once per row, bigrams formed by zipping the
    array with its own 1-shifted slice (map-side, no string building
    beyond what the scan already decoded), explode, ONE hash-agg on
    the (a, b) pair — map-side partial aggregation compresses the
    shuffle to distinct pairs — then TakeOrderedAndProject for the
    top-k (no global sort). Tie-break (n DESC, token_a, token_b) is a
    total order. The fold expression is embedded directly in the
    explode (see text.shingle_fold31's Generate-inlining note).
    """
    staged = df.withColumn("_bg_toks", tokens(F.col(text_col)))
    tk = F.col("_bg_toks")
    n1 = F.greatest(F.size(tk) - F.lit(1), F.lit(0))
    pairs_arr = F.zip_with(
        F.slice(tk, 1, n1),
        F.slice(tk, 2, n1),
        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
    )
    pairs = staged.select(F.explode(pairs_arr).alias("_bg"))
    counts = pairs.groupBy(
        F.col("_bg.a").alias("token_a"), F.col("_bg.b").alias("token_b")
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        counts.filter(F.col("n") >= min_count)
        .orderBy(F.desc("n"), "token_a", "token_b")
        .limit(k)
    )


def bpe_merge_candidates(
    docs: DataFrame,
    text_col: str = "text",
    top_k: int = 20,
) -> DataFrame:
    """X76: the inner loop of BPE tokenizer training — count adjacent
    character pairs WITHIN words, weighted by corpus word frequency,
    and rank merge candidates. (Real BPE iterates: merge the top pair,
    recount; this operator is that recount step, the part that touches
    all data.)

    Plan shape is the big win: pairs are generated from the DISTINCT
    word relation (|vocab| rows), not from the corpus — the corpus-
    sized work is one token hash-agg (map-side combinable), after
    which per-word char-pair expansion runs on vocab-sized data.
    ``transform(sequence(...))`` keeps expansion inside codegen; the
    final top-k is TakeOrderedAndProject (no global sort).
    """
    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    pairs = words.where(F.length("w") >= 2).select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substr(w, i, 2))")
        ).alias("pair"),
        "wc",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wc").alias("merge_count"))
        .orderBy(F.desc("merge_count"), F.asc("pair"))
        .limit(top_k)
    )


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    postings_cap: int = 8,
    top_k_tokens: int = 30,
) -> DataFrame:
    """X77: inverted-index build (token → document-frequency + capped,
    sorted posting list) — the retrieval-side structure a corpus store
    serves next to the documents themselves.

    Postings are ``sort_array(collect_set(...))`` then sliced: arrival
    order is NEVER trusted (collect order is partition-scheduling
    dependent), so the output is deterministic on any cluster. The
    (token, doc) distinct and the token agg share one token-keyed
    shuffle. At 100 TB, cap enforcement belongs in the agg (slice
    after sort keeps state bounded only per group — for uncapped
    posting lists use a (token, doc) TABLE, which is this operator's
    input relation, not an array column)."""
    td = docs.select(
        F.explode(tokens(F.col(text_col))).alias("token"),
        F.col(id_col).alias("d"),
    ).distinct()
    return (
        td.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df_count"),
            F.slice(F.sort_array(F.collect_set("d")), 1, postings_cap).alias("postings"),
        )
        .orderBy(F.desc("df_count"), F.asc("token"))
        .limit(top_k_tokens)
    )
