"""Vector-similarity operators over ``array<float>`` embedding columns.

[EXTENSION] operators (SURVEY.md §2.11 X3): brute-force cosine top-k
as the exact baseline, plus an LSH-bucketed variant as the 100 TB
scale path. All vector math uses built-in higher-order functions
(``zip_with`` + ``aggregate``) — JVM-side, no Python in the hot loop.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Elementwise product then sum — stays in codegen."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dot_unrolled(a: Column, b: Column, dim: int) -> Column:
    """Dot product unrolled over a known dimensionality.

    Bit-equal to :func:`dot` (left-deep adds in the same sequential
    order, seeded with the fold's 0.0 so even signed-zero agrees) but
    pure scalar codegen — no per-row intermediate array from
    ``zip_with`` and no higher-order-function lambda dispatch. Use in
    pairwise hot loops (candidate pairs scale superlinearly in rows);
    ``dot`` remains the generic form when dim isn't known at plan
    time."""
    acc = F.lit(0.0)
    for i in range(dim):
        acc = acc + a.getItem(i) * b.getItem(i)
    return acc


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _probe_lit(probe: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in probe])


def cosine_topk(
    df: DataFrame,
    probe: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sim_scale: int | None = 4,
) -> DataFrame:
    """Exact brute-force top-k by cosine similarity to a probe vector.

    Plan: one projection computing sim (codegen'd array math), then
    TakeOrderedAndProject — Spark's distributed top-k keeps k rows per
    partition and merges on the driver, so there is NO global sort and
    NO shuffle of the full table even at 100 TB. Deterministic
    tie-break on id_col.
    """
    p = _probe_lit(probe)
    sim = cosine(F.col(vec_col).cast("array<double>"), p)
    out = df.withColumn("_sim", sim).orderBy(F.desc("_sim"), F.col(id_col)).limit(k)
    sim_out = F.round(F.col("_sim"), sim_scale) if sim_scale is not None else F.col("_sim")
    return out.select(id_col, sim_out.alias("cosine_sim"))


def _lcg_rademacher_planes(n_planes: int, dim: int, seed: int = 0x5DEECE66D) -> list[list[float]]:
    """Deterministic ±1 hyperplanes from a fixed 64-bit LCG seed —
    reproducible across runs, drivers, and cluster sizes (no RNG state
    at execution time; the planes are plan-time literals)."""
    s = seed
    planes: list[list[float]] = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(1.0 if (s >> 33) & 1 else -1.0)
        planes.append(row)
    return planes


#: Default LSH hyperplanes for 64-dim embeddings (16 buckets).
DEFAULT_PLANES = _lcg_rademacher_planes(4, 64)


def embedding_near_dup_pairs(
    df: DataFrame,
    block_col: str = "label",
    k: int = 20,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sim_scale: int = 4,
) -> DataFrame:
    """Top-k most-similar embedding pairs within coarse blocks —
    embedding-cosine near-dup candidate generation.

    ``block_col`` plays the IVF-cell role: pairs are only scored
    inside a block, so the join is an equi-join on the cell id instead
    of an O(n²) cross join. At 100 TB the cell id comes from a coarse
    quantizer (k-means assignment or LSH bucket) written as a
    partition column; here the driver table's ``label`` stands in.
    Norms are computed once per side before the join (8 bytes/row)
    rather than per pair. Returns (id_a, id_b, cosine_sim) ordered by
    similarity, deterministic (id_a, id_b) tie-break.
    """
    v = df.select(
        F.col(id_col),
        F.col(block_col).alias("_blk"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).withColumn("_n", l2_norm(F.col("_v")))
    a = v.select(
        F.col(id_col).alias("id_a"), F.col("_blk"), F.col("_v").alias("_va"), F.col("_n").alias("_na")
    )
    b = v.select(
        F.col(id_col).alias("id_b"), F.col("_blk"), F.col("_v").alias("_vb"), F.col("_n").alias("_nb")
    )
    pairs = a.join(b, "_blk").filter(F.col("id_a") < F.col("id_b"))
    sim = dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    scored = pairs.withColumn("_sim", sim)
    top = scored.orderBy(F.desc("_sim"), "id_a", "id_b").limit(k)
    return top.select("id_a", "id_b", F.round(F.col("_sim"), sim_scale).alias("cosine_sim"))


def embedding_near_dup_pairs_ivf(
    df: DataFrame,
    centroids: Sequence[Sequence[float]] | None = None,
    k: int = 20,
    cap_per_cell: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sim_scale: int = 4,
    dim: int | None = None,
    backend: str = "arrow",
) -> DataFrame:
    """Top-k most-similar embedding pairs blocked by IVF cell — the
    scale-correct form of :func:`embedding_near_dup_pairs`.

    ``backend='arrow'`` (default) scores each cell in an Arrow-grouped
    numpy kernel (dim-order accumulation — bit-equal to the expression
    fold, see _cell_pair_sims) and emits only each cell's top-k
    candidate pairs; the global top-k then reduces |cells|·k rows.
    Every winning pair lives in exactly one cell, so per-cell-top-k →
    global-top-k is exact. ``backend='join'`` keeps the
    pure-expression within-cell self-join (bit-identical output,
    unit-tested).

    Blocking on a semantic column (label) is an anti-pattern at scale:
    block count is fixed by the domain, so each block grows linearly
    with the data and the within-block all-pairs join grows
    quadratically. IVF cells invert that: the codebook size is an
    operator dial (n_cells scales with the corpus), so per-cell
    population — and therefore per-cell pair work — stays bounded.
    ``cap_per_cell`` adds a hard deterministic bound: rank vectors
    within each cell by id and drop overflow (at 100 TB: cap ~4x the
    expected cell size; overflow only fires on pathological codebook
    mismatch). Both the cell arithmetic and the cap are plain
    expressions, reproduced exactly by the DuckDB oracle.

    Returns (id_a, id_b, cosine_sim) ordered by similarity with a
    deterministic (id_a, id_b) tie-break.
    """
    cents = centroids if centroids is not None else CENTROIDS_FINE
    assigned = ivf_assign(df, cents, vec_col, cell_col="_blk")
    if backend == "arrow":
        cand = _grouped_cell_pairs(
            assigned.select(F.col(id_col), "_blk", F.col(vec_col)),
            id_col,
            vec_col,
            cap_per_cell,
            "pairs",
            k,
        )
        top = cand.orderBy(F.desc("_sim"), "id_a", "id_b").limit(k)
        return top.select(
            "id_a", "id_b", F.round(F.col("_sim"), sim_scale).alias("cosine_sim")
        )
    if backend != "join":
        raise ValueError(f"unknown backend: {backend}")
    v = assigned.select(
        F.col(id_col),
        F.col("_blk"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    if cap_per_cell is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("_blk").orderBy(F.col(id_col))
        v = (
            v.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cap_per_cell)
            .drop("_rn")
        )
    v = v.withColumn("_n", l2_norm(F.col("_v")))
    a = v.select(
        F.col(id_col).alias("id_a"), F.col("_blk"), F.col("_v").alias("_va"), F.col("_n").alias("_na")
    )
    b = v.select(
        F.col(id_col).alias("id_b"), F.col("_blk"), F.col("_v").alias("_vb"), F.col("_n").alias("_nb")
    )
    pairs = a.join(b, "_blk").filter(F.col("id_a") < F.col("id_b"))
    # The pair stage is the hot loop (|pairs| >> |rows|): a known dim
    # swaps the zip_with/aggregate dot for the unrolled scalar form.
    pair_dot = (
        dot_unrolled(F.col("_va"), F.col("_vb"), dim)
        if dim is not None
        else dot(F.col("_va"), F.col("_vb"))
    )
    sim = pair_dot / (F.col("_na") * F.col("_nb"))
    scored = pairs.withColumn("_sim", sim)
    top = scored.orderBy(F.desc("_sim"), "id_a", "id_b").limit(k)
    return top.select("id_a", "id_b", F.round(F.col("_sim"), sim_scale).alias("cosine_sim"))


def random_projection_buckets(
    df: DataFrame,
    planes: Sequence[Sequence[float]],
    vec_col: str = "embedding",
    bucket_col: str = "lsh_bucket",
) -> DataFrame:
    """Sign-random-projection LSH bucket id (SimHash for vectors).

    ``planes`` are fixed hyperplane normals (deterministic — caller
    derives them from a seeded RNG). Bucket = bit-packed signs of the
    projections. Candidate retrieval then only scans matching buckets:
    at 100 TB this turns ANN from full-scan into a partition-pruned
    lookup when the table is written partitioned/bucketed by
    ``lsh_bucket``.
    """
    vec = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        sign_bit = (dot(vec, _probe_lit(plane)) > 0).cast("long")
        bucket = bucket + (sign_bit * F.lit(2**i))
    return df.withColumn(bucket_col, bucket)


def cosine_topk_lsh(
    df: DataFrame,
    probe: Sequence[float],
    planes: Sequence[Sequence[float]],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_probe_buckets: int = 1,
) -> DataFrame:
    """Approximate top-k: restrict the brute-force scan to the probe's
    LSH bucket, plus ``n_probe_buckets - 1`` multi-probe buckets.

    Multi-probe order is the standard margin heuristic: the next-best
    buckets are the ones reached by flipping the hyperplane bit whose
    projection magnitude is smallest (the probe sits closest to that
    boundary, so true neighbors most likely fell just across it).
    Buckets are plan-time literals -> the scan is an ``isin`` filter,
    partition-pruned when the table is written partitioned by bucket.
    """
    margins = []  # (|projection|, plane index)
    probe_bucket = 0
    for i, plane in enumerate(planes):
        d = sum(float(a) * float(b) for a, b in zip(probe, plane))
        if d > 0:
            probe_bucket += 2**i
        margins.append((abs(d), i))
    margins.sort()
    buckets = [probe_bucket]
    for _, i in margins[: max(0, n_probe_buckets - 1)]:
        buckets.append(probe_bucket ^ (2**i))
    bucketed = random_projection_buckets(df, planes, vec_col)
    cand = bucketed.filter(F.col("lsh_bucket").isin(buckets))
    return cosine_topk(cand, probe, k=k, vec_col=vec_col, id_col=id_col)


def _lcg_uniform_centroids(
    n_cells: int, dim: int, seed: int = 0x9E3779B9
) -> list[list[float]]:
    """Deterministic pseudo-random centroids in [-1, 1]^dim from a
    fixed 64-bit LCG — the coarse-quantizer codebook. In production
    the codebook comes from a k-means fit persisted with the table;
    a fixed codebook keeps the operator (and its oracle) reproducible
    across engines with zero runtime RNG state."""
    s = seed
    cents: list[list[float]] = []
    for _ in range(n_cells):
        row = []
        for _ in range(dim):
            s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            # 21 high bits -> uniform in [0,1) -> [-1,1)
            row.append(round(((s >> 43) / float(1 << 21)) * 2.0 - 1.0, 6))
        cents.append(row)
    return cents


#: Default IVF codebook for 64-dim embeddings (8 coarse cells).
DEFAULT_CENTROIDS = _lcg_uniform_centroids(8, 64)

#: Finer 32-cell codebook — the near-dup blocking key (smaller blocks
#: bound the within-block O(b²) pair work; at 100 TB n_cells grows
#: with the corpus so the per-block pair count stays constant).
CENTROIDS_FINE = _lcg_uniform_centroids(32, 64)


def ivf_cell(
    vec: Column, centroids: Sequence[Sequence[float]]
) -> Column:
    """Coarse-quantizer cell id: argmin over centroids of squared
    euclidean distance, computed as argmax of (2*v.c - ||c||^2) so the
    per-centroid work is one dot product (||v||^2 is constant across
    cells and drops out). Lowest cell id wins ties. All plan-time
    literals + codegen'd array math — no shuffle, no UDF.

    Single-Column form: each score subtree is textually repeated in
    ``greatest`` and again per when-branch — fine for a handful of
    centroids, quadratic plan blow-up for big codebooks. Prefer
    :func:`ivf_assign` (staged projections, each score computed once)
    anywhere the input is a DataFrame."""
    scores = []
    for c in centroids:
        c_norm_sq = sum(x * x for x in c)
        scores.append(2.0 * dot(vec, _probe_lit(c)) - F.lit(float(c_norm_sq)))
    best = F.greatest(*scores)
    cell = F.lit(len(centroids) - 1)
    for i in range(len(centroids) - 2, -1, -1):
        cell = F.when(scores[i] == best, F.lit(i)).otherwise(cell)
    return cell


def ivf_assign(
    df: DataFrame,
    centroids: Sequence[Sequence[float]] = DEFAULT_CENTROIDS,
    vec_col: str = "embedding",
    cell_col: str = "ivf_cell",
    backend: str = "arrow",
) -> DataFrame:
    """Materialize the IVF cell id column. At 100 TB the table is
    written partitioned by this column (the inverted file), so probe
    lookups become partition-pruned scans of ~1/n_cells of the data —
    same pruning mechanism as the LSH-bucket path, but with a
    data-adapted codebook instead of data-oblivious hyperplanes.

    Two backends, bit-identical outputs (unit-tested equal):

    ``arrow`` (default): Arrow-batched ``mapInPandas`` + numpy. The
    accumulation loops over dimensions IN ORDER (``acc += v_d * c_d``
    per dim, vectorized across rows/cells), so every float64 add
    happens in the same sequence as the expression fold and the
    oracle's list_dot_product — IEEE correctly-rounded either way,
    hence bit-equal scores; ``argmax`` takes the first maximum, the
    same lowest-cell-id tie-break. This is the matmul-shaped case
    where Spark's interpreted higher-order functions lose to
    Arrow+numpy by ~10x (measured 2.2s -> 0.23s for 10k x 64-dim x
    32 cells).

    ``expr``: pure built-in expressions — one array-of-structs
    codebook literal {c, n=||c||^2}, a single ``transform`` computing
    each score 2*v.c - n once, and
    ``array_position(scores, array_max(scores)) - 1`` for the argmax.
    Constant-size plan in the codebook; keeps the whole operator in
    the JVM when Python workers are undesirable."""
    if backend == "expr":
        cents_lit = F.array(
            *[
                F.struct(
                    _probe_lit(c).alias("c"),
                    F.lit(float(sum(x * x for x in c))).alias("n"),
                )
                for c in centroids
            ]
        )
        staged = df.withColumn("_ivf_v", F.col(vec_col).cast("array<double>")).withColumn(
            "_ivf_scores",
            F.transform(cents_lit, lambda s: 2.0 * dot(F.col("_ivf_v"), s["c"]) - s["n"]),
        )
        cell = (F.array_position("_ivf_scores", F.array_max("_ivf_scores")) - 1).cast("int")
        return staged.withColumn(cell_col, cell).drop("_ivf_v", "_ivf_scores")
    if backend != "arrow":
        raise ValueError(f"unknown backend: {backend}")

    import numpy as np
    from pyspark.sql import types as T

    C = np.asarray(centroids, dtype="float64")
    norms = (C * C).sum(axis=1)
    out_schema = T.StructType(list(df.schema.fields) + [T.StructField(cell_col, T.IntegerType())])

    def _assign(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(**{cell_col: pd.Series([], dtype="int32")})
                continue
            V = np.stack(pdf[vec_col].values).astype("float64")
            acc = np.zeros((len(V), C.shape[0]))
            for d in range(C.shape[1]):
                # dim-order accumulation: bit-equal to the sequential
                # expression fold / oracle dot product.
                acc = acc + V[:, d : d + 1] * C[:, d][None, :]
            scores = 2.0 * acc - norms[None, :]
            yield pdf.assign(**{cell_col: scores.argmax(axis=1).astype("int32")})

    return df.mapInPandas(_assign, out_schema)


def cosine_topk_ivf(
    df: DataFrame,
    probe: Sequence[float],
    centroids: Sequence[Sequence[float]] = DEFAULT_CENTROIDS,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_probe_cells: int = 1,
) -> DataFrame:
    """IVF ANN top-k: scan only the ``n_probe_cells`` cells whose
    centroids are closest to the probe, brute-force cosine inside.
    ``n_probe_cells`` is the recall/cost dial (nprobe in FAISS terms).
    """
    def score(c: Sequence[float]) -> float:
        c_norm_sq = sum(x * x for x in c)
        return 2.0 * sum(float(a) * float(b) for a, b in zip(probe, c)) - c_norm_sq

    ranked = sorted(range(len(centroids)), key=lambda i: (-score(centroids[i]), i))
    probe_cells = ranked[:n_probe_cells]
    assigned = ivf_assign(df, centroids, vec_col)
    cand = assigned.filter(F.col("ivf_cell").isin(probe_cells))
    return cosine_topk(cand, probe, k=k, vec_col=vec_col, id_col=id_col)


def kmeans_update(
    df: DataFrame,
    centroids: Sequence[Sequence[float]] = DEFAULT_CENTROIDS,
    vec_col: str = "embedding",
    quant: int = 1_000_000,
) -> DataFrame:
    """One k-means update step: assign every vector to its nearest
    codebook centroid (``ivf_cell`` arithmetic), then recompute each
    centroid as the member mean, per dimension. Returns
    (cell, dim, n_members, centroid) — the new codebook in long form.

    Determinism: float summation is order-dependent, and Spark's
    aggregation order varies with partitioning — so member values are
    quantized to exact integer units (round(v·quant) as long) first;
    the integer sums are order-independent and the final
    sum / (quant·n) division is one exactly-rounded IEEE op. Both
    engines round() doubles half-away-from-zero, so the quantization
    is portable too. The codebook error vs exact float means is
    bounded by 1/(2·quant) per dimension — irrelevant for a coarse
    quantizer rebuild.

    Plan shape: narrow assign + posexplode, then ONE hash-agg shuffled
    on (cell, dim) — |cells|·|dims| result rows. Partial aggregation
    makes the shuffle move one partial sum per (cell, dim, partition),
    not per vector: at 100 TB this is the textbook distributed k-means
    iteration. Iterate by feeding the returned codebook back in.
    """
    assigned = ivf_assign(df, centroids, vec_col=vec_col, cell_col="_cell")
    ex = assigned.select(
        F.col("_cell").alias("cell"),
        F.posexplode(F.col(vec_col)).alias("dim", "_v"),
    )
    q = F.round(F.col("_v").cast("double") * F.lit(float(quant))).cast("long")
    agg = ex.select("cell", "dim", q.alias("_q")).groupBy("cell", "dim").agg(
        F.sum("_q").alias("_s"), F.count(F.lit(1)).alias("n_members")
    )
    centroid = F.col("_s").cast("double") / (
        F.lit(float(quant)) * F.col("n_members").cast("double")
    )
    return agg.select(
        "cell",
        "dim",
        F.col("n_members").cast("bigint").alias("n_members"),
        centroid.alias("centroid"),
    )


def _cell_pair_sims(V):
    """Within-cell cosine similarity matrix with DIM-ORDER float64
    accumulation — bit-equal to the engine's sequential expression
    fold (``0.0 + v0*w0 + v1*w1 + ...``): every element of the Gram
    matrix receives the identical IEEE add/mul sequence, the norm is
    the same fold + one correctly-rounded sqrt, and the final divide
    is dot / (na*nb) exactly as the expression computes it. numpy's
    ``V @ V.T`` would be ~2x faster but uses pairwise/SIMD summation —
    NOT bit-equal — so it is deliberately not used."""
    import numpy as np

    n, d = V.shape
    G = np.zeros((n, n))
    nacc = np.zeros(n)
    for i in range(d):
        col = V[:, i]
        G = G + col[:, None] * col[None, :]
        nacc = nacc + col * col
    norms = np.sqrt(nacc)
    return G / (norms[:, None] * norms[None, :])


def _grouped_cell_pairs(
    assigned: DataFrame,
    id_col: str,
    vec_col: str,
    cap_per_cell: int | None,
    mode: str,
    k: int,
) -> DataFrame:
    """Arrow-grouped within-cell pair scoring: ONE shuffle on the cell
    key brings each cell's vectors to one task, numpy builds the cell's
    similarity matrix (dim-order accumulation — see _cell_pair_sims),
    and only the per-cell winners leave the task. Replaces the
    self-join form's (vectors × pairs) shuffle payload AND the
    downstream ranking window: per-cell output is k rows per vector
    (``mode='knn'``) or k candidate pairs (``mode='pairs'``).

    The deterministic per-cell cap (first ``cap_per_cell`` rows by id)
    is applied inside the group — same semantics as the window form,
    without the extra window pass."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    if mode == "knn":
        out_schema = T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("neighbor_id", T.LongType()),
                T.StructField("rank", T.IntegerType()),
                T.StructField("_sim", T.DoubleType()),
            ]
        )
    else:
        out_schema = T.StructType(
            [
                T.StructField("id_a", T.LongType()),
                T.StructField("id_b", T.LongType()),
                T.StructField("_sim", T.DoubleType()),
            ]
        )

    def _score(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        if cap_per_cell is not None:
            pdf = pdf.head(cap_per_cell)
        n = len(pdf)
        if n < 2:
            if mode == "knn":
                return pd.DataFrame(
                    {
                        "vec_id": pd.Series(dtype="int64"),
                        "neighbor_id": pd.Series(dtype="int64"),
                        "rank": pd.Series(dtype="int32"),
                        "_sim": pd.Series(dtype="float64"),
                    }
                )
            return pd.DataFrame(
                {
                    "id_a": pd.Series(dtype="int64"),
                    "id_b": pd.Series(dtype="int64"),
                    "_sim": pd.Series(dtype="float64"),
                }
            )
        ids = pdf[id_col].to_numpy(dtype="int64")
        V = np.stack(pdf[vec_col].values).astype("float64")
        sims = _cell_pair_sims(V)
        if mode == "knn":
            src, nbr, rnk, sv = [], [], [], []
            for i in range(n):
                row = sims[i]
                order = np.lexsort((ids, -row))  # sim DESC, id ASC
                taken = 0
                for j in order:
                    if j == i:
                        continue
                    taken += 1
                    src.append(ids[i])
                    nbr.append(ids[j])
                    rnk.append(taken)
                    sv.append(row[j])
                    if taken == k:
                        break
            return pd.DataFrame(
                {"vec_id": src, "neighbor_id": nbr, "rank": rnk, "_sim": sv}
            )
        iu, ju = np.triu_indices(n, 1)  # ids sorted -> id_a < id_b
        flat = sims[iu, ju]
        order = np.lexsort((ids[ju], ids[iu], -flat))[:k]
        return pd.DataFrame(
            {"id_a": ids[iu][order], "id_b": ids[ju][order], "_sim": flat[order]}
        )

    return assigned.groupBy("_blk").applyInPandas(_score, out_schema)


def knn_join_ivf(
    df: DataFrame,
    centroids: Sequence[Sequence[float]] | None = None,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sim_scale: int = 4,
    dim: int | None = None,
    cap_per_cell: int | None = None,
    backend: str = "arrow",
) -> DataFrame:
    """k-NN self-join: for EVERY vector, its k most-similar neighbors
    within the same IVF cell (the per-row generalization of
    ``embedding_near_dup_pairs_ivf``'s global top-k).

    This is the workhorse of embedding-based dedup clustering and
    retrieval-index bootstrapping: a full pairwise k-NN graph, blocked
    by the coarse quantizer so the pair count is Σ cells n_c², never
    n². Recall at cell boundaries is the standard IVF trade-off —
    raise the cell count for speed, add multi-probe for recall (the
    same dials as ``cosine_topk_ivf``).

    Plan (``backend='arrow'``, default): cell assignment folds into
    the scan, then ONE shuffle on the cell key feeds an Arrow-grouped
    numpy kernel that builds each cell's similarity matrix with
    dim-order accumulation (bit-equal to the expression fold — see
    _cell_pair_sims) and emits each vector's top-k directly — no pair
    materialization, no vector payload in a join, no ranking window.
    ``backend='join'`` keeps the pure-expression form: within-cell
    equi-join + unrolled dot + row_number window (same output,
    bit-for-bit; equivalence is unit-tested). Returns (vec_id,
    neighbor_id, rank, cosine_sim) with rank 1..k by (sim DESC,
    neighbor ASC).
    """
    cents = centroids if centroids is not None else CENTROIDS_FINE
    from pyspark.sql import Window

    assigned = ivf_assign(df, cents, vec_col, cell_col="_blk")
    if backend == "arrow":
        out = _grouped_cell_pairs(
            assigned.select(F.col(id_col), "_blk", F.col(vec_col)),
            id_col,
            vec_col,
            cap_per_cell,
            "knn",
            k,
        )
        return out.select(
            F.col("vec_id").alias(id_col) if id_col != "vec_id" else F.col("vec_id"),
            "neighbor_id",
            "rank",
            F.round(F.col("_sim"), sim_scale).alias("cosine_sim"),
        )
    if backend != "join":
        raise ValueError(f"unknown backend: {backend}")
    v = assigned.select(
        F.col(id_col), F.col("_blk"), F.col(vec_col).cast("array<double>").alias("_v")
    )
    if cap_per_cell is not None:
        wcap = Window.partitionBy("_blk").orderBy(F.col(id_col))
        v = (
            v.withColumn("_rn", F.row_number().over(wcap))
            .filter(F.col("_rn") <= cap_per_cell)
            .drop("_rn")
        )
    v = v.withColumn("_n", l2_norm(F.col("_v")))
    a = v.select(
        F.col(id_col).alias("vec_id"), "_blk", F.col("_v").alias("_va"), F.col("_n").alias("_na")
    )
    b = v.select(
        F.col(id_col).alias("neighbor_id"), "_blk", F.col("_v").alias("_vb"), F.col("_n").alias("_nb")
    )
    pairs = a.join(b, "_blk").filter(F.col("vec_id") != F.col("neighbor_id"))
    pair_dot = (
        dot_unrolled(F.col("_va"), F.col("_vb"), dim)
        if dim is not None
        else dot(F.col("_va"), F.col("_vb"))
    )
    sim = pair_dot / (F.col("_na") * F.col("_nb"))
    scored = pairs.select("vec_id", "neighbor_id", sim.alias("_sim"))
    w = Window.partitionBy("vec_id").orderBy(F.desc("_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "vec_id", "neighbor_id", "rank",
            F.round(F.col("_sim"), sim_scale).alias("cosine_sim"),
        )
    )
