"""Similarity search over an embedding column (task brief: ANN surface).

- cosine_topk:    brute-force exact top-k (broadcast the query side) —
                  the correctness baseline, oracle-checkable.
- cosine_neardup: exact all-pairs near-dup at a cosine threshold.
- lsh_signatures / lsh_topk: random-hyperplane sign-LSH — the scale
  path. Signatures are computed in one Arrow-batched numpy matmul per
  batch (vectorized pandas UDF, no per-row Python); candidates bucket
  on signature bands, exact cosine re-ranks survivors.
- ivf_build / ivf_topk: IVF variant — Lloyd-iteration centroids built
  with DataFrame ops (posexplode + fixed-point groupBy mean, order-
  independent by construction), probe the nprobe nearest cells only.

Determinism: all floating math that an oracle checks is done in double
precision with a fixed left-to-right fold (F.aggregate), then rounded
to 6 decimals — bit-identical to DuckDB's sequential list_sum over the
same values.

Scale notes: brute force is O(n·q) — fine for a broadcast-able query
set, wrong for n×n; near-dup at 100 TB goes through sign-LSH banding
(shuffle on band key only) exactly like MinHash/SimHash in
analysis.dedup. IVF bounds each probe to nprobe/k of the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from .hashing import chunk_explode

LSH_SEED = 42


def _dot_expr(a, b) -> F.Column:
    """Deterministic double dot product: left-to-right fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm_expr(a) -> F.Column:
    return F.sqrt(_dot_expr(a, a))


def with_norm(emb: DataFrame, col: str = "embedding") -> DataFrame:
    return emb.withColumn("norm", _norm_expr(F.col(col)))


def _with_qnorm(queries: DataFrame) -> DataFrame:
    """Precompute the query-side norm ONCE per query before the
    broadcast — inlining _norm_expr(qvec) into the pair-scoring
    expression would re-run the O(dim) fold once per (corpus x query)
    row on the hottest path.  Same expression on the same values, so
    scores are bit-identical."""
    return queries.withColumn("qnorm", _norm_expr(F.col("qvec")))


def _assign_cells(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str,
    id_col: str,
    nprobe: int = 1,
) -> DataFrame:
    """Vector → its ``nprobe`` nearest centroid cells by L2
    (deterministic tie-break on cell id).  Returns the input columns
    plus ``cell``.  The ONE assignment implementation shared by
    ivf_build / ivf_topk / ivf_neardup — three hand-copied variants
    could silently drift apart on a tie-break or distance change.
    ``df`` must not already carry a ``cell`` column."""
    d2 = F.aggregate(
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            "centroid",
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("_d2").asc(), F.col("cell").asc()
    )
    return (
        df.crossJoin(F.broadcast(centroids))
        .withColumn("_d2", d2)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= nprobe)
        .drop("_d2", "_rn", "centroid")
    )


def cosine_topk(
    emb: DataFrame, queries: DataFrame, k: int = 10
) -> DataFrame:
    """Exact brute-force top-k by cosine for each query vector.

    ``queries``: (query_id, qvec). The query side is broadcast — at
    scale this is the classic small-q × huge-n pattern: one scan of the
    corpus, no shuffle until the tiny per-query top-k window.
    Output: (query_id, vec_id, cosine, rnk), rnk 1..k, ties broken by
    vec_id for determinism.
    """
    base = with_norm(emb).select("vec_id", "embedding", "norm")
    scored = (
        base.crossJoin(F.broadcast(_with_qnorm(queries)))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot_expr(F.col("embedding"), F.col("qvec"))
                / (F.col("norm") * F.col("qnorm")),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "vec_id", "cosine", "rnk")
    )


def cosine_neardup(emb: DataFrame, threshold: float = 0.4) -> DataFrame:
    """Exact all-pairs cosine near-dup: (vec_a, vec_b, cosine) with
    vec_a < vec_b and cosine >= threshold. O(n^2) — the oracle-checked
    baseline; the scale path is lsh_topk's banding."""
    base = with_norm(emb).select("vec_id", "embedding", "norm")
    a = base.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        F.col("norm").alias("nna"),
    )
    b = base.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        F.col("norm").alias("nnb"),
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn(
            "cosine",
            F.round(_dot_expr("ea", "eb") / (F.col("nna") * F.col("nnb")), 6),
        )
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )


def ivf_neardup(
    emb: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.4,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-bucketed near-dup pairs — the 100-TB scale path for
    ``cosine_neardup`` (whose all-pairs form is the oracle baseline,
    never the production plan).  Multi-probe indexing: each vector is
    ASSIGNED to its ``nprobe`` nearest cells, pairs are generated only
    within a shared cell (equi-join on cell — no cross product), exact
    cosine verifies every candidate, and duplicates from multi-cell
    co-residence are dropped.  Recall loss is only the pairs whose two
    members share none of their nprobe cells; raising nprobe trades
    compute for recall.  Output: (vec_a, vec_b, cosine) like the exact
    operator."""
    cells = _assign_cells(
        emb.select("vec_id", "embedding"), centroids,
        "embedding", "vec_id", nprobe=nprobe,
    ).select("vec_id", "cell")
    cands = (
        cells.alias("a")
        .join(cells.alias("b"), "cell")
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b")
        )
        .distinct()
    )
    base = with_norm(emb).select("vec_id", "embedding", "norm")
    return (
        cands.join(
            base.select(
                F.col("vec_id").alias("vec_a"),
                F.col("embedding").alias("ea"),
                F.col("norm").alias("nna"),
            ),
            "vec_a",
        )
        .join(
            base.select(
                F.col("vec_id").alias("vec_b"),
                F.col("embedding").alias("eb"),
                F.col("norm").alias("nnb"),
            ),
            "vec_b",
        )
        .withColumn(
            "cosine",
            F.round(_dot_expr("ea", "eb") / (F.col("nna") * F.col("nnb")), 6),
        )
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )


def _hyperplanes(dim: int, nbits: int, seed: int = LSH_SEED) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((dim, nbits))


def lsh_signatures(
    emb: DataFrame, dim: int = 64, nbits: int = 16, seed: int = LSH_SEED
) -> DataFrame:
    """Sign-LSH signature per vector: bit j = (e · h_j) >= 0, packed to
    one long. One numpy matmul per Arrow batch — fully vectorized."""
    planes = _hyperplanes(dim, nbits, seed)
    b_planes = emb.sparkSession.sparkContext.broadcast(planes)
    weights = (1 << np.arange(nbits)).astype(np.int64)

    def sign(batches):
        H = b_planes.value
        for pdf in batches:
            M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            bits = (M @ H) >= 0.0
            pdf = pdf[["vec_id"]].copy()
            pdf["sig"] = bits @ weights
            yield pdf

    return emb.select("vec_id", "embedding").mapInPandas(
        sign, schema="vec_id long, sig long"
    )


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nbits: int = 16,
    max_hamming: int = 6,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors whose LSH
    signature is within ``max_hamming`` sign-bits of the query's
    (lossless chunk-band join, pigeonhole over max_hamming+1 chunks),
    re-ranked by exact cosine. Output like cosine_topk.

    Tuning note: sign-LSH separation depends on the data's neighbor
    contrast — a pair at cosine c has expected signature hamming
    nbits·acos(c)/π, so for weakly-clustered corpora (like the
    sandbox's gaussian embeddings, where top-10 neighbors sit at
    c≈0.4) a generous max_hamming is needed for recall; on strongly
    clustered data tighten it (or raise nbits) to shrink candidates.
    IVF (ivf_topk) is the better scale path when clusters exist.
    """
    n_chunks = max_hamming + 1
    chunk_bits = nbits // n_chunks

    sigs = lsh_signatures(emb, dim=dim, nbits=nbits)
    qsigs = lsh_signatures(
        queries.select(F.col("query_id").alias("vec_id"),
                       F.col("qvec").alias("embedding")),
        dim=dim, nbits=nbits,
    ).select(F.col("vec_id").alias("query_id"), F.col("sig").alias("qsig"))

    cands = (
        chunk_explode(sigs, "sig", "vec_id", n_chunks, chunk_bits)
        .join(
            chunk_explode(qsigs, "qsig", "query_id", n_chunks, chunk_bits),
            ["c", "chunk"],
        )
        .filter(
            (F.bit_count(F.col("sig").bitwiseXOR(F.col("qsig"))) <= max_hamming)
            & (F.col("vec_id") != F.col("query_id"))
        )
        .select("query_id", "vec_id")
        .distinct()
    )
    base = with_norm(emb).select("vec_id", "embedding", "norm")
    scored = (
        cands.join(base, "vec_id")
        .join(F.broadcast(_with_qnorm(queries)), "query_id")
        .withColumn(
            "cosine",
            F.round(
                _dot_expr("embedding", "qvec")
                / (F.col("norm") * F.col("qnorm")),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "vec_id", "cosine", "rnk")
    )


_FXP = 1 << 20  # fixed-point scale for order-independent centroid sums


def _cell_centroids(assigned: DataFrame, vec_col: str = "e") -> DataFrame:
    """Element-wise cell means with ORDER-INDEPENDENT arithmetic: each
    coordinate is scaled to fixed-point int64 before the sum, so
    partial-aggregate merge order can never perturb the result (float
    addition is not associative — under F.avg a last-ulp wobble in a
    centroid could flip a near-tie cell assignment and make the whole
    index run-order-dependent, violating the module's determinism
    contract).  2^-20 precision per element is ample for a coarse
    quantizer — exact cosine re-ranks everything downstream — and an
    int64 sum holds ~4e12 rows per cell before overflow."""
    return (
        assigned.select("cell", F.posexplode(vec_col).alias("i", "v"))
        .withColumn("vq", F.round(F.col("v") * _FXP).cast("long"))
        .groupBy("cell", "i")
        .agg((F.sum("vq") / F.count("*") / F.lit(float(_FXP))).alias("m"))
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("im"))
        .select("cell", F.expr("transform(im, x -> x.m)").alias("centroid"))
    )


def ivf_build(
    emb: DataFrame, n_cells: int = 16, iters: int = 2
) -> DataFrame:
    """IVF coarse quantizer: k-means centroids via ``iters`` Lloyd
    steps, all DataFrame ops. Init: cell = vec_id % n_cells
    (deterministic). Returns (cell, centroid:array<double>)."""
    assigned = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
        (F.col("vec_id") % n_cells).cast("int").alias("cell"),
    )
    for _ in range(iters):
        cents = _cell_centroids(assigned)
        assigned = _assign_cells(
            assigned.select("vec_id", "e"), cents, "e", "vec_id"
        ).select("vec_id", "e", "cell")
    return _cell_centroids(assigned)


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """IVF search: assign corpus to nearest centroid, probe the nprobe
    nearest cells per query, exact cosine within probed cells."""
    corpus_cells = with_norm(
        _assign_cells(
            emb.select("vec_id", "embedding"), centroids,
            "embedding", "vec_id",
        )
    ).select("vec_id", "embedding", "norm", "cell")
    qcells = _assign_cells(
        _with_qnorm(queries.select("query_id", "qvec")), centroids,
        "qvec", "query_id", nprobe=nprobe,
    ).select("query_id", "qvec", "qnorm", "cell")
    scored = (
        corpus_cells.join(qcells, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot_expr("embedding", "qvec")
                / (F.col("norm") * F.col("qnorm")),
                6,
            ),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= k)
        .select("query_id", "vec_id", "cosine", "rnk")
    )
