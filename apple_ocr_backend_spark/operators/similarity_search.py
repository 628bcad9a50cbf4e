"""Approximate-nearest-neighbor search over an embedding column.

Brute-force cosine top-k is the correctness baseline; the IVF variant
restricts the search to the query's coarse cell (here the precomputed
``label`` column — on a real corpus the cells come from a k-means fit, which
is a tiny driver-side job over a sample).  A random-hyperplane LSH variant
buckets vectors by sign patterns.

Scale disposition: brute force is O(Q×N) — fine for small Q (the broadcast
side is the query set), unusable for all-pairs; IVF cuts N to N/cells with
one equi-join; LSH cuts to expected bucket size with one equi-join on the
sign key.  All similarity math is quantized-integer (see dedup.cosine_q) so
results are engine- and partition-order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from .dedup import _qsum, cosine_from_parts, norm_sq_q


def _pair_cos_q():
    """Quantized cosine for a scored (query, neighbor) join row, combining
    the per-side norms PRECOMPUTED before the join (``__qn``/``__nn``) with
    one dot-product fold — the closed-form ``dedup.cosine_q`` refolds both
    norms per pair, a measured 3-6x tax at candidate-set scale."""
    dot_q = _qsum(F.zip_with(F.col("q_vec"), F.col("n_vec"),
                             lambda x, y: x.cast("double") * y.cast("double")))
    return cosine_from_parts(dot_q, F.col("__qn"), F.col("__nn"))


def brute_force_topk(emb: DataFrame, n_queries: int = 10, k: int = 5,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries`` vectors.
    The query set is broadcast — no shuffle of the big side."""
    q = (emb.filter(F.col(id_col) < n_queries)
         .select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"),
                 norm_sq_q(F.col(vec_col)).alias("__qn")))
    c = emb.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"),
                   norm_sq_q(F.col(vec_col)).alias("__nn"))
    scored = (c.join(F.broadcast(q), F.col("n_id") != F.col("q_id"))
              .withColumn("cos_q", _pair_cos_q()))
    w = W.partitionBy("q_id").orderBy(F.desc("cos_q"), F.asc("n_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "rank", "n_id", "cos_q"))


def ivf_topk(emb: DataFrame, n_queries: int = 10, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             cell_col: str = "label") -> DataFrame:
    """IVF-restricted top-k: only vectors in the query's coarse cell are
    scored (nprobe=1).  One broadcast equi-join on the cell id."""
    q = (emb.filter(F.col(id_col) < n_queries)
         .select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"),
                 F.col(cell_col).alias("cell"),
                 norm_sq_q(F.col(vec_col)).alias("__qn")))
    c = emb.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"),
                   F.col(cell_col).alias("cell"),
                   norm_sq_q(F.col(vec_col)).alias("__nn"))
    scored = (c.join(F.broadcast(q), "cell")
              .filter(F.col("n_id") != F.col("q_id"))
              .withColumn("cos_q", _pair_cos_q()))
    w = W.partitionBy("q_id").orderBy(F.desc("cos_q"), F.asc("n_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "cell", "rank", "n_id", "cos_q"))


def _qv_expr(vec_col: str, scale: int):
    """Quantize a float vector column to integer units (floor(x * scale)) —
    the shared representation for all deterministic distance math here and
    in the DuckDB oracles (see dedup.cosine_q for the rationale)."""
    return F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * scale).cast("long"))


def _centroid_dists(cent, qv_col: str = "__qv"):
    """One quantized squared-distance expression per fitted centroid,
    referencing the ALREADY-PROJECTED quantized-vector column (round-2
    verdict #6: lambda expressions are opaque to Catalyst CSE, so the
    caller must project ``qv_col`` once instead of inlining the quantize
    transform k times)."""
    return [
        F.aggregate(
            F.zip_with(F.col(qv_col),
                       F.array(*[F.lit(int(x)) for x in cent[c]]),
                       lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"), lambda acc, v: acc + v)
        for c in range(len(cent))]


def kmeans_fit(emb: DataFrame, k: int = 8, sample_n: int = 256,
               iters: int = 3, id_col: str = "vec_id",
               vec_col: str = "embedding", scale: int = 1_000_000):
    """Deterministic integer-quantized k-means fit (driver-side sample job).

    The first ``sample_n`` vectors by id are collected (k x dim and
    sample x dim are both trivially small), then the centroids are refined
    for a FIXED ``iters`` rounds with pure integer / floor arithmetic
    (init = first ``k`` vectors; assignment = min quantized squared
    distance, ties to the lowest cell; update = floor(mean) per dimension in
    quantized units; empty cells keep their previous centroid).  No RNG
    anywhere, so the DuckDB oracle replays the identical fit in SQL
    (unrolled iterations) and lands on the same centroids.

    Returns the fitted centroids as an int64 numpy array of shape (k, dim).
    """
    import numpy as np

    samp = (emb.filter(F.col(id_col) < sample_n)
            .select(F.col(id_col).alias("id"),
                    _qv_expr(vec_col, scale).alias("qv"))
            .orderBy("id").collect())
    if len(samp) < k:
        raise ValueError(
            f"k-means fit needs >= k={k} sample vectors with {id_col} < "
            f"{sample_n}; got {len(samp)}")
    if [r["id"] for r in samp[:k]] != list(range(k)):
        # the DuckDB oracle initializes cent0 as `vec_id < k` labelled by
        # vec_id; that equals this first-k-rows init ONLY when ids are
        # contiguous from 0 — enforce the shared precondition loudly
        raise ValueError(
            f"k-means init requires ids 0..{k - 1} present (oracle contract);"
            f" got {[r['id'] for r in samp[:k]]}")
    qs = np.array([r["qv"] for r in samp], dtype=np.int64)
    cent = qs[:k].copy()
    for _ in range(iters):
        d = ((qs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # ties -> lowest cell, like ORDER BY cell
        for c in range(k):
            members = qs[assign == c]
            if len(members):
                cent[c] = np.floor(
                    members.sum(axis=0).astype(np.float64) / len(members)
                ).astype(np.int64)
    return cent


def assign_cells(emb: DataFrame, cent, vec_col: str = "embedding",
                 scale: int = 1_000_000) -> DataFrame:
    """Distributed IVF cell assignment against broadcast fitted centroids:
    one map-only pass, k quantized distances per row, quantized vector
    projected ONCE (CSE, round-2 verdict #6).  Returns ``emb`` with an added
    integer ``cell`` column."""
    k = len(cent)
    qv = emb.withColumn("__qv", _qv_expr(vec_col, scale))
    dists = _centroid_dists(cent)
    cell = F.array_min(F.array(*[
        F.struct(dists[c].alias("d"), F.lit(c).alias("c"))
        for c in range(k)]))["c"]
    return qv.withColumn("cell", cell).drop("__qv")


def kmeans_cells(emb: DataFrame, k: int = 8, sample_n: int = 256,
                 iters: int = 3, id_col: str = "vec_id",
                 vec_col: str = "embedding",
                 scale: int = 1_000_000) -> DataFrame:
    """IVF cell construction: deterministic k-means fit + broadcast assign.

    100 TB disposition: sample-collect + broadcast-assign is the standard
    shape — the fit never touches the full corpus, and assignment is one
    map-only pass (k quantized distances per row, JVM-side).

    Returns ``emb`` with an added integer ``cell`` column, lazily
    ``persist()``-ed: every consumer references the assigned frame at
    least twice (query + candidate side of a cell join), and without the
    cache boundary Catalyst both re-expands the assignment subtree per
    reference AND pushes the join's inferred ``IsNotNull(cell)`` below
    the projection — re-inlining all k centroid-distance expressions
    (k quantize transforms) into a filter that never rejects a row.  The
    cache materializes ``cell`` once per row; the join predicate then
    reads the stored column.  (On a real cluster the equivalent is
    writing the assignment once — the IVF index build.)
    """
    cent = kmeans_fit(emb, k, sample_n, iters, id_col, vec_col, scale)
    return assign_cells(emb, cent, vec_col, scale).persist()


def ivf_topk_nprobe(emb_cells: DataFrame, cent, nprobe: int = 2,
                    n_queries: int = 10, k: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    cell_col: str = "cell",
                    scale: int = 1_000_000) -> DataFrame:
    """Multi-probe IVF top-k (round-2 verdict #4): each query scores
    candidates in its ``nprobe`` NEAREST fitted cells, not just its own —
    recovering the recall lost by near-boundary queries under nprobe=1.

    Probe selection is the same deterministic quantized distance as the
    assignment (ties to the lowest cell), computed only on the tiny query
    side and expanded with one explode; candidates then join the broadcast
    (query, probe_cell) relation on the cell id — each candidate belongs to
    exactly one cell, so no pair is scored twice and no dedup pass is
    needed.  The big side still never shuffles.

    ``emb_cells`` must already carry ``cell_col`` from ``assign_cells`` with
    the SAME ``cent``.
    """
    if not 1 <= nprobe <= len(cent):
        raise ValueError(f"nprobe must be in [1, {len(cent)}]; got {nprobe}")
    q0 = (emb_cells.filter(F.col(id_col) < n_queries)
          .withColumn("__qv", _qv_expr(vec_col, scale)))
    dists = _centroid_dists(cent)
    # array_sort on (d, c) structs orders by distance then cell id — the
    # exact ORDER BY d ASC, cell ASC tie-break the oracle replays
    probes = F.slice(
        F.array_sort(F.array(*[
            F.struct(dists[c].alias("d"), F.lit(c).alias("c"))
            for c in range(len(cent))])), 1, nprobe)
    q = (q0.select(F.col(id_col).alias("q_id"),
                   F.col(vec_col).alias("q_vec"),
                   norm_sq_q(F.col(vec_col)).alias("__qn"),
                   F.explode(probes).alias("p"))
         .select("q_id", "q_vec", "__qn", F.col("p.c").alias(cell_col)))
    c = emb_cells.select(F.col(id_col).alias("n_id"),
                         F.col(vec_col).alias("n_vec"),
                         norm_sq_q(F.col(vec_col)).alias("__nn"), cell_col)
    scored = (c.join(F.broadcast(q), cell_col)
              .filter(F.col("n_id") != F.col("q_id"))
              .withColumn("cos_q", _pair_cos_q()))
    w = W.partitionBy("q_id").orderBy(F.desc("cos_q"), F.asc("n_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "rank", "n_id", "cos_q"))


def hyperplane_lsh_buckets(emb: DataFrame, n_planes: int = 8,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           dim: int = 64) -> DataFrame:
    """Random-hyperplane LSH: bucket key = sign pattern of ``n_planes`` dot
    products.  Hyperplane p's component d is the deterministic pseudo-random
    ±1 given by bit parity of md5 — reproducible in SQL, no RNG state.

    Here (cheaper and still deterministic): component sign = +1 when
    ``(p*31 + d) % 3 != 0`` else -1 — a fixed integer pattern identical in
    any engine.
    """
    def plane_dot_q(p: int):
        # quantized integer dot (see dedup.cosine_q) so the sign decision is
        # bit-identical in the DuckDB oracle
        signs = [1.0 if (p * 31 + d) % 3 != 0 else -1.0 for d in range(dim)]
        return F.aggregate(
            F.zip_with(F.col(vec_col),
                       F.array(*[F.lit(s) for s in signs]),
                       lambda x, s: F.floor(x.cast("double") * s * 1e9)
                                     .cast("long")),
            F.lit(0).cast("long"), lambda acc, v: acc + v)

    key = F.concat(*[F.when(plane_dot_q(p) >= 0, F.lit("1")).otherwise(F.lit("0"))
                     for p in range(n_planes)])
    return emb.select(F.col(id_col).alias("id"), key.alias("bucket"))


def lsh_bucket_topk(emb: DataFrame, n_queries: int = 10, k: int = 5,
                    n_planes: int = 8, id_col: str = "vec_id",
                    vec_col: str = "embedding", dim: int = 64) -> DataFrame:
    """ANN via hyperplane buckets: score only same-bucket vectors."""
    b = hyperplane_lsh_buckets(emb, n_planes, id_col, vec_col, dim)
    e = emb.join(b, emb[id_col] == b["id"]).drop("id")
    q = (e.filter(F.col(id_col) < n_queries)
         .select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"),
                 "bucket", norm_sq_q(F.col(vec_col)).alias("__qn")))
    c = e.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"),
                 "bucket", norm_sq_q(F.col(vec_col)).alias("__nn"))
    scored = (c.join(F.broadcast(q), "bucket")
              .filter(F.col("n_id") != F.col("q_id"))
              .withColumn("cos_q", _pair_cos_q()))
    w = W.partitionBy("q_id").orderBy(F.desc("cos_q"), F.asc("n_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "bucket", "rank", "n_id", "cos_q"))
