"""Similarity search over embedding columns.

- ``cosine_topk``: brute-force exact top-k (the correctness baseline);
  JVM-side dot products via F.aggregate/F.zip_with — no Python UDFs.
- ``lsh_bucketed_topk``: the scale path — random-hyperplane LSH buckets
  candidates first, then scores only within matching buckets.  At 10^12
  rows the bucket join replaces the full cross product; recall is tunable
  via (num_planes, num_tables).

Hyperplanes are generated from a fixed seed so results are deterministic.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_topk(df: DataFrame, query: Sequence[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k rows by cosine similarity to a constant query vector."""
    q = F.array(*[F.lit(float(x)) for x in query])
    vec = F.col(vec_col).cast("array<double>")
    cos = _dot(vec, q) / (_norm(vec) * _norm(q))
    return (
        df.select(F.col(id_col), F.round(cos, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def pairwise_topk(df: DataFrame, k: int = 5, id_col: str = "vec_id",
                  vec_col: str = "embedding",
                  label_col: str = "label", dim: int = None) -> DataFrame:
    """For each label centroid, the top-k nearest vectors — a grouped ANN
    shape: centroids are tiny (broadcast), vectors stream.  Pass ``dim``
    when known — otherwise a one-row ``.head()`` probe runs to discover
    it, an extra eager job at plan-construction time."""
    vec = F.col(vec_col).cast("array<double>")
    if dim is None:
        dim = df.select(F.size(vec_col).alias("d")).head()["d"]
    centroids = (
        df.groupBy(label_col)
        .agg(F.array(*[
            F.avg(F.element_at(vec, i + 1)).alias(f"c{i}") for i in range(dim)
        ]).alias("centroid"))
    )
    joined = df.crossJoin(F.broadcast(centroids.select(
        F.col(label_col).alias("centroid_label"), "centroid")))
    cos = _dot(vec, F.col("centroid")) / (_norm(vec) * _norm(F.col("centroid")))
    from pyspark.sql import Window

    w = Window.partitionBy("centroid_label").orderBy(
        F.desc("cosine"), F.col(id_col))
    return (
        joined.select("centroid_label", F.col(id_col),
                      F.round(cos, 6).alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_pairs(df: DataFrame, threshold: float = 0.45,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: (id_a, id_b, cosine).

    This is the exact all-pairs baseline (the verifier for LSH candidate
    sets).  At 10^12-row scale run :func:`lsh_bucket` first and feed only
    within-bucket pairs here — the equi-join on bucket replaces the cross
    product; this function itself is the correctness anchor."""
    va = F.col("va").cast("array<double>")
    vb = F.col("vb").cast("array<double>")
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    cos = _dot(va, vb) / (_norm(va) * _norm(vb))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine_raw", cos)
        .filter(F.col("cosine_raw") >= threshold)
        .select("id_a", "id_b",
                F.round("cosine_raw", 6).alias("cosine"))
    )


def _hyperplanes(dim: int, num_planes: int, seed: int = 7) -> List[List[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_planes, dim)).round(6).tolist()


def lsh_bucket(df: DataFrame, num_planes: int = 8, seed: int = 7,
               id_col: str = "vec_id", vec_col: str = "embedding",
               dim: int = None) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector (sign pattern packed to
    an int).  Pass ``dim`` when known (e.g. ``len(query)``) — otherwise a
    one-row ``.head()`` probe runs to discover it, an extra eager job."""
    vec = F.col(vec_col).cast("array<double>")
    if dim is None:
        dim = df.select(F.size(vec_col).alias("d")).head()["d"]
    planes = _hyperplanes(dim, num_planes, seed)
    bucket = F.lit(0)
    for pi, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        bucket = bucket + F.when(_dot(vec, p) >= 0, F.lit(1 << pi)).otherwise(0)
    return df.withColumn("bucket", bucket.cast("int"))


def lsh_topk(df: DataFrame, query: Sequence[float], k: int = 10,
             num_planes: int = 8, seed: int = 7, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket
    (fall back to exact if the bucket has < k members is the caller's
    policy; this returns the bucket-restricted ranking)."""
    q = np.asarray(query, dtype=float)
    planes = np.asarray(_hyperplanes(len(q), num_planes, seed))
    qbucket = int(sum(1 << i for i, s in enumerate(planes @ q >= 0) if s))
    bucketed = lsh_bucket(df, num_planes, seed, id_col, vec_col, dim=len(q))
    return cosine_topk(bucketed.filter(F.col("bucket") == qbucket), query, k,
                       id_col, vec_col)


def lsh_topk_multi(df: DataFrame, query: Sequence[float], k: int = 10,
                   num_planes: int = 8, num_tables: int = 4,
                   base_seed: int = 7, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """OR-amplified approximate top-k: a vector is a candidate if it shares
    the query's bucket in ANY of ``num_tables`` independent hash tables
    (distinct hyperplane seeds).  Recall rises with num_tables while the
    scored candidate set stays a small union of buckets — the standard
    multi-table LSH trade-off; still one scan AND zero eager probe jobs —
    the vector dimension comes from ``len(query)``, so no per-table
    ``.head()`` runs before the final plan."""
    q = np.asarray(query, dtype=float)
    out = df
    cond = None
    for t in range(num_tables):
        seed = base_seed + 1000 * t
        planes = np.asarray(_hyperplanes(len(q), num_planes, seed))
        qbucket = int(sum(1 << i for i, s in enumerate(planes @ q >= 0) if s))
        out = lsh_bucket(out, num_planes, seed, id_col, vec_col,
                         dim=len(q)) \
            .withColumnRenamed("bucket", f"bucket_{t}")
        hit = F.col(f"bucket_{t}") == qbucket
        cond = hit if cond is None else (cond | hit)
    return cosine_topk(out.filter(cond), query, k, id_col, vec_col)


def ivf_train(df: DataFrame, n_clusters: int = 16, iters: int = 3,
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> List[List[float]]:
    """Deterministic IVF coarse quantizer: ``n_clusters`` centroids via
    Lloyd iterations from a hash-ordered seed sample (the k vectors with
    the smallest md5(id) — reproducible across runs/engines, unlike a
    random init).

    Scale shape: each iteration is one broadcast of the k x dim centroid
    table against the streaming vectors (assignment = min_by over a
    crossJoin with k rows — a broadcast nested loop whose build side is
    tiny), then one (cid, pos) hash aggregation for the new means; only
    k x dim numbers ever reach the driver.

    Cross-engine determinism: per-iteration means are rounded to 6
    decimals (and assignment distances to 9, see :func:`ivf_assign`), so
    float-summation order cannot leak into the trained quantizer —
    :func:`ivf_train_local` reproduces these centroids bit-for-bit from
    the same rows, which is what makes the IVF query oracle-checkable."""
    vec = F.col(vec_col).cast("array<double>")
    seeds = (
        df.select(F.md5(F.col(id_col).cast("string")).alias("_h"),
                  vec.alias("v"))
        .orderBy("_h").limit(n_clusters).collect()
    )
    cents = [list(r["v"]) for r in seeds]
    for _ in range(iters):
        assigned = ivf_assign(df, cents, id_col=id_col, vec_col=vec_col)
        means = (
            assigned.join(df, id_col)
            .select("cid", F.posexplode(vec).alias("pos", "x"))
            .groupBy("cid", "pos").agg(F.avg("x").alias("m"))
            .collect()
        )
        new = [list(c) for c in cents]  # empty clusters keep their centroid
        per_cid: dict = {}
        for r in means:
            per_cid.setdefault(r["cid"], {})[r["pos"]] = r["m"]
        for cid, dims in per_cid.items():
            new[cid] = [round(dims[p], 6) for p in sorted(dims)]
        cents = new
    return cents


def ivf_train_local(ids, vectors, n_clusters: int = 16,
                    iters: int = 3) -> List[List[float]]:
    """Driver-local NumPy mirror of :func:`ivf_train`: identical init
    (k smallest md5(str(id)) rows), identical assignment (squared
    euclidean rounded to 9 decimals, ties to the smaller cid), identical
    6-decimal mean rounding — so the centroids are bit-identical to the
    distributed trainer's on the same rows.  Used by the DuckDB oracle to
    embed the quantizer as literals; NOT the production path (it holds
    every vector in driver memory)."""
    import hashlib

    order = sorted(range(len(ids)),
                   key=lambda i: hashlib.md5(str(ids[i]).encode()).hexdigest())
    cents = [[float(x) for x in vectors[i]] for i in order[:n_clusters]]
    vec = np.asarray(vectors, dtype=float)
    for _ in range(iters):
        c = np.asarray(cents)
        d2 = ((vec[:, None, :] - c[None, :, :]) ** 2).sum(axis=2).round(9)
        assign = d2.argmin(axis=1)  # ties -> first (smaller cid)
        new = [list(x) for x in cents]
        for cid in range(n_clusters):
            mask = assign == cid
            if mask.any():
                new[cid] = [round(float(x), 6)
                            for x in vec[mask].mean(axis=0)]
        cents = new
    return cents


def ivf_assign(df: DataFrame, centroids: List[List[float]],
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """(id, cid): nearest centroid per vector (squared euclidean rounded
    to 9 decimals so summation order is engine-invariant, deterministic
    tie-break on the smaller cid)."""
    spark = df.sparkSession
    vec = F.col(vec_col).cast("array<double>")
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cid int, cvec array<double>")
    diff = F.zip_with(vec, F.col("cvec"), lambda a, b: (a - b) * (a - b))
    d2 = F.round(F.aggregate(diff, F.lit(0.0), lambda acc, v: acc + v), 9)
    return (
        df.crossJoin(F.broadcast(cdf))
        .select(F.col(id_col), F.col("cid"), d2.alias("_d2"))
        .groupBy(id_col)
        .agg(F.min(F.struct(F.col("_d2"), F.col("cid"))).alias("_best"))
        .select(id_col, F.col("_best.cid").alias("cid"))
    )


def ivf_probes(centroids: List[List[float]], query: Sequence[float],
               n_probes: int) -> List[int]:
    """The ``n_probes`` centroid ids nearest the query (squared
    euclidean, ties to the smaller cid) — driver-side, k x dim work."""
    q = np.asarray(query, dtype=float)
    d2 = ((np.asarray(centroids) - q) ** 2).sum(axis=1)
    return [int(i) for i in np.lexsort((np.arange(len(d2)), d2))[:n_probes]]


def ivf_topk(df: DataFrame, query: Sequence[float], k: int = 10,
             n_clusters: int = 16, n_probes: int = 4, iters: int = 3,
             id_col: str = "vec_id", vec_col: str = "embedding",
             centroids: List[List[float]] = None) -> DataFrame:
    """IVF approximate top-k: score only vectors assigned to the
    ``n_probes`` centroids nearest the query (the second ANN scale path
    next to the LSH one; with ``n_probes == n_clusters`` it degenerates to
    exact brute force — the equivalence the tests pin).  Pass
    ``centroids=`` (from :func:`ivf_train`) to reuse a trained quantizer
    across queries — at 10^12 rows the assignment is precomputed once and
    stored as a column, making each query a partition-pruned scan."""
    if centroids is None:
        centroids = ivf_train(df, n_clusters, iters, id_col, vec_col)
    probes = ivf_probes(centroids, query, n_probes)
    assigned = ivf_assign(df, centroids, id_col=id_col, vec_col=vec_col)
    candidates = df.join(
        assigned.filter(F.col("cid").isin(probes)).select(id_col), id_col)
    return cosine_topk(candidates, query, k, id_col, vec_col)


def semantic_dedup(df: DataFrame, n_clusters: int = 8, iters: int = 2,
                   threshold: float = 0.40, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   centroids: List[List[float]] = None,
                   max_cluster_size: int = 100_000) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pruning over an embedding
    column (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication" — the public recipe:
    k-means-cluster the embeddings, then drop all-but-one of each group
    of same-cluster items whose pairwise cosine exceeds a threshold).

    Deterministic keep rule (parallel, engine-invariant): a vector is
    DROPPED iff some lower-id vector in the same cluster has cosine
    similarity >= ``threshold`` with it; ``dup_of`` is the smallest such
    witness id.  This is the greedy-by-id variant of the paper's
    "keep one per duplicate group": no iteration order, no RNG, and it
    over-drops only on chains (a-b similar, b-c similar, a-c not),
    exactly like the reference-free LSH dedup path.

    Returns ``(id, cid, keep boolean, dup_of)`` for EVERY input row.

    Scale shape: clustering bounds the quadratic pair work — the
    intra-cluster self-join shuffles on ``cid`` only (the paper sizes
    k ~ sqrt(N) so expected cluster size is sqrt(N), pair work N^1.5
    total, embarrassingly parallel across clusters).  Training is
    :func:`ivf_train` (broadcast k x dim per iteration, only k x dim
    floats ever reach the driver); assignment is a broadcast
    nested-loop min — no full-table collect anywhere.

    ``max_cluster_size`` caps degenerate clusters (boilerplate mass or
    a near-zero-vector blob collapsing onto one centroid): at 100-TB
    scale one such cluster makes a single ``cid`` shuffle key emit
    O(n^2) pairs.  The cap is enforced BEFORE the pair join — a
    constant-buffer count aggregation sizes every cluster, and only
    rows in surviving clusters enter the self-join (the exact pattern
    of the LSH path's ``max_bucket_size``, dedup.py).  Rows in dropped
    clusters come back ``keep=true, dup_of=null`` — at that size the
    members are template mass that exact/minhash dedup handles
    directly; use :func:`oversized_semantic_clusters` to audit what the
    cap excluded.

    Zero-norm guard: a zero vector has undefined cosine (0/0 = NaN,
    which both engines order ABOVE every number, so ``>= threshold``
    would be vacuously true); pairs where either side has zero norm are
    excluded, i.e. degenerate vectors are never each other's
    duplicates.  Cross-engine determinism inherits the IVF
    contract: 6-decimal centroid rounding, 9-decimal assignment
    distances; the cosine threshold compares the raw IEEE value (same
    contract as :func:`cosine_pairs` — a pair sitting exactly on the
    threshold in one engine's summation order is the only divergence
    surface, identical to the proven ``embedding_near_dup`` oracle)."""
    if centroids is None:
        centroids = ivf_train(df, n_clusters, iters, id_col, vec_col)
    assigned = ivf_assign(df, centroids, id_col=id_col, vec_col=vec_col)
    vec = F.col(vec_col).cast("array<double>")
    # Pre-norm once per VECTOR, not per pair: Spark evaluates
    # higher-order array folds interpreted (CodegenFallback), so the
    # intra-cluster join's per-pair cost must be a single dot — the two
    # norm folds move to the n-row projection (3x on the pair stage;
    # cosine = dot/(na*nb) is the same IEEE expression either way since
    # sqrt(a)*sqrt(b) is how _norm composed before).
    base = (df.select(F.col(id_col), vec.alias(vec_col),
                      _norm(vec).alias("_nrm"))
            .join(assigned, id_col))
    # Cap BEFORE the pair explosion: size every cluster with a
    # constant-buffer count agg (map-side combine), keep only cids at or
    # under the cap, and broadcast the surviving <= k-row cid set into
    # both join branches.  No oversized cluster's rows ever reach the
    # self-join shuffle.
    ok_cids = F.broadcast(
        assigned.groupBy("cid")
        .agg(F.count(F.lit(1)).alias("_cn"))
        .filter(F.col("_cn") <= F.lit(int(max_cluster_size)))
        .select("cid"))
    capped = base.join(ok_cids, "cid")
    a = capped.select(F.col(id_col).alias("id_a"), F.col("cid").alias("cid_a"),
                      F.col(vec_col).alias("va"), F.col("_nrm").alias("na"))
    b = capped.select(F.col(id_col).alias("id_b"), F.col("cid").alias("cid_b"),
                      F.col(vec_col).alias("vb"), F.col("_nrm").alias("nb"))
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    witnesses = (
        a.join(b, (F.col("cid_a") == F.col("cid_b"))
               & (F.col("id_a") > F.col("id_b")))
        .filter((cos >= F.lit(float(threshold)))
                & (F.col("na") > F.lit(0.0)) & (F.col("nb") > F.lit(0.0)))
        .groupBy(F.col("id_a").alias(id_col))
        .agg(F.min("id_b").alias("dup_of"))
    )
    return (
        base.select(id_col, "cid").join(witnesses, id_col, "left")
        .select(F.col(id_col), F.col("cid"),
                F.col("dup_of").isNull().alias("keep"), F.col("dup_of"))
    )


def oversized_semantic_clusters(df: DataFrame, n_clusters: int = 8,
                                iters: int = 2, id_col: str = "vec_id",
                                vec_col: str = "embedding",
                                centroids: List[List[float]] = None,
                                max_cluster_size: int = 100_000) -> DataFrame:
    """Audit companion to :func:`semantic_dedup`: the (cid, cluster_n)
    clusters the cap excluded from the pair join — run it to quantify
    what was dropped (constant-size count buffers only, never id
    lists; the exact analog of ``oversized_lsh_buckets``)."""
    if centroids is None:
        centroids = ivf_train(df, n_clusters, iters, id_col, vec_col)
    assigned = ivf_assign(df, centroids, id_col=id_col, vec_col=vec_col)
    return (
        assigned.groupBy("cid")
        .agg(F.count(F.lit(1)).alias("cluster_n"))
        .filter(F.col("cluster_n") > F.lit(int(max_cluster_size)))
    )


def pq_train(df: DataFrame, m: int = 8, k: int = 16, iters: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding",
             dim: int = 64) -> List[List[List[float]]]:
    """Deterministic product-quantization codebooks: the vector space is
    split into ``m`` contiguous subspaces of ``dim/m`` dims and each
    subspace trains its own ``k``-codeword quantizer (Jegou et al. 2011,
    "Product quantization for nearest neighbor search" — the standard
    IVF-PQ memory layout: 64-dim float32 -> ``m`` uint8 codes is a 32x
    compression).

    Returns ``codebooks[m][k][dim/m]``.

    Same determinism contract as :func:`ivf_train` (so
    :func:`pq_train_local` reproduces it bit-for-bit and the DuckDB
    oracle can embed the codebooks as literals): seeds are the k rows
    with smallest md5(str(id)) — one global seed order shared by every
    subspace — assignment distances round to 9 decimals with ties to
    the smaller code, per-iteration means round to 6.

    Scale shape: ONE pass per iteration trains all m subspaces together
    — explode to (id, sub, subvec), broadcast-join the m*k codeword
    table on ``sub``, min-struct per (id, sub), then one
    (sub, code, pos) hash aggregation; only m*k*(dim/m) floats reach
    the driver per iteration."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    vec = F.col(vec_col).cast("array<double>")
    seeds = (
        df.select(F.md5(F.col(id_col).cast("string")).alias("_h"),
                  vec.alias("v"))
        .orderBy("_h").limit(k).collect()
    )
    if len(seeds) < k:
        # a silent shrink would break downstream k-codeword assumptions
        # (uint8 code sizing, oracle literal shape) — refuse instead
        raise ValueError(
            f"pq_train needs >= k={k} training rows, got {len(seeds)}")
    books = [[[float(x) for x in r["v"][s * dsub:(s + 1) * dsub]]
              for r in seeds] for s in range(m)]
    spark = df.sparkSession
    subs = df.select(
        F.col(id_col),
        F.explode(F.array(*[
            F.struct(F.lit(s).alias("sub"),
                     F.slice(vec, s * dsub + 1, dsub).alias("sv"))
            for s in range(m)])).alias("_e")
    ).select(id_col, "_e.sub", "_e.sv")
    for _ in range(iters):
        cdf = spark.createDataFrame(
            [(s, c, books[s][c]) for s in range(m) for c in range(k)],
            "sub int, code int, cw array<double>")
        diff = F.zip_with(F.col("sv"), F.col("cw"),
                          lambda a, b: (a - b) * (a - b))
        d2 = F.round(F.aggregate(diff, F.lit(0.0), lambda acc, v: acc + v),
                     9)
        assigned = (
            subs.join(F.broadcast(cdf), "sub")
            .select(id_col, "sub", "sv", F.col("code"), d2.alias("_d2"))
            .groupBy(id_col, "sub")
            .agg(F.min(F.struct("_d2", "code")).alias("_best"),
                 F.first("sv").alias("sv"))
            .select("sub", F.col("_best.code").alias("code"),
                    F.posexplode("sv").alias("pos", "x"))
        )
        means = (assigned.groupBy("sub", "code", "pos")
                 .agg(F.avg("x").alias("mu")).collect())
        new = [[list(cw) for cw in sub_book] for sub_book in books]
        per: dict = {}
        for r in means:
            per.setdefault((r["sub"], r["code"]), {})[r["pos"]] = r["mu"]
        for (s, c), dims in per.items():
            new[s][c] = [round(dims[p], 6) for p in sorted(dims)]
        books = new
    return books


def pq_train_local(ids, vectors, m: int = 8, k: int = 16,
                   iters: int = 2) -> List[List[List[float]]]:
    """Driver-local numpy mirror of :func:`pq_train` — identical seed
    order, assignment rounding, tie-break, and mean rounding, so the
    codebooks are bit-identical on the same rows (the oracle-literal
    path, NOT the production trainer)."""
    import hashlib

    dim = len(vectors[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    if len(ids) < k:
        raise ValueError(
            f"pq_train needs >= k={k} training rows, got {len(ids)}")
    dsub = dim // m
    order = sorted(range(len(ids)),
                   key=lambda i: hashlib.md5(str(ids[i]).encode()).hexdigest())
    vec = np.asarray(vectors, dtype=float)
    books = [[[float(x) for x in vec[i, s * dsub:(s + 1) * dsub]]
              for i in order[:k]] for s in range(m)]
    for _ in range(iters):
        new = [[list(cw) for cw in sub_book] for sub_book in books]
        for s in range(m):
            sv = vec[:, s * dsub:(s + 1) * dsub]
            c = np.asarray(books[s])
            d2 = ((sv[:, None, :] - c[None, :, :]) ** 2).sum(axis=2).round(9)
            assign = d2.argmin(axis=1)          # ties -> smaller code
            for code in range(k):
                mask = assign == code
                if mask.any():
                    new[s][code] = [round(float(x), 6)
                                    for x in sv[mask].mean(axis=0)]
        books = new
    return books


def _pq_code_expr(vec, books, dsub: int):
    """codes[m] column: per subspace, the index of the nearest codeword
    (d2 rounded to 9; array_position returns the FIRST minimum, i.e.
    ties go to the smaller code — the trainer's exact rule)."""
    m = len(books)
    cbs = F.array(*[
        F.array(*[F.array(*[F.lit(float(x)) for x in cw])
                  for cw in sub_book])
        for sub_book in books])
    def one_sub(s):
        def d2_of(cw):
            diff = F.zip_with(F.slice(vec, s * dsub + 1, dsub), cw,
                              lambda a, b: (a - b) * (a - b))
            return F.round(
                F.aggregate(diff, F.lit(0.0), lambda acc, v: acc + v), 9)
        d2s = F.transform(F.element_at(cbs, s + 1), d2_of)
        return (F.array_position(d2s, F.array_min(d2s)) - 1).cast("int")
    return F.array(*[one_sub(s) for s in range(m)])


def pq_encode(df: DataFrame, books: List[List[List[float]]],
              id_col: str = "vec_id",
              vec_col: str = "embedding",
              engine: str = "jvm") -> DataFrame:
    """(id, codes array<int>): each vector as ``m`` codebook indices —
    the 32x-compressed representation an IVF-PQ index stores.  Pure
    projection (codebooks are expression literals): fuses into the
    scan, zero shuffle, and the integer codes are exactly
    hash-comparable cross-engine (no float output at all).

    ``engine="jvm"`` is the pure-column-algebra path the oracle mirrors,
    but the m x k distance tree is a higher-order-function expression
    Spark evaluates interpreted (CodegenFallback, ~ms/row).
    ``engine="arrow"`` is the scale path — at 100 TB the encode is the
    FULL corpus pass, so it gets the same treatment as
    ``quantize_embeddings_int8``: a vectorized numpy mapInPandas whose
    distances use the same elementwise ops, left-to-right accumulation
    (cumsum) and half-away rounding, so the integer codes are
    bit-identical to the JVM path (pinned by an A/B test)."""
    dsub = len(books[0][0])
    if engine == "arrow":
        return _pq_encode_arrow(df, books, dsub, id_col, vec_col)
    if engine != "jvm":
        raise ValueError(f"unknown engine {engine!r}")
    vec = F.col(vec_col).cast("array<double>")
    return df.select(F.col(id_col),
                     _pq_code_expr(vec, books, dsub).alias("codes"))


def _np_round_half_away(x, digits: int):
    """Half-away-from-zero decimal rounding on float64 — Spark's
    ROUND/HALF_UP semantics, not numpy's banker's rounding."""
    import numpy as np

    p = 10.0 ** digits
    return np.sign(x) * np.floor(np.abs(x) * p + 0.5) / p


def _pq_codes_np(vecs, books, dsub: int):
    """Vectorized mirror of :func:`_pq_code_expr`: per subspace, squared
    distances accumulate LEFT-TO-RIGHT (cumsum — numpy's ``sum`` is
    pairwise and would drift in the last ulps from the JVM fold), round
    half-away to 9, argmin takes the FIRST minimum (ties to the smaller
    code, the trainer's rule)."""
    import numpy as np

    m = len(books)
    codes = np.empty((vecs.shape[0], m), dtype=np.int32)
    for s in range(m):
        sv = vecs[:, s * dsub:(s + 1) * dsub]
        cw = np.asarray(books[s], dtype=np.float64)
        diff = sv[:, None, :] - cw[None, :, :]
        d2 = np.cumsum(diff * diff, axis=2)[:, :, -1]
        codes[:, s] = _np_round_half_away(d2, 9).argmin(axis=1)
    return codes


def _pq_encode_arrow(df: DataFrame, books, dsub: int,
                     id_col: str, vec_col: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    def process(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            yield pd.DataFrame({
                "_id": pdf[id_col],
                "codes": list(_pq_codes_np(vecs, books, dsub)),
            })

    return (df.select(id_col, vec_col)
            .mapInPandas(process, "_id long, codes array<int>")
            .withColumnRenamed("_id", id_col))


def pq_topk(df: DataFrame, query: Sequence[float],
            books: List[List[List[float]]], k: int = 10,
            id_col: str = "vec_id",
            vec_col: str = "embedding",
            engine: str = "jvm") -> DataFrame:
    """Asymmetric-distance (ADC) approximate top-k: the query builds an
    m x k lookup table of subspace squared distances driver-side, and
    every row's approximate distance is ``sum_s lut[s][codes[s]]`` — a
    table lookup per subspace, never a float dot against the raw
    vector.  This is THE memory-bound ANN scan shape at 10^12 rows:
    the scan touches only the m-byte code column, the raw embedding
    column is pruned away entirely (encode once via :func:`pq_encode`
    and store codes as a column to make that literal).

    Determinism: lut entries round to 9 (same rule as every distance in
    the IVF/PQ family), the m-term sum folds left-to-right, the final
    distance rounds to 9, ties rank by id.

    ``engine`` as in :func:`pq_encode` — "arrow" runs the row-side
    encode + lut sum as a vectorized numpy mapInPandas with the same
    fold order and rounding (A/B-pinned bit equality); the top-k sort
    stays in the JVM either way."""
    m, dsub = len(books), len(books[0][0])
    q = [float(x) for x in query]
    lut = [[round(sum((q[s * dsub + j] - cw[j]) ** 2
                      for j in range(dsub)), 9)
            for cw in books[s]] for s in range(m)]
    if engine == "arrow":
        return _pq_topk_arrow(df, lut, books, dsub, k, id_col, vec_col)
    if engine != "jvm":
        raise ValueError(f"unknown engine {engine!r}")
    vec = F.col(vec_col).cast("array<double>")
    codes = _pq_code_expr(vec, books, dsub)
    luts = F.array(*[F.array(*[F.lit(v) for v in row]) for row in lut])
    dist = F.round(
        F.aggregate(
            F.zip_with(luts, codes,
                       lambda row, c: F.element_at(row, c + 1)),
            F.lit(0.0), lambda acc, v: acc + v), 9)
    return (df.select(F.col(id_col), dist.alias("adc_d2"))
            .orderBy("adc_d2", id_col).limit(k))


def _pq_topk_arrow(df: DataFrame, lut, books, dsub: int, k: int,
                   id_col: str, vec_col: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    lut_np = np.asarray(lut, dtype=np.float64)       # (m, k_codewords)
    m = lut_np.shape[0]

    def process(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            codes = _pq_codes_np(vecs, books, dsub)
            terms = lut_np[np.arange(m)[None, :], codes]     # (n, m)
            adc = _np_round_half_away(np.cumsum(terms, axis=1)[:, -1], 9)
            yield pd.DataFrame({"_id": pdf[id_col], "adc_d2": adc})

    out = (df.select(id_col, vec_col)
           .mapInPandas(process, "_id long, adc_d2 double")
           .withColumnRenamed("_id", id_col))
    return out.orderBy("adc_d2", id_col).limit(k)


def quantize_embeddings_int8(df: DataFrame, id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             engine: str = "jvm") -> DataFrame:
    """Symmetric int8 scalar quantization per vector — the standard 4x
    storage/IO compression for a 100-TB embedding table (and the wire
    format most ANN services ingest): ``scale = absmax / 127``,
    ``q_i = round_half_up(x_i / absmax * 127)`` in [-127, 127].

    Returns ``(id, scale, qvec, recon_cosine)`` where ``recon_cosine``
    (rounded to 6) is the cosine between the vector and its
    dequantization — the per-row quality audit a pipeline thresholds
    before swapping the fp32 column out.

    Every step is ELEMENTWISE IEEE arithmetic in a fixed order (no
    parallel reductions), so the quantized codes are bit-identical
    across engines and cluster sizes — the DuckDB oracle hash-matches
    the codes exactly, not just approximately.  Zero vectors get
    scale 0 and all-zero codes (dequantizes to zero, cosine pinned 1.0
    by convention to keep the audit column total).  Pure projection:
    no shuffle, fuses into the scan.

    ``engine="jvm"`` (default) is the pure-column-algebra path — zero
    Python, exactly what the oracle mirrors — but Spark evaluates
    higher-order functions interpreted (CodegenFallback), ~1 ms/row.
    ``engine="arrow"`` is the scale path: a vectorized numpy
    mapInPandas (~µs/row) whose codes and sums are computed with the
    SAME elementwise ops and left-to-right accumulation (cumsum), so
    codes are bit-identical to the JVM path and scale/cos agree to the
    printed rounding (pinned by an A/B test); the only divergence
    surface is round-half behavior exactly on a 0.5 ulp of the last
    printed digit.
    """
    if engine == "arrow":
        return _quantize_arrow(df, id_col, vec_col)
    if engine != "jvm":
        raise ValueError(f"unknown engine {engine!r}")
    vec = F.col(vec_col).cast("array<double>")
    absmax = F.array_max(F.transform(vec, F.abs))
    q = F.transform(
        vec, lambda x: F.floor(x / absmax * 127.0 + 0.5).cast("int"))
    zero = absmax == 0.0
    qvec = F.when(zero, F.transform(vec, lambda x: F.lit(0))).otherwise(q)

    # One fused accumulator pass for (|v|^2, |deq|^2, v.deq) instead of
    # five separate _dot/_norm trees: higher-order functions are
    # interpreted (CodegenFallback), so every extra reference re-walks
    # the whole quantize tree per row — the naive formulation was ~10x
    # slower.  Per-element arithmetic keeps the ORIGINAL grouping
    # (d = (c * absmax) / 127, left-to-right sums), so the rounded
    # output is bit-identical to the direct dot/norm formulation the
    # oracle computes.
    zipped = F.zip_with(
        vec, qvec,
        lambda x, c: F.struct(x.alias("x"),
                              c.cast("double").alias("c")))
    init = F.struct(F.lit(0.0).alias("vv"), F.lit(0.0).alias("qq"),
                    F.lit(0.0).alias("vq"))

    def step(a, s):
        d = s["c"] * absmax / 127.0
        return F.struct((a["vv"] + s["x"] * s["x"]).alias("vv"),
                        (a["qq"] + d * d).alias("qq"),
                        (a["vq"] + s["x"] * d).alias("vq"))

    def finish(a):
        # finish's lambda variable binds the accumulator ONCE per row,
        # so the multi-reference division cannot re-expand the tree
        return (F.when(a["qq"] == 0.0, F.lit(1.0))
                .otherwise(a["vq"] / (F.sqrt(a["vv"]) * F.sqrt(a["qq"]))))

    cos = F.when(zero, F.lit(1.0)).otherwise(
        F.aggregate(zipped, init, step, finish))
    return df.select(
        F.col(id_col),
        F.round(absmax / 127.0, 9).alias("scale"),
        qvec.alias("qvec"),
        F.round(cos, 6).alias("recon_cosine"))


def _quantize_arrow(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Vectorized numpy engine for :func:`quantize_embeddings_int8`.

    Bit-compat notes: codes use the identical elementwise expression
    ``floor(x / absmax * 127 + 0.5)`` in float64; the three cosine sums
    accumulate LEFT-TO-RIGHT via ``cumsum`` (numpy's ``sum`` is pairwise
    and would drift in the last ulps from the JVM fold); rounding uses
    half-away-from-zero (``floor(|x| * 10^d + 0.5)``) to match Spark's
    HALF_UP, not numpy's banker's rounding."""
    import numpy as np
    import pandas as pd

    def _round_half_away(x: "np.ndarray", digits: int) -> "np.ndarray":
        p = 10.0 ** digits
        return np.sign(x) * np.floor(np.abs(x) * p + 0.5) / p

    def process(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            am = np.abs(vecs).max(axis=1)
            zero = am == 0.0
            safe = np.where(zero, 1.0, am)
            q = np.floor(vecs / safe[:, None] * 127.0 + 0.5).astype(
                np.int32)
            q[zero] = 0
            d = (q.astype(np.float64) * am[:, None]) / 127.0
            vv = np.cumsum(vecs * vecs, axis=1)[:, -1]
            qq = np.cumsum(d * d, axis=1)[:, -1]
            vq = np.cumsum(vecs * d, axis=1)[:, -1]
            denom = np.sqrt(vv) * np.sqrt(qq)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(zero | (qq == 0.0), 1.0, vq / denom)
            yield pd.DataFrame({
                "_id": pdf[id_col],
                "scale": _round_half_away(am / 127.0, 9),
                "qvec": list(q),
                "recon_cosine": _round_half_away(cos, 6),
            })

    out_schema = (f"_id long, scale double, qvec array<int>, "
                  f"recon_cosine double")
    return (df.select(id_col, vec_col)
            .mapInPandas(process, out_schema)
            .withColumnRenamed("_id", id_col))
