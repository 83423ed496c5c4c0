"""Similarity search over embedding columns (``array<float>``).

  - brute-force cosine top-k: the exactness baseline.  Dot products run
    JVM-side via zip_with+aggregate (no Python); the k×N candidate space
    is pruned to top-k per query with one window.
  - hyperplane-LSH buckets: sign-bit signatures against seeded random
    hyperplanes → bucket join; the 100 TB path (candidates only within
    matching buckets, then exact re-score).
  - IVF (inverted-file): coarse centroids (here: per-label means, i.e. a
    precomputed coarse quantizer), probe the nearest n_probe cells, exact
    search within.  At scale the cell id is the partition key, so a query
    touches n_probe partitions only — same pruning story as the
    term-bucket index.

Embedding cosine near-dup pairs (the 5th dedup mode) also lives here —
same blocking machinery.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two float-array columns, computed in float64
    left-to-right (deterministic accumulation order)."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


def _topk_two_stage(scored: DataFrame, qid_col: str, id_col: str, k: int) -> DataFrame:
    """Two-stage exact top-k per query over a (qid, id, cos) frame.

    Stage 1 (partial): inside each Arrow batch, keep only the top-k rows
    per query under the final rank order (cos DESC, id ASC) — a row
    outside its batch's top-k can never be in the global top-k under the
    same total order, so this is lossless for ANY partitioning.  Stage 2
    ranks the survivors (≤ k·n_batches per query) with one small window.
    This replaces the single-partition-per-query row_number window, which
    at 10^9 vectors would funnel every scored row of a query through one
    task."""
    import pandas as pd  # noqa: F401  (mapInPandas contract)

    def partial(batches):
        for b in batches:
            # na_position='first': Spark's ORDER BY cos DESC ranks NaN
            # ABOVE every value, pandas defaults to last — without this a
            # NaN-cosine row (zero-norm vector) would be cut in stage 1
            # exactly when its batch is full, making output depend on
            # partitioning
            yield (
                b.sort_values(
                    [qid_col, "cos", id_col],
                    ascending=[True, False, True],
                    na_position="first",
                )
                .groupby(qid_col, sort=False)
                .head(k)
            )

    from pyspark.sql import Window

    reduced = scored.mapInPandas(partial, schema=scored.schema)
    w = Window.partitionBy(qid_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        reduced.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, "rank", id_col, "cos")
    )


def brute_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Exact cosine top-k per query: broadcast the query set (small side)
    against the vector table, score JVM-side, two-stage top-k.

    Deterministic rank: (round(cos,6) DESC, vec_id ASC) — ties never
    depend on partitioning.  At 10^9 vectors this is one scan of the
    vector table per query batch; broadcast keeps it shuffle-free, and
    the partial top-k means only k rows per (query, partition) ever reach
    the final ranking."""
    j = vectors.crossJoin(F.broadcast(queries))
    scored = j.select(
        F.col(qid_col),
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col(qvec_col)), 6).alias("cos"),
    )
    return _topk_two_stage(scored, qid_col, id_col, k)


def cosine_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a<b) with cos ≥ threshold.

    With block_col set, pairs are only compared within a block (the
    deterministic blocking a curation pipeline gets from a cheap
    clusterer); without it this is the exact O(N²) verifier for tests."""
    a = vectors.alias("a")
    b = vectors.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if block_col is not None:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


# ------------------------------------------------------------ LSH buckets

def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Seeded Gaussian hyperplanes (deterministic across runs/executors)."""
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def lsh_signature_col(vec_col: Column, planes: np.ndarray) -> Column:
    """Sign-bit signature as an int64: bit j = (v · plane_j) > 0.
    Pure column expressions — the plane constants fold into codegen."""
    vd = F.transform(vec_col, lambda x: x.cast("double"))
    sig = F.lit(0).cast("long")
    for j, row in enumerate(planes):
        arr = F.array(*[F.lit(float(c)) for c in row])
        dot = _dot(vd, arr)
        sig = sig + F.when(dot > 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(F.lit(0).cast("long"))
    return sig


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 12,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Approximate top-k: exact re-scoring restricted to vectors whose
    LSH bucket matches the query's.  At scale, `sig` is the table's
    partition/bucket key → per-query partition pruning; here it is a
    plain equi-join (shuffle on a 2^n_planes-value key)."""
    planes = hyperplanes(dim, n_planes, seed)
    v = vectors.withColumn("sig", lsh_signature_col(F.col(vec_col), planes))
    q = queries.withColumn("sig", lsh_signature_col(F.col(qvec_col), planes))
    j = v.join(F.broadcast(q), "sig")
    scored = j.select(
        F.col(qid_col),
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col(qvec_col)), 6).alias("cos"),
    )
    return _topk_two_stage(scored, qid_col, id_col, k)


# ------------------------------------------------------------------- IVF

def ivf_build(
    vectors: DataFrame,
    cell_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Coarse quantizer cells: centroid = per-cell mean vector (posexplode
    → mean per (cell, dim) → re-assemble).  One shuffle over (cell, dim)."""
    pos = vectors.select(
        F.col(cell_col).alias("cell"),
        F.posexplode(F.transform(F.col(vec_col), lambda x: x.cast("double"))).alias("dim", "v"),
    )
    means = pos.groupBy("cell", "dim").agg(F.avg("v").alias("m"))
    return (
        means.groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
        .select("cell", F.transform(F.col("dm"), lambda s: s.getField("m")).alias("centroid"))
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    n_probe: int = 1,
    cell_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
) -> DataFrame:
    """IVF search: per query pick the n_probe nearest cells by centroid
    cosine, exact-search only those cells.  The cells join is a broadcast
    (centroid table is tiny); the vector-side filter prunes on the cell
    partition key.  The probes window is over the tiny query×cell frame
    (bounded by n_queries·n_cells); the vector-side top-k is two-stage."""
    from pyspark.sql import Window

    qc = queries.crossJoin(F.broadcast(centroids)).select(
        qid_col,
        qvec_col,
        F.col("cell"),
        F.round(cosine(F.col(qvec_col), F.col("centroid")), 6).alias("ccos"),
    )
    wq = Window.partitionBy(qid_col).orderBy(F.desc("ccos"), F.asc("cell"))
    probes = qc.withColumn("crank", F.row_number().over(wq)).filter(
        F.col("crank") <= n_probe
    )
    j = vectors.join(
        F.broadcast(probes), vectors[cell_col] == probes["cell"]
    )
    scored = j.select(
        F.col(qid_col),
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col(qvec_col)), 6).alias("cos"),
    )
    return _topk_two_stage(scored, qid_col, id_col, k)

# --------------------------------------------------------------- SemDeDup

def semdedup(
    vectors: DataFrame,
    n_centroids: int = 8,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings, then drop within-cluster
    near-duplicates above a cosine threshold.

    1. assign: every vector goes to its nearest centroid by cosine.
       Centroids are a deterministic seed set (the n_centroids lowest
       ids) standing in for the paper's k-means step — the assignment
       plan is identical either way: broadcast the tiny centroid table,
       score JVM-side, argmax with one groupBy min(struct) (no window,
       no extra shuffle of the vector table).
    2. dedup: within a cluster, any vector with a lower-id neighbor at
       cos >= threshold is marked dropped (the paper keeps one
       representative per semantic group; lowest-id is the deterministic
       representative choice).

    At 100 TB the centroid count scales with the corpus (k ≈ N / target
    cluster size) so the broadcast stays tiny, the pair join shuffles on
    cluster_id only, and the within-cluster quadratic term is bounded by
    the cluster size the clusterer targets — the same blocking story as
    the LSH/IVF paths above.

    Output: (vec_id, cluster_id, dropped) for every input vector.
    """
    cents = vectors.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")
    )
    scored = vectors.crossJoin(F.broadcast(cents)).select(
        F.col(id_col),
        F.col("cid"),
        F.round(cosine(F.col(vec_col), F.col("cvec")), 6).alias("ccos"),
    )
    # argmax per vector under (ccos DESC, cid ASC): min of the inverted
    # struct — field-by-field struct ordering makes this exact, and a
    # groupBy (map-side partial min) beats a per-vector window at scale.
    assign = (
        scored.groupBy(id_col)
        .agg(
            F.min(
                F.struct((-F.col("ccos")).alias("neg"), F.col("cid").alias("cid"))
            ).alias("s")
        )
        .select(F.col(id_col), F.col("s.cid").alias("cluster_id"))
    )
    m = vectors.join(assign, id_col).select(id_col, "cluster_id", vec_col)
    a, b = m.alias("a"), m.alias("b")
    dropped = (
        a.join(
            b,
            (F.col("a.cluster_id") == F.col("b.cluster_id"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"b.{id_col}").alias(id_col),
            F.round(
                cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 6
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .select(id_col)
        .distinct()
        .withColumn("dropped", F.lit(True))
    )
    return assign.join(dropped, id_col, "left").select(
        id_col, "cluster_id", F.coalesce("dropped", F.lit(False)).alias("dropped")
    )

# ----------------------------------------------- hybrid-search rank fusion

def rrf_fuse(ranked: list, k: int = 10, c: int = 60) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009)
    of per-query ranked lists — the standard hybrid-search combiner for
    a lexical (BM25) list and a vector (ANN) list.

    Each input frame carries (query_id, doc_id, r) with r the 1-based
    rank inside its own list; the fused score is sum(1 / (c + r)) over
    the lists a doc appears in.  The inputs are already top-k lists, so
    the fused candidate set is <= sum(k_i) rows per query by
    construction — the final per-query window ranks a bounded, tiny set
    no matter how large the underlying corpus or vector table is.
    """
    from functools import reduce

    from pyspark.sql import Window

    u = reduce(lambda x, y: x.unionByName(y), ranked)
    scored = u.groupBy("query_id", "doc_id").agg(
        F.round(F.sum(1.0 / (F.lit(float(c)) + F.col("r"))), 6).alias("rrf")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "rrf")
    )


def knn_filtered(
    vectors: DataFrame,
    queries: DataFrame,
    filter_col: str,
    allowed,
    k: int = 5,
    mode: str = "pre",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
) -> DataFrame:
    """kNN with a metadata filter (OpenSearch ``knn`` query
    "efficient filtering" vs ``post_filter``): mode="pre" restricts the
    candidate set BEFORE top-k selection — every query still gets k
    results drawn from the allowed subset (the OpenSearch knn `filter`
    semantics) — while mode="post" ranks the UNFILTERED top-k and then
    drops non-matching hits, so a query can return fewer than k (the
    `post_filter` semantics).  The two differ whenever an allowed
    vector sits outside the global top-k; both stay shuffle-free
    (broadcast queries, per-partition partial top-k).

    Reference behavior being matched: OpenSearch knn query filter /
    post_filter on the sink's index (OpenSearchSink.java passthrough);
    at 10^9 vectors "pre" is also the cheaper plan — the filter prunes
    the scan before any dot product runs."""
    if mode == "pre":
        flt = vectors.filter(F.col(filter_col).isin(list(allowed)))
        return brute_topk(flt, queries, k=k, id_col=id_col,
                          vec_col=vec_col, qid_col=qid_col,
                          qvec_col=qvec_col)
    if mode != "post":
        raise ValueError(f"unknown knn filter mode {mode!r}")
    top = brute_topk(vectors, queries, k=k, id_col=id_col,
                     vec_col=vec_col, qid_col=qid_col, qvec_col=qvec_col)
    ok = vectors.filter(F.col(filter_col).isin(list(allowed))).select(id_col)
    # surviving hits KEEP their unfiltered rank positions (gaps where a
    # hit was dropped) — exactly what post_filter shows a user
    return top.join(ok, id_col, "left_semi")
