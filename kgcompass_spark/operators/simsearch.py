"""Similarity search over an embedding column (array<float>).

  brute_force_topk — exact cosine top-k: broadcast the query vector(s),
                     score JVM-side, TakeOrderedAndProject. The correctness
                     baseline.
  lsh_topk         — hyperplane-LSH bucketed variant: probe only the query's
                     bucket (+multiprobe neighbors); the 100-TB scale path.
  ivf_topk         — IVF-style: k-means-lite centroids (deterministic seed),
                     probe nearest n_probe cells.

All scoring via the JVM cosine (zip_with/aggregate) — no Python in the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.similarity import cosine_similarity


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k per query: cross-join against broadcast queries.

    Scale: cost = |emb| × |queries| cosine evaluations, fully parallel. The
    shuffle is pruned by a per-partition pre-top-k: scored rows are first
    reduced to k rows per (query, input partition) — grouping on
    ``spark_partition_id()`` means the hash-agg completes map-side, so the
    exchange carries at most |partitions|×|queries|×k rows instead of
    |emb|×|queries|. The final row_number window then ranks that bounded
    candidate set. Agg buffer is bounded by rows-per-input-partition
    (sized by spark.sql.files.maxPartitionBytes), not by |emb|.
    """
    scored = emb.crossJoin(F.broadcast(queries)).select(
        F.col(query_id_col).alias("query_id"),
        F.col(id_col).alias("vec_id"),
        cosine_similarity(F.col(vec_col), F.col(query_vec_col)).alias("cosine"),
    )
    # Per-partition pre-top-k under the same (cosine desc, vec_id asc) order
    # the final window uses: sort struct(-cosine, vec_id) ascending, keep k.
    # Any row pruned here is beaten by k rows that survive, so the union of
    # partition top-ks is a superset of the global top-k — exact, not approx.
    local = (
        scored.groupBy("query_id", F.spark_partition_id().alias("_part"))
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            (-F.col("cosine")).alias("nc"),
                            F.col("vec_id").alias("vec_id"),
                        )
                    )
                ),
                1,
                k,
            ).alias("top")
        )
        .select("query_id", F.explode("top").alias("t"))
        .select(
            "query_id",
            F.col("t.vec_id").alias("vec_id"),
            (-F.col("t.nc")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def _hyperplane_sketch(vec_col, n_planes: int = 8, hash_fn=None):
    if hash_fn is None:
        hash_fn = F.xxhash64
    dim = F.size(vec_col)

    def plane_bit(p: int):
        dot = F.aggregate(
            F.zip_with(
                vec_col,
                F.sequence(F.lit(0), dim - 1),
                lambda v, d: v.cast("double")
                * (
                    (
                        F.pmod(hash_fn(F.concat_ws("_", F.lit(p), d)), F.lit(2000))
                        - 1000
                    ).cast("double")
                    / 1000.0
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(dot > 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(1 << p)

    sk = plane_bit(0)
    for p in range(1, n_planes):
        sk = sk + plane_bit(p)
    return sk


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    hash_fn=None,
) -> DataFrame:
    """ANN: bucket base vectors by hyperplane sign sketch; probe the query's
    bucket plus all 1-bit-flip neighbor buckets (multiprobe) — recall knob
    without rebuilding. Join is equi on the sketch → hash join, no cross.

    ``hash_fn`` parameterizes the pseudo-random plane weights: default
    ``F.xxhash64`` (scale path), ``hashing.md5_60`` for the
    DuckDB-reproducible oracle variant (identical bucketing logic)."""
    base = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        _hyperplane_sketch(F.col(vec_col), n_planes, hash_fn).alias("sketch"),
    )
    q0 = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("qv"),
        _hyperplane_sketch(F.col(query_vec_col), n_planes, hash_fn).alias("qsketch"),
    )
    probes = q0.select(
        "query_id",
        "qv",
        F.explode(
            F.array(
                F.col("qsketch"),
                *[
                    F.col("qsketch").bitwiseXOR(F.lit(1 << p))
                    for p in range(n_planes)
                ],
            )
        ).alias("sketch"),
    )
    scored = base.join(F.broadcast(probes), "sketch").select(
        "query_id",
        "vec_id",
        cosine_similarity(F.col("v"), F.col("qv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    hash_fn=None,
) -> DataFrame:
    """IVF-lite: centroids = deterministic hash-sample of n_cells vectors;
    assign base vectors to nearest centroid (one broadcast join), probe the
    ``n_probe`` nearest cells per query.

    Centroid selection is a TakeOrdered over a hash of the id (orderBy +
    limit = per-partition top-n + driver merge, O(n_cells) memory) — NOT a
    global row_number window, which would sort the full table in one task
    (the round-1 scale-killer), and no count() action. Deterministic: the
    id hash is stable across runs. ``hash_fn`` defaults to ``F.xxhash64``;
    pass ``hashing.md5_60`` for the DuckDB-reproducible oracle variant."""
    if hash_fn is None:
        hash_fn = F.xxhash64
    ids = emb.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
    sampled = (
        ids.withColumn("_h", hash_fn(F.col("cid").cast("string")))
        .orderBy("_h", "cid")
        .limit(n_cells)
    )
    # window over n_cells rows only (post-limit) — bounded, not full-table
    centroids = (
        sampled.withColumn(
            "cell", F.row_number().over(Window.orderBy("_h", "cid")) - 1
        ).select("cell", "cvec")
    )
    # assign base vectors to nearest centroid
    assigned = (
        emb.crossJoin(F.broadcast(centroids))
        .withColumn("sim", cosine_similarity(F.col(vec_col), F.col("cvec")))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(F.desc("sim"), F.asc("cell"))
            ),
        )
        .filter(F.col("_rn") == 1)
        .select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"), "cell")
    )
    qcells = (
        queries.crossJoin(F.broadcast(centroids))
        .withColumn("sim", cosine_similarity(F.col(query_vec_col), F.col("cvec")))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc("cell"))
            ),
        )
        .filter(F.col("_rn") <= n_probe)
        .select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("qv"),
            "cell",
        )
    )
    scored = assigned.join(F.broadcast(qcells), "cell").select(
        "query_id", "vec_id", cosine_similarity(F.col("v"), F.col("qv")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )
