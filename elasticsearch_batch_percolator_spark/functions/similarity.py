"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: pure Catalyst (zip_with + aggregate), the
  always-correct baseline;
- IVF-partitioned ANN: coarse quantizer = C deterministic centroids (the
  first C vectors); vectors are bucketed by nearest centroid at "index"
  time, queries probe the P nearest centroid buckets. The scale path: a
  probe scans |corpus|·P/C instead of |corpus|.

At 100 TB the bucketed table is written partitioned by centroid_id so a
probe is a partition-pruned scan; here both paths are DataFrame programs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine(a, b):
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk_brute(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """(vec_id, sim_r) exact top-k by cosine; deterministic vec_id tie-break."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine(F.col(vec_col).cast("array<double>"), q)
    scored = vectors.select(F.col(id_col), sim.alias("sim"))
    if round_to is not None:
        scored = scored.withColumn("sim_r", F.round("sim", round_to))
    else:
        scored = scored.withColumn("sim_r", F.col("sim"))
    return (
        scored.orderBy(F.desc("sim_r"), F.asc(id_col))
        .limit(k)
        .select(id_col, "sim_r")
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid (cosine). Centroids are a
    small driver-side list → the argmax is a fold over literal arrays,
    fully JVM-side; no shuffle, no UDF."""
    v = F.col(vec_col).cast("array<double>")
    best_id, best_sim = None, None
    for cid, cvec in centroids:
        c = F.array(*[F.lit(float(x)) for x in cvec])
        sim = cosine(v, c)
        if best_id is None:
            best_id, best_sim = F.lit(cid), sim
        else:
            cond = sim > best_sim
            best_id = F.when(cond, F.lit(cid)).otherwise(best_id)
            best_sim = F.when(cond, sim).otherwise(best_sim)
    return vectors.select(
        F.col(id_col), F.col(vec_col), best_id.alias("centroid_id")
    )


def default_centroids(
    vectors: DataFrame, n: int = 8, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[tuple[int, list[float]]]:
    """Deterministic coarse quantizer: the n lowest-id vectors."""
    rows = vectors.orderBy(id_col).limit(n).collect()
    return [(i, [float(x) for x in r[vec_col]]) for i, r in enumerate(rows)]


def cosine_topk_ivf(
    spark: SparkSession,
    assigned: DataFrame,
    centroids: list[tuple[int, list[float]]],
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """ANN top-k probing the n_probe centroid buckets nearest to the query."""
    import numpy as np

    qv = np.asarray(query_vec, dtype=np.float64)
    sims = []
    for cid, cvec in centroids:
        c = np.asarray(cvec, dtype=np.float64)
        sims.append((float(qv @ c / (np.linalg.norm(qv) * np.linalg.norm(c))), cid))
    probe = [cid for _, cid in sorted(sims, reverse=True)[:n_probe]]
    bucket = assigned.filter(F.col("centroid_id").isin(probe))
    return cosine_topk_brute(bucket, query_vec, k, id_col, vec_col, round_to)
