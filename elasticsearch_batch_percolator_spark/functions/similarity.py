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
    """Deterministic INIT centroids: n vectors spread by id-quantile across
    the corpus (not the first n — adjacent ids are often correlated).
    These seed ``kmeans_fit``; do not use untrained for real ANN.

    Scale path: the seed ids come from ``approxQuantile`` over the id
    column (mid-bucket probabilities), then ONE k-row aggregate picks the
    smallest concrete id per quantile bucket — nothing unbounded ever
    reaches the driver (a 10^9-vector corpus collects exactly ≤ n rows).
    ``id_col`` must be numeric (the module's vec_id convention)."""
    probs = [i / n for i in range(n)]
    cuts = vectors.stat.approxQuantile(id_col, probs, 0.001)
    if not cuts:
        return []  # empty input (approxQuantile of zero rows)
    cuts = sorted(set(cuts))
    # bucket(id) = number of cut points <= id; min id per bucket = the
    # first concrete vector at/after each quantile
    bucket = sum(
        (F.when(F.col(id_col) >= F.lit(c), 1).otherwise(0) for c in cuts),
        start=F.lit(0),
    )
    rows = (
        vectors.select(
            bucket.alias("_b"), F.struct(F.col(id_col), F.col(vec_col)).alias("_s")
        )
        .groupBy("_b")
        .agg(F.min("_s").alias("_s"))
        .select("_s.*")
        .orderBy(id_col)
        .collect()
    )
    return [
        (i, [float(x) for x in r[vec_col]]) for i, r in enumerate(rows[:n])
    ]


def kmeans_fit(
    vectors: DataFrame,
    n: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Spherical k-means via Lloyd iterations as DataFrame jobs.

    Each iteration: assign every vector to its nearest centroid (cosine,
    pure Catalyst fold — no shuffle), then one groupBy(centroid) Arrow pass
    summing member vectors (k rows come back to the driver; means are
    L2-normalized — spherical k-means, the right variant for cosine ANN).
    Deterministic: stride-spread init + fixed iteration count. An emptied
    cluster keeps its previous centroid.

    At 100 TB this is the standard shape: the per-iteration cost is one
    scan + one k-row aggregate; the centroid table stays driver-side (k·dim
    floats) and ships via literals.
    """
    import numpy as np
    import pandas as pd

    cents = default_centroids(vectors, n, id_col, vec_col)
    if not cents:
        return []

    def agg_members(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.array(pdf["vec"].tolist(), dtype=np.float64)
        return pd.DataFrame(
            {
                "centroid_id": [int(pdf["centroid_id"].iloc[0])],
                "vec_sum": [mat.sum(axis=0).tolist()],
                "n": [len(pdf)],
            }
        )

    for _ in range(iters):
        assigned = ivf_assign(vectors, cents, id_col, vec_col).select(
            "centroid_id", F.col(vec_col).cast("array<double>").alias("vec")
        )
        rows = (
            assigned.groupBy("centroid_id")
            .applyInPandas(agg_members, "centroid_id int, vec_sum array<double>, n long")
            .collect()
        )
        by_id = {int(r["centroid_id"]): r for r in rows}
        new_cents = []
        for cid, old in cents:
            r = by_id.get(cid)
            if r is None or r["n"] == 0:
                new_cents.append((cid, old))  # empty cluster keeps centroid
                continue
            mean = np.asarray(r["vec_sum"], dtype=np.float64) / float(r["n"])
            nrm = float(np.linalg.norm(mean))
            new_cents.append((cid, (mean / nrm if nrm > 0 else mean).tolist()))
        cents = new_cents
    return cents


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


def probe_centroids(
    centroids: list[tuple[int, list[float]]], query_vec, n_probe: int
) -> list[int]:
    """The n_probe centroid ids nearest (cosine) to ``query_vec``."""
    import numpy as np

    qv = np.asarray(query_vec, dtype=np.float64)
    sims = []
    for cid, cvec in centroids:
        c = np.asarray(cvec, dtype=np.float64)
        sims.append((float(qv @ c / (np.linalg.norm(qv) * np.linalg.norm(c))), cid))
    return [cid for _, cid in sorted(sims, reverse=True)[:n_probe]]


def write_ivf_index(assigned: DataFrame, path: str) -> None:
    """Persist the IVF assignment PARTITIONED by centroid_id — the 100-TB
    layout: each probe reads ONLY its n_probe bucket directories. The
    ``centroid_id`` filter in ``cosine_topk_ivf_pruned`` reaches the scan
    as a PartitionFilter (verified by test/PLANS.md), so a 256-bucket
    index answers an n_probe=8 query touching 3% of the bytes."""
    assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(path)


def cosine_topk_ivf_pruned(
    spark: SparkSession,
    index_path: str,
    centroids: list[tuple[int, list[float]]],
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """ANN top-k over a ``write_ivf_index`` layout: the probe's
    centroid_id IN-filter prunes non-probed partitions at scan planning
    (PartitionFilters — no I/O for unprobed buckets)."""
    probe = probe_centroids(centroids, query_vec, n_probe)
    bucket = spark.read.parquet(index_path).filter(
        F.col("centroid_id").isin(probe)
    )
    return cosine_topk_brute(bucket, query_vec, k, id_col, vec_col, round_to)


def cosine_neardup_pairs(
    vectors: DataFrame,
    threshold: float,
    pairs: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """(vec_a, vec_b, sim_r) — embedding near-duplicate pairs with cosine
    >= threshold (the embedding analog of ngram_jaccard_pairs).

    ``pairs=None`` runs the exact all-pairs join — the always-correct
    oracle path, O(n^2), ONLY for bounded slices (gates, re-ranking a
    bucket). At scale pass ``srp_lsh_candidates`` output: cost becomes
    sum over candidate pairs of dim, like the LSH-gated Jaccard path.
    """
    v = F.col(vec_col).cast("array<double>")
    a = vectors.select(F.col(id_col).alias("vec_a"), v.alias("va"))
    b = vectors.select(F.col(id_col).alias("vec_b"), v.alias("vb"))
    if pairs is not None:
        j = pairs.join(a, "vec_a").join(b, "vec_b")
    else:
        j = a.join(b, F.col("vec_a") < F.col("vec_b"))
    sim = dot(F.col("va"), F.col("vb")) / (norm(F.col("va")) * norm(F.col("vb")))
    out_sim = F.round(sim, round_to) if round_to is not None else sim
    return (
        j.withColumn("sim_r", out_sim)
        .filter(F.col("sim_r") >= threshold)
        .select("vec_a", "vec_b", "sim_r")
    )


def srp_lsh_candidates(
    vectors: DataFrame,
    n_bits: int = 16,
    n_bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_a, vec_b) candidate near-duplicate pairs via signed random
    projections (Charikar SRP — the embedding-space SimHash).

    Each vector gets n_bits sign bits from fixed seeded hyperplanes (pure
    Catalyst folds, no UDF); bits split into n_bands; vectors sharing any
    band bucket become candidates. P(bit agrees) = 1 - theta/pi, so for
    true near-duplicates (cosine >= ~0.9) a 16-bit/4-band config finds
    >90% of pairs; verify candidates with cosine_neardup_pairs(pairs=...).

    Deterministic: hyperplanes from RandomState(seed); the bucket join is
    the standard banded shape (AQE splits skewed buckets).
    """
    import numpy as np

    if n_bits % n_bands != 0 or n_bands <= 0 or n_bands > n_bits:
        raise ValueError(f"n_bits must split evenly: {n_bits=} {n_bands=}")
    first = vectors.select(vec_col).first()
    if first is None:
        return vectors.sparkSession.createDataFrame(
            [], "vec_a long, vec_b long"
        )
    dim = len(first[0])
    planes = np.random.RandomState(seed).randn(n_bits, dim)

    v = F.col(vec_col).cast("array<double>")
    bits = []
    for k in range(n_bits):
        h = F.array(*[F.lit(float(x)) for x in planes[k]])
        bits.append(F.when(dot(v, h) > 0, F.lit("1")).otherwise(F.lit("0")))
    width = n_bits // n_bands
    band_keys = [
        F.concat(*bits[b * width : (b + 1) * width]) for b in range(n_bands)
    ]
    sig = vectors.select(
        F.col(id_col).alias("vec"),
        F.posexplode(F.array(*band_keys)).alias("band", "key"),
    )
    a = sig.alias("a")
    b = sig.alias("b")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("a.vec") < F.col("b.vec"))
        .select(F.col("a.vec").alias("vec_a"), F.col("b.vec").alias("vec_b"))
        .dropDuplicates(["vec_a", "vec_b"])
    )
