"""Training-data pipeline ops: dedup, similarity, text analysis, multimodal."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from elasticsearch_batch_percolator_spark.functions.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    minhash_signature,
    ngram_jaccard_pairs,
    shingles,
    simhash,
)
from elasticsearch_batch_percolator_spark.functions.similarity import (
    cosine_topk_brute,
    cosine_topk_ivf,
    default_centroids,
    ivf_assign,
)
from elasticsearch_batch_percolator_spark.functions.text_analysis import (
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)
from elasticsearch_batch_percolator_spark.functions.tokenizer import tokenize_ws
from elasticsearch_batch_percolator_spark.multimodal import extract_features, synth_media


def test_exact_dedup(spark):
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c"), (2, "x y"), (3, "a b c")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["canonical_id"], r["group_size"])
        for r in exact_dedup(docs).collect()
    }
    assert got == {(0, 0, 3), (1, 0, 3), (3, 0, 3), (2, 2, 1)}


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "text string")
    got = [r[0] for r in df.select(shingles(tokenize_ws("text"), 3)).collect()]
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == []


def test_minhash_lsh_finds_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    far = "completely different content about spark shuffles and partitions x y z"
    docs = spark.createDataFrame(
        [(0, base), (1, near), (2, far)], "doc_id long, text string"
    ).withColumn("tokens", tokenize_ws("text"))
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_candidates(docs, n_hashes=16, n_bands=8).collect()
    }
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_minhash_deterministic_md5(spark):
    """Signature must equal a pure-python md5 computation (oracle parity)."""
    docs = spark.createDataFrame([(0, "a b c d e")], "doc_id long, text string")
    sig = docs.select(
        minhash_signature(shingles(tokenize_ws("text"), 3), 4).alias("sig")
    ).first()["sig"]
    sh = ["a b c", "b c d", "c d e"]
    for i in range(4):
        exp = min(hashlib.md5(f"{i}|{s}".encode()).hexdigest() for s in sh)
        assert sig[i] == exp


def test_ngram_jaccard(spark):
    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b c e"), (2, "x y z w")],
        "doc_id long, text string",
    ).withColumn("tokens", tokenize_ws("text"))
    rows = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs, shingle_n=2).collect()}
    # doc0 bigrams {ab,bc,cd}, doc1 {ab,bc,ce}: inter=2, union=4 -> 0.5
    assert abs(rows[(0, 1)] - 0.5) < 1e-12
    assert (0, 2) not in rows


def test_simhash_properties(spark):
    docs = spark.createDataFrame(
        [(0, "a b c d e f"), (1, "a b c d e f"), (2, "q r s t u v")],
        "doc_id long, text string",
    ).withColumn("tokens", tokenize_ws("text"))
    got = {r["doc_id"]: r["simhash"] for r in simhash(docs, bits=32).collect()}
    assert got[0] == got[1]  # identical docs -> identical fingerprint
    assert got[0] != got[2]
    assert 0 <= got[0] < 2**32


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_cosine_brute_vs_numpy(spark, embeddings):
    rows = embeddings.orderBy("vec_id").collect()
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    q = mat[0]
    sims = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = sorted(range(len(sims)), key=lambda i: (-round(sims[i], 6), rows[i]["vec_id"]))
    expected = [(rows[i]["vec_id"], round(float(sims[i]), 6)) for i in order[:5]]
    got = [
        (r["vec_id"], r["sim_r"])
        for r in cosine_topk_brute(embeddings, list(q), k=5).collect()
    ]
    assert got == expected


def test_ivf_recall(spark, embeddings):
    cents = default_centroids(embeddings, n=8)
    assigned = ivf_assign(embeddings, cents).cache()
    rows = embeddings.orderBy("vec_id").collect()
    q = list(rows[3]["embedding"])
    brute = [r["vec_id"] for r in cosine_topk_brute(embeddings, q, k=10).collect()]
    ann = [
        r["vec_id"]
        for r in cosine_topk_ivf(spark, assigned, cents, q, k=10, n_probe=4).collect()
    ]
    recall = len(set(brute) & set(ann)) / 10
    assert recall >= 0.5  # 4/8 buckets probed -> decent recall on 500 vecs
    # every vector landed in exactly one bucket
    assert assigned.count() == embeddings.count()
    assigned.unpersist()


def test_kmeans_trained_ivf(spark, embeddings):
    """k-means training: deterministic, normalized centroids, and recall
    at partial probe at least as good as the brute-force contract (0.8 is
    the embedding_ann_recall gate threshold)."""
    from elasticsearch_batch_percolator_spark.functions.similarity import kmeans_fit

    cents = kmeans_fit(embeddings, n=8, iters=3)
    cents2 = kmeans_fit(embeddings, n=8, iters=3)
    assert cents == cents2  # deterministic
    assert len(cents) == 8
    for _, v in cents:
        assert abs(sum(x * x for x in v) - 1.0) < 1e-9  # spherical

    assigned = ivf_assign(embeddings, cents).cache()
    rows = embeddings.orderBy("vec_id").collect()
    q = list(rows[0]["embedding"])
    brute = {r["vec_id"] for r in cosine_topk_brute(embeddings, q, k=10).collect()}
    ann = {
        r["vec_id"]
        for r in cosine_topk_ivf(spark, assigned, cents, q, k=10, n_probe=3).collect()
    }
    assert len(brute & ann) / 10 >= 0.8
    # full probe == exact brute-force (the embedding_ann_ivf gate contract)
    full = [
        (r["vec_id"], r["sim_r"])
        for r in cosine_topk_ivf(spark, assigned, cents, q, k=10, n_probe=8).collect()
    ]
    exact = [
        (r["vec_id"], r["sim_r"])
        for r in cosine_topk_brute(embeddings, q, k=10).collect()
    ]
    assert full == exact
    assigned.unpersist()


def test_text_analysis(spark):
    docs = spark.createDataFrame(
        [
            (0, "the quick fox is one of the best and is fast"),
            (1, "def import class return self def import"),
            (2, ""),
        ],
        "doc_id long, text string",
    ).withColumn("tokens", tokenize_ws("text"))
    rows = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id",
            token_count("tokens").alias("tc"),
            bpe_ish_token_count("text").alias("bc"),
            lang_id("tokens").alias("lang"),
            quality_score("text", "tokens").alias("q"),
            fingerprint("tokens").alias("fp"),
        ).collect()
    }
    assert rows[0]["tc"] == 11 and rows[0]["lang"] == "en"
    assert rows[1]["lang"] == "code"
    assert rows[2]["tc"] == 0 and rows[2]["lang"] == "und"
    assert rows[0]["q"] > rows[2]["q"]
    toks = sorted(set("the quick fox is one of the best and is fast".split()))
    assert rows[0]["fp"] == hashlib.md5(" ".join(toks).encode()).hexdigest()


def test_multimodal_plumbing(spark):
    docs = spark.createDataFrame(
        [(i, f"payload number {i} with some bytes") for i in range(20)],
        "doc_id long, text string",
    )
    media = synth_media(docs)
    assert media.schema["payload"].dataType.typeName() == "binary"
    feats = extract_features(media, dim=16).collect()
    assert len(feats) == 20
    for r in feats:
        assert len(r["feature"]) == 16
        assert abs(sum(r["feature"]) - 1.0) < 1e-9  # normalized histogram
        assert r["n_bytes"] > 0
    # real decoder path raises by contract
    from elasticsearch_batch_percolator_spark.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_extract_features_real_path_fails_cleanly(spark):
    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    media = synth_media(docs)
    with pytest.raises(Exception):
        extract_features(media, fake_decode=False).collect()


def test_cosine_neardup_srp_lsh(spark):
    """SRP-LSH near-dup: planted jittered copies must be recovered with
    recall >= 0.9 at sim >= 0.95, and verified sims must equal the exact
    all-pairs path on the candidate subset."""
    import numpy as np

    from elasticsearch_batch_percolator_spark.functions.similarity import (
        cosine_neardup_pairs,
        srp_lsh_candidates,
    )

    rng = np.random.RandomState(7)
    base = rng.randn(40, 32)
    rows = []
    vid = 0
    expected_pairs = set()
    for i in range(40):
        rows.append((vid, base[i].tolist()))
        orig = vid
        vid += 1
        if i % 2 == 0:  # plant a near-duplicate (tiny jitter)
            dup = base[i] + 0.02 * rng.randn(32)
            rows.append((vid, dup.tolist()))
            expected_pairs.add((orig, vid))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cand = srp_lsh_candidates(emb, n_bits=16, n_bands=4, seed=42)
    verified = cosine_neardup_pairs(emb, threshold=0.95, pairs=cand)
    got = {(r["vec_a"], r["vec_b"]) for r in verified.collect()}
    recall = len(got & expected_pairs) / len(expected_pairs)
    assert recall >= 0.9, f"recall {recall}"

    # verified sims agree with the exact path restricted to candidates
    exact = {
        (r["vec_a"], r["vec_b"]): r["sim_r"]
        for r in cosine_neardup_pairs(emb, threshold=0.95).collect()
    }
    for pair in got:
        assert pair in exact

    # determinism of the seeded hyperplanes
    cand2 = srp_lsh_candidates(emb, n_bits=16, n_bands=4, seed=42)
    assert sorted(map(tuple, cand.collect())) == sorted(map(tuple, cand2.collect()))


def test_default_centroids_large_no_driver_collect(spark):
    """Centroid init at 10^5 vectors: quantile-bucketed seeds (never an
    unbounded id collect), deterministic across invocations, n rows max."""
    vecs = (
        spark.range(100_000)
        .select(
            F.col("id").alias("vec_id"),
            F.expr(
                "transform(sequence(1, 8), "
                "i -> cast(sin(id * i) as float))"
            ).alias("embedding"),
        )
    )
    c1 = default_centroids(vecs, n=8)
    c2 = default_centroids(vecs, n=8)
    assert c1 == c2  # deterministic
    assert len(c1) == 8
    assert [cid for cid, _ in c1] == list(range(8))
    # seeds spread across the id range (quantile buckets, not a prefix)
    # -- recover seed ids by matching embeddings is overkill; instead
    # assert the vectors are pairwise distinct
    assert len({tuple(v) for _, v in c1}) == 8


def test_ivf_partitioned_index_prunes(spark, embeddings, tmp_path):
    """write_ivf_index + cosine_topk_ivf_pruned: the probe's centroid_id
    filter must reach the scan as a PartitionFilter (no I/O for unprobed
    buckets — the 100-TB probe path), and results must equal the unwritten
    in-memory probe."""
    from elasticsearch_batch_percolator_spark.functions.similarity import (
        cosine_topk_ivf_pruned,
        kmeans_fit,
        probe_centroids,
        write_ivf_index,
    )

    cents = kmeans_fit(embeddings, n=8, iters=3)
    assigned = ivf_assign(embeddings, cents)
    path = str(tmp_path / "ivf_index")
    write_ivf_index(assigned, path)

    rows = embeddings.orderBy("vec_id").collect()
    q = list(rows[0]["embedding"])
    pruned = cosine_topk_ivf_pruned(spark, path, cents, q, k=10, n_probe=3)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the centroid_id predicate is a partition filter, not a data filter
    pf = plan[plan.index("PartitionFilters"):].splitlines()[0]
    assert "centroid_id" in pf

    mem = cosine_topk_ivf(spark, assigned, cents, q, k=10, n_probe=3)
    assert [tuple(r) for r in pruned.collect()] == [tuple(r) for r in mem.collect()]
    # sanity: probing reads fewer files than the full index has partitions
    assert len(probe_centroids(cents, q, 3)) == 3


def test_resolve_clusters_chain_pointer_jump(spark):
    """A pure chain 0-1-2-...-19 (diameter 19) must fully contract — the
    pointer-jump term is what makes this converge well under 19 rounds."""
    from elasticsearch_batch_percolator_spark.functions.dedup import (
        resolve_duplicate_clusters,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(19)], "doc_a long, doc_b long"
    )
    got = {
        (r["doc_id"], r["canonical_id"])
        for r in resolve_duplicate_clusters(pairs, max_rounds=10).collect()
    }
    assert got == {(i, 0) for i in range(20)}


def test_resolve_clusters_vs_union_find(spark):
    """Random pair graph == a python union-find oracle, exactly."""
    import random

    from elasticsearch_batch_percolator_spark.functions.dedup import (
        resolve_duplicate_clusters,
    )

    rng = random.Random(20260819)
    n = 300
    edges = sorted({tuple(sorted(rng.sample(range(n), 2))) for _ in range(220)})

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # oracle canonical = min member of the component
    comp = {}
    for v in range(n):
        comp.setdefault(find(v), []).append(v)
    want = {}
    for members in comp.values():
        m = min(members)
        for v in members:
            want[v] = m
    touched = {v for e in edges for v in e}

    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["canonical_id"]
        for r in resolve_duplicate_clusters(pairs).collect()
    }
    assert set(got) == touched
    assert got == {v: want[v] for v in touched}


def test_dedup_keep_list_covers_corpus(spark):
    """keep_list extends transitive clusters to the whole corpus: singletons
    are their own canonical, one is_canonical survivor per cluster."""
    from elasticsearch_batch_percolator_spark.functions.dedup import dedup_keep_list

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], "doc_id long, text string"
    )
    # clusters {0,1,2} (transitively: 0-1, 1-2) and {5,7}; 3,4,6 singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 7)], "doc_a long, doc_b long"
    )
    rows = {
        r["doc_id"]: (r["canonical_id"], r["cluster_size"], r["is_canonical"])
        for r in dedup_keep_list(docs, pairs).collect()
    }
    assert rows == {
        0: (0, 3, 1),
        1: (0, 3, 0),
        2: (0, 3, 0),
        3: (3, 1, 1),
        4: (4, 1, 1),
        5: (5, 2, 1),
        6: (6, 1, 1),
        7: (5, 2, 0),
    }
