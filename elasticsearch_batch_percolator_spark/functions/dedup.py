"""Deduplication operators for large-scale training-data pipelines.

Not in the reference (it percolates, it doesn't dedup) — these are the
pipeline ops a 100 TB corpus engine needs around the index (driver brief):
exact, MinHash+LSH, SimHash, and n-gram Jaccard.

Engine-portability invariant: every hash is derived from ``md5`` of strings,
so DuckDB oracles reproduce results bit-for-bit (Spark ``xxhash64``/``hash``
and DuckDB ``hash`` are different functions; md5 is md5 everywhere).

Scale notes:
- exact dedup: one hash-groupBy, map-side partial agg — the cheapest shuffle.
- MinHash signatures are computed per row from the shingle array with
  ``transform``/``array_min`` (JVM-side, no UDF, no explode); only the LSH
  band table (n_bands rows/doc) is exploded and shuffled.
- LSH buckets self-join per band; at skew (giant buckets) AQE skew-join
  splits them; candidate verification is again per-pair column arithmetic.
- SimHash: explode distinct tokens -> per-bit ±1 sums -> one groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def content_hash(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c)


def exact_dedup(
    docs: DataFrame, content_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, canonical_id, group_size): canonical = min doc_id per
    identical content. Survivors are rows with doc_id == canonical_id.

    Window aggregation, NOT collect_list+explode: a duplicate group stays
    row-shaped end to end. At 100 TB the pathological group (empty files,
    boilerplate) can have 10^8 members — as an array that is one
    driver-killing row; as a window partition it is just a big sorted run
    that spills like any other.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("h")
    return (
        docs.select(F.col(id_col), content_hash(content_col).alias("h"))
        .select(
            F.col(id_col),
            F.min(id_col).over(w).alias("canonical_id"),
            F.count(F.lit(1)).over(w).cast("long").alias("group_size"),
        )
    )


def shingles(tokens: Column | str, n: int = 3) -> Column:
    """Distinct sorted n-gram shingles (space-joined) from a token array."""
    t = F.col(tokens) if isinstance(tokens, str) else tokens
    n_starts = F.size(t) - F.lit(n - 1)
    grams = F.when(
        n_starts >= 1,
        F.transform(
            F.sequence(F.lit(1), n_starts),
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, i + F.lit(j)) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_sort(F.array_distinct(grams))


def minhash_signature(shingle_col: Column | str, n_hashes: int = 16) -> Column:
    """array<string>: per hash function i, min over shingles of
    md5(i || '|' || shingle). Lexicographic min over uniform hex digests is
    a valid MinHash; identical in any engine with md5."""
    s = F.col(shingle_col) if isinstance(shingle_col, str) else shingle_col

    def hasher(i: int):
        # NB: must be a 1-arg lambda — a 2-arg lambda would make F.transform
        # pass the array index as the second argument
        prefix = f"{i}|"
        return lambda x: F.md5(F.concat(F.lit(prefix), x))

    return F.array(*[F.array_min(F.transform(s, hasher(i))) for i in range(n_hashes)])


def lsh_bands(
    sig_col: Column | str, n_bands: int = 4, n_hashes: int | None = None
) -> Column:
    """array<struct<band:int, key:string>> — signature split into bands;
    docs sharing any (band, key) are candidate near-duplicates.

    ``n_hashes`` (when known) is validated up front: a signature length not
    divisible by n_bands would silently DROP trailing hashes, and
    n_bands > n_hashes truncates the band width to 0 so every doc hashes
    the empty slice — bucketing the entire corpus together and exploding
    the candidate self-join. Fail loudly instead.
    """
    if n_hashes is not None:
        if n_bands <= 0 or n_bands > n_hashes:
            raise ValueError(
                f"n_bands must be in [1, n_hashes]: n_bands={n_bands}, n_hashes={n_hashes}"
            )
        if n_hashes % n_bands != 0:
            raise ValueError(
                f"n_hashes must divide evenly into bands: n_hashes={n_hashes}, n_bands={n_bands}"
            )
    s = F.col(sig_col) if isinstance(sig_col, str) else sig_col
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.struct(
            b.cast("int").alias("band"),
            F.md5(
                F.concat_ws(
                    "|",
                    F.slice(
                        s,
                        b * (F.size(s) / n_bands).cast("int") + 1,
                        (F.size(s) / n_bands).cast("int"),
                    ),
                )
            ).alias("key"),
        ),
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    n_bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """(doc_a, doc_b) candidate near-duplicate pairs (doc_a < doc_b).

    Docs with zero shingles (fewer than ``shingle_n`` tokens) are excluded —
    an empty signature must not bucket all short docs together.
    """
    sig = (
        docs.select(
            F.col(id_col).alias("doc"), shingles(tokens_col, shingle_n).alias("sh")
        )
        .filter(F.size("sh") > 0)
        .select(
            "doc",
            F.explode(
                lsh_bands(minhash_signature(F.col("sh"), n_hashes), n_bands, n_hashes)
            ).alias("bk"),
        )
    )
    buckets = sig.select("doc", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) over candidate pairs (or all shingle-sharing
    pairs when ``pairs`` is None) — explode + join, never array ops over
    whole documents in a cross join.

    When ``pairs`` is given (e.g. from minhash_lsh_candidates) the gate is
    applied BEFORE the shingle self-join: intersections are computed only
    for candidate pairs, so the cost is sum over pairs of |shingles| — not
    the O(sum over shingle buckets of bucket^2) all-pairs blowup. At 100 TB
    the ungated path is only safe on pre-bucketed slices; always gate.
    """
    sh = docs.select(
        F.col(id_col).alias("doc"), F.explode(shingles(tokens_col, shingle_n)).alias("s")
    )
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    if pairs is not None:
        # gate-first: only candidate pairs' shingles ever meet.
        # (pair, shingle-of-a) ⋈ (shingle-of-b) on (doc_b, s); count = |A∩B|
        pa = pairs.join(sh.withColumnRenamed("doc", "doc_a"), "doc_a")
        inter = (
            pa.join(
                sh.select(F.col("doc").alias("doc_b"), "s"), ["doc_b", "s"]
            )
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
        )
    else:
        a = sh.alias("a")
        b = sh.alias("b")
        inter = (
            a.join(b, "s")
            .filter(F.col("a.doc") < F.col("b.doc"))
            .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
        )
    return (
        inter.join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash(
    docs: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """(doc_id, simhash): sign-aggregated token-hash bits (Charikar).

    Token hash = first 15 hex chars of md5 -> 60-bit int (reproducible in
    DuckDB as ('0x'||substr(md5(t),1,15))::BIGINT); bit b of the fingerprint
    is 1 iff sum over distinct tokens of (bit_b ? +1 : -1) > 0.
    """
    tok = docs.select(
        F.col(id_col), F.explode(F.array_distinct(F.col(tokens_col))).alias("term")
    ).withColumn("h", F.conv(F.substring(F.md5("term"), 1, 15), 16, 10).cast("long"))
    bit_sums = tok.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(bits)
        ]
    )
    fp = None
    for b in range(bits):
        term = F.when(F.col(f"b{b}") > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp + term
    return bit_sums.select(F.col(id_col), fp.alias("simhash"))


def resolve_duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_rounds: int = 50,
) -> DataFrame:
    """Connected components over a candidate-pair graph ->
    ``(doc_id, canonical_id)`` with canonical = MIN id in the component
    (the same convention as exact_dedup). Only ids that appear in ``pairs``
    are returned; use :func:`dedup_keep_list` to extend to a whole corpus.

    The pair emitters (minhash_lsh_candidates, cosine_neardup_pairs, ...)
    stop at PAIRS; a pipeline that drops duplicates needs one survivor per
    transitive CLUSTER — A~B and B~C must retire both B and C even though
    (A, C) was never emitted.

    Algorithm: min-label propagation with pointer jumping. Each round
    ``lbl(v) <- min(lbl(v), min_{u in N(v)} lbl(u), lbl(lbl(v)))``.
    The neighbor term alone walks the graph (O(diameter) rounds); the
    lbl(lbl(v)) pointer-jump term contracts label chains geometrically, so
    rounds are O(log(longest path)) — a 10^6-doc boilerplate chain resolves
    in ~20 rounds, not 10^6. Each round is two shuffle joins + one groupBy
    over the edge list, all on the pair-graph (not the corpus), and lineage
    is truncated per round with localCheckpoint so the plan stays flat.
    The fixpoint is exact and partitioning-independent; raises RuntimeError
    if max_rounds is hit before convergence.
    """
    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint()  # reused every round: scan, don't recompute
    )
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("m"))
        .select(F.col("src").alias("id"), F.least(F.col("src"), F.col("m")).alias("lbl"))
    )
    for _ in range(max_rounds):
        labels = labels.localCheckpoint()
        nbr_min = (
            edges.join(labels.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"), "lbl")
            .groupBy("id")
            .agg(F.min("lbl").alias("nlbl"))
        )
        jump = labels.select(F.col("id").alias("lbl"), F.col("lbl").alias("jlbl"))
        new = (
            labels.join(nbr_min, "id", "left")
            .join(jump, "lbl", "left")
            .select(
                "id",
                F.least(
                    F.col("lbl"),
                    F.coalesce("nlbl", "lbl"),
                    F.coalesce("jlbl", "lbl"),
                ).alias("new_lbl"),
                (F.col("lbl")).alias("old_lbl"),
            )
            .localCheckpoint()
        )
        changed = new.filter(F.col("new_lbl") < F.col("old_lbl")).count()
        labels = new.select("id", F.col("new_lbl").alias("lbl"))
        if changed == 0:
            return labels.select(F.col("id").alias("doc_id"), F.col("lbl").alias("canonical_id"))
    raise RuntimeError(
        f"resolve_duplicate_clusters did not converge in {max_rounds} rounds; "
        "the pair graph has a longer chain than 2^rounds — raise max_rounds"
    )


def dedup_keep_list(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "doc_a",
    pair_b: str = "doc_b",
) -> DataFrame:
    """(doc_id, canonical_id, cluster_size, is_canonical) over the WHOLE
    corpus: transitive closure of ``pairs`` decides clusters, every
    un-paired doc is its own canonical singleton. ``is_canonical`` marks the
    one survivor (min id) per cluster — `filter("is_canonical = 1")` is the
    dedup; the non-survivors carry their canonical_id for provenance.
    """
    from pyspark.sql import Window

    res = resolve_duplicate_clusters(pairs, id_a=pair_a, id_b=pair_b)
    # No forced broadcast: the label table is duplicate-count-sized, which at
    # web scale can be a large fraction of the corpus. AQE picks broadcast
    # when it actually fits; otherwise this is one hash join keyed on doc_id.
    base = docs.select(F.col(id_col).alias("doc_id")).join(res, "doc_id", "left")
    out = base.select(
        "doc_id", F.coalesce("canonical_id", F.col("doc_id")).alias("canonical_id")
    )
    w = Window.partitionBy("canonical_id")
    return out.select(
        "doc_id",
        "canonical_id",
        F.count(F.lit(1)).over(w).cast("long").alias("cluster_size"),
        (F.col("doc_id") == F.col("canonical_id")).cast("int").alias("is_canonical"),
    )
