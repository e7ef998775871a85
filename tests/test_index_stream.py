"""Streaming index ingest: build on the first micro-batch, append on later
ones, compact past a segment threshold, all behind an atomic CURRENT
generation pointer — and replay-safe (Structured Streaming re-delivers a
batch whose foreachBatch ran but whose checkpoint commit didn't)."""

import os
import time

import numpy as np
from pyspark.sql import functions as F
from pyspark.sql import types as T

from elasticsearch_batch_percolator_spark.index.build import (
    append_index,
    build_index,
    compact_index,
    read_manifest,
)
from elasticsearch_batch_percolator_spark.operators.wand import topk_from_index
from elasticsearch_batch_percolator_spark.streaming.index_stream import (
    apply_index_batch,
    current_index_dir,
    index_stream,
    prune_generations,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("tokens", T.ArrayType(T.StringType())),
    ]
)


def _rows(seed, ids, vocab_n=30):
    rng = np.random.default_rng(seed)
    vocab = ["w%02d" % i for i in range(vocab_n)]
    return [
        (int(d), [vocab[j] for j in rng.integers(0, vocab_n, rng.integers(1, 20))])
        for d in ids
    ]


def _topk(spark, idx, k=10):
    qs = {"q1": ["w00", "w07"], "q2": ["w13", "w21"]}
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in topk_from_index(spark, idx, qs, k=k).collect()
    )


def test_stream_build_append_compact_matches_batch_api(spark, tmp_path):
    src = tmp_path / "in"
    root = str(tmp_path / "ix")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    batches = [_rows(1, range(0, 200)), _rows(2, range(1000, 1100)), _rows(3, range(2000, 2080))]

    # batch-API replica of what the stream should do with compact_at=7:
    # build(4) + append(3) -> 7 segs -> crossing triggers compact -> then
    # the third batch appends onto the compacted generation
    rep0 = str(tmp_path / "rep0")
    rep1 = str(tmp_path / "rep1")
    build_index(spark, spark.createDataFrame(batches[0], SCHEMA), rep0, n_segments=4)
    append_index(spark, spark.createDataFrame(batches[1], SCHEMA), rep0, n_new_segments=3)
    compact_index(spark, rep0, rep1, target_segments=3)
    append_index(spark, spark.createDataFrame(batches[2], SCHEMA), rep1, n_new_segments=3)
    expected = _topk(spark, rep1)

    stage = tmp_path / "stage"
    stage.mkdir()

    def _arrive(i):
        # write OUTSIDE the glob, then atomically rename in: the file
        # source lists part files as tasks commit them, so an in-place
        # write can split one logical batch across micro-batches
        spark.createDataFrame(batches[i], SCHEMA).write.parquet(
            str(stage / f"b{i}")
        )
        os.rename(str(stage / f"b{i}"), str(src / f"b{i}"))

    _arrive(0)
    # foreachBatch runs on a CLONED session whose SQLConf snapshots NOW:
    # force static overwrite here so the test fails if the index writers
    # set dynamic mode on the wrong (driver) session — a streaming append
    # under static mode silently wipes every existing segment
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    stream = spark.readStream.schema(SCHEMA).parquet(str(src / "*"))
    q = index_stream(
        spark, stream, root, ckpt,
        segments_per_batch=3, first_build_segments=4,
        compact_at=7, target_segments=3,
    )
    try:
        q.processAllAvailable()
        assert os.path.basename(current_index_dir(root)) == "gen-00000"
        assert read_manifest(current_index_dir(root)).n_segments == 4

        _arrive(1)
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            if os.path.basename(current_index_dir(root)) == "gen-00001":
                break
            time.sleep(0.3)
        # 4 + 3 = 7 segments crossed compact_at -> new generation, 3 segs
        assert os.path.basename(current_index_dir(root)) == "gen-00001"
        assert read_manifest(current_index_dir(root)).n_segments == 3

        _arrive(2)
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            m = read_manifest(current_index_dir(root))
            if m.n_docs == 380:
                break
            time.sleep(0.3)
    finally:
        q.stop()

    cur = current_index_dir(root)
    m = read_manifest(cur)
    assert m.n_docs == 380 and m.n_segments == 6  # 3 compacted + 3 appended
    assert _topk(spark, cur) == expected

    # old generation retained until pruned; prune keeps only CURRENT
    assert os.path.isdir(os.path.join(root, "gen-00000"))
    assert prune_generations(root) == ["gen-00000"]
    assert _topk(spark, cur) == expected


def test_replay_after_lost_applied_marker_is_noop(spark, tmp_path):
    """Crash window: the append bumped the manifest but the _applied
    marker write never happened. The replay must dedup via the batch
    marker INSIDE the manifest (saved atomically with the segment bump),
    not the side file."""
    root = str(tmp_path / "ix")
    b0 = spark.createDataFrame(_rows(6, range(0, 60)), SCHEMA)
    b1 = spark.createDataFrame(_rows(7, range(1000, 1040)), SCHEMA)
    apply_index_batch(spark, root, b0, 0, segments_per_batch=2)
    apply_index_batch(spark, root, b1, 1, segments_per_batch=2)
    before = _topk(spark, current_index_dir(root))
    # simulate the crash: roll the side file back to batch 0
    with open(os.path.join(root, "_applied"), "w") as f:
        f.write("0")
    apply_index_batch(spark, root, b1, 1, segments_per_batch=2)
    m = read_manifest(current_index_dir(root))
    assert m.n_segments == 4 and m.n_docs == 100
    assert _topk(spark, current_index_dir(root)) == before


def test_replay_after_lost_current_flip_converges(spark, tmp_path):
    """Crash window: compaction wrote gen-00001 and marked the batch
    applied, but the CURRENT flip never happened. The orphan generation
    must not poison anything: the next batch appends to the OLD gen,
    re-crosses the threshold, and re-compacts into the same dst dir
    (stale content cleared), ending with every batch exactly once."""
    root = str(tmp_path / "ix")
    batches = [
        _rows(8, range(0, 100)),
        _rows(9, range(1000, 1060)),
        _rows(10, range(2000, 2050)),
    ]
    dfs = [spark.createDataFrame(b, SCHEMA) for b in batches]
    apply_index_batch(spark, root, dfs[0], 0, segments_per_batch=2, first_build_segments=2)
    apply_index_batch(spark, root, dfs[1], 1, segments_per_batch=2, compact_at=4, target_segments=2)
    assert os.path.basename(current_index_dir(root)) == "gen-00001"
    # simulate: the flip never landed (roll CURRENT back to gen-00000);
    # _applied already says batch 1 (mark-before-flip ordering)
    with open(os.path.join(root, "CURRENT"), "w") as f:
        f.write("gen-00000")
    apply_index_batch(spark, root, dfs[2], 2, segments_per_batch=2, compact_at=4, target_segments=2)
    cur = current_index_dir(root)
    assert os.path.basename(cur) == "gen-00001"
    m = read_manifest(cur)
    assert m.n_docs == 210  # 100 + 60 + 50, each exactly once
    # replica: all three batches through the batch API, compacted
    rep0, rep1 = str(tmp_path / "rep0"), str(tmp_path / "rep1")
    build_index(spark, dfs[0], rep0, n_segments=2)
    append_index(spark, dfs[1], rep0, n_new_segments=2)
    append_index(spark, dfs[2], rep0, n_new_segments=2)
    compact_index(spark, rep0, rep1, target_segments=2)
    assert _topk(spark, cur) == _topk(spark, rep1)


def test_compact_rejects_src_as_dst(spark, tmp_path):
    import pytest

    src = str(tmp_path / "src")
    build_index(spark, spark.createDataFrame(_rows(11, range(20)), SCHEMA), src, n_segments=2)
    with pytest.raises(ValueError, match="differ"):
        compact_index(spark, src, src)


def test_empty_first_batch_skipped_then_builds(spark, tmp_path):
    """An EMPTY first micro-batch (restart / no-data trigger) must not
    found the store — and must not crash-loop the stream; the first
    NON-empty batch builds generation 0."""
    root = str(tmp_path / "ix")
    empty = spark.createDataFrame([], SCHEMA)
    assert apply_index_batch(spark, root, empty, 0, segments_per_batch=2) is None
    assert current_index_dir(root) is None
    b1 = spark.createDataFrame(_rows(12, range(0, 50)), SCHEMA)
    cur = apply_index_batch(spark, root, b1, 1, segments_per_batch=2)
    assert os.path.basename(cur) == "gen-00000"
    assert read_manifest(cur).n_docs == 50


def test_replayed_batch_is_noop(spark, tmp_path):
    root = str(tmp_path / "ix")
    b0 = spark.createDataFrame(_rows(4, range(0, 60)), SCHEMA)
    b1 = spark.createDataFrame(_rows(5, range(1000, 1040)), SCHEMA)
    apply_index_batch(spark, root, b0, 0, segments_per_batch=2)
    apply_index_batch(spark, root, b1, 1, segments_per_batch=2)
    m = read_manifest(current_index_dir(root))
    assert m.n_segments == 4 and m.n_docs == 100
    before = _topk(spark, current_index_dir(root))
    # the checkpoint commit was lost: batch 1 is delivered again
    apply_index_batch(spark, root, b1, 1, segments_per_batch=2)
    m2 = read_manifest(current_index_dir(root))
    assert m2.n_segments == 4 and m2.n_docs == 100
    assert _topk(spark, current_index_dir(root)) == before
