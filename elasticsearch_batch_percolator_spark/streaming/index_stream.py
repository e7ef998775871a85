"""Streaming index ingest: micro-batches build, append, and compact a
persisted inverted index (north_rule: the 10^12-file corpus arrives
incrementally; the reference's shards do this inside Lucene — segment add
on index, background merges — RamDirectoryPercolatorIndex.java:50-66 is
its per-batch index, this module is the durable cross-batch analog).

Layout under ``root``::

    root/CURRENT          name of the active generation ("gen-00000")
    root/_applied         last successfully applied micro-batch id
    root/gen-00000/       a complete index dir (build_index layout)
    root/gen-00001/       the next generation, written by compaction

Semantics:
- batch 0 ``build_index``s generation 0; later batches ``append_index``
  into the CURRENT generation (scoring stats frozen at generation
  creation — the Lucene segment-add contract documented there).
- when the generation's segment count reaches ``compact_at``, the batch
  that crossed it ``compact_index``es into a NEW generation dir and
  flips CURRENT atomically (os.replace) — readers resolving via
  ``current_index_dir`` see either the old complete index or the new
  complete index, never a partial one. Old generations are retained
  (a reader may still hold one); ``prune_generations`` deletes all but
  CURRENT once readers have moved on.
- replay-safe: Structured Streaming re-delivers a micro-batch whose
  foreachBatch succeeded but whose checkpoint commit didn't. ``_applied``
  records the last applied batch id (written atomically AFTER the index
  mutation); a replayed batch id <= it is a no-op. A batch that failed
  MID-append re-runs cleanly because append_index only bumps the
  manifest after its segment writes land (deterministic ids, dynamic
  partition overwrite).

Caller contract: the stream carries (doc_id long, tokens array<string>)
with doc_ids globally unique across batches (append_index's contract).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from ..index.build import append_index, build_index, compact_index, read_manifest

_GEN = "gen-%05d"


def current_index_dir(root: str) -> str | None:
    """The active generation's index dir, or None before the first batch."""
    p = os.path.join(root, "CURRENT")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return os.path.join(root, f.read().strip())


def _flip_current(root: str, gen_name: str) -> None:
    tmp = os.path.join(root, "CURRENT.tmp")
    with open(tmp, "w") as f:
        f.write(gen_name)
    os.replace(tmp, os.path.join(root, "CURRENT"))


def _applied_batch(root: str) -> int:
    p = os.path.join(root, "_applied")
    if not os.path.exists(p):
        return -1
    with open(p) as f:
        return int(f.read().strip())


def _mark_applied(root: str, batch_id: int) -> None:
    tmp = os.path.join(root, "_applied.tmp")
    with open(tmp, "w") as f:
        f.write(str(batch_id))
    os.replace(tmp, os.path.join(root, "_applied"))


def prune_generations(root: str) -> list[str]:
    """Delete every generation dir except CURRENT; returns what was removed
    (call once readers have re-resolved — generations are immutable, so
    'old' can never become active again)."""
    cur = current_index_dir(root)
    removed = []
    for name in sorted(os.listdir(root)):
        p = os.path.join(root, name)
        if name.startswith("gen-") and os.path.isdir(p) and p != cur:
            shutil.rmtree(p)
            removed.append(name)
    return removed


def _batch_in_manifest(cur: str, marker: str) -> bool:
    """True when this generation already carries the batch — the marker is
    recorded in the SAME manifest.save as the segment bump (build's
    input_lineage / append's per-append lineage), so this check is atomic
    with the index mutation in a way the _applied file cannot be."""
    m = read_manifest(cur)
    if m is None:
        return False
    if m.input_lineage == marker:
        return True
    return any(
        a.get("lineage") == marker
        for a in (m.stage_metrics or {}).get("appends", [])
    )


def apply_index_batch(
    spark: SparkSession,
    root: str,
    batch_df: DataFrame,
    batch_id: int,
    *,
    segments_per_batch: int = 8,
    first_build_segments: int | None = None,
    compact_at: int | None = None,
    target_segments: int | None = None,
    positions: bool = False,
) -> str | None:
    """Apply ONE micro-batch to the generation store (the foreachBatch
    body, exposed for direct use and replay testing). Returns the active
    generation dir after the batch.

    Exactly-once under crash replay: the `_applied` marker is the fast
    path, but a crash can land between the index mutation and ANY
    side-file write — so the decisive dedup is the batch marker stored
    inside the generation manifest (one atomic save with the segment
    bump), and the operation ORDER per path closes the remaining windows:

    - build: build (itself resumable on a deterministic dir) → flip →
      mark. A crash before the flip resumes the build as a no-op; after
      the flip, the replay sees the marker as the gen's input_lineage.
    - append: the replay finds the marker in the manifest's appends and
      skips; a crash MID-append never bumped the manifest, so the re-run
      overwrites the same deterministic segment ids.
    - compact: append → compact → mark → flip. Mark-before-flip means a
      flip that never happened leaves an orphan dst generation; the NEXT
      batch re-crosses the threshold and re-compacts into that same dir
      (compact_index clears a stale dst first), converging with all data.
      Flip-before-mark would instead re-append the batch into the freshly
      compacted generation, duplicating it — compaction rewrites
      input_lineage, losing the marker.

    Batch ids come from ONE streaming checkpoint: restarting a stream
    against an existing root with a FRESH checkpoint resets ids to 0 and
    breaks the dedup (the standard Structured Streaming idempotent-sink
    contract — foreachBatch exactly-once always keys on batchId).
    """
    os.makedirs(root, exist_ok=True)
    if batch_id <= _applied_batch(root):
        return current_index_dir(root)  # replayed micro-batch: no-op
    marker = f"stream batch {batch_id}"
    cur = current_index_dir(root)
    # the batch feeds 2-4 actions (count, quantile cuts, encode/write);
    # un-persisted, each would re-read the micro-batch from the source
    batch_df = batch_df.persist()
    try:
        if cur is None:
            if batch_df.limit(1).count() == 0:
                # an EMPTY first micro-batch (restart / no-data trigger)
                # must not found the store: build_index on zero rows has
                # no postings to write and would crash-loop the query
                _mark_applied(root, batch_id)
                return None
            gen = _GEN % 0
            build_index(
                spark, batch_df, os.path.join(root, gen),
                n_segments=first_build_segments or segments_per_batch,
                positions=positions, lineage=marker,
            )
            cur = os.path.join(root, gen)
            _flip_current(root, gen)
            _mark_applied(root, batch_id)
            return cur
        if not _batch_in_manifest(cur, marker):
            append_index(
                spark, batch_df, cur,
                n_new_segments=segments_per_batch,
                lineage=marker,
            )
        m = read_manifest(cur)
        if compact_at and m.n_segments >= compact_at:
            gen_i = int(os.path.basename(cur).split("-")[1]) + 1
            gen = _GEN % gen_i
            compact_index(
                spark, cur, os.path.join(root, gen),
                target_segments=target_segments or max(1, compact_at // 2),
            )
            _mark_applied(root, batch_id)
            _flip_current(root, gen)
            return os.path.join(root, gen)
        _mark_applied(root, batch_id)
        return cur
    finally:
        batch_df.unpersist()


def index_stream(
    spark: SparkSession,
    stream: DataFrame,
    root: str,
    checkpoint: str,
    *,
    segments_per_batch: int = 8,
    first_build_segments: int | None = None,
    compact_at: int | None = None,
    target_segments: int | None = None,
    positions: bool = False,
):
    """Start the ingest: each micro-batch of (doc_id, tokens) rows joins
    the persisted index (build → append → threshold compaction), queryable
    at any time via ``topk_from_index(spark, current_index_dir(root), ...)``.
    Returns the StreamingQuery."""

    def _each(batch_df: DataFrame, batch_id: int) -> None:
        apply_index_batch(
            spark, root, batch_df, int(batch_id),
            segments_per_batch=segments_per_batch,
            first_build_segments=first_build_segments,
            compact_at=compact_at,
            target_segments=target_segments,
            positions=positions,
        )

    return (
        stream.writeStream.foreachBatch(_each)
        .option("checkpointLocation", checkpoint)
        .start()
    )
