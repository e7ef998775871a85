"""Index-side phrase matching over positional postings.

When the index is built with ``positions=True``, phrases run directly
against the compressed postings — no re-tokenization of documents: decode
the phrase terms' postings per segment, intersect doc lists, verify
adjacency with numpy set membership (pos(t_{i+1}) == pos(t_i) + 1), exactly
Lucene's PhraseQuery contract the reference approximates two-phase
(LimitingFilterFactory.phraseFilter:177-192 = the AND pre-filter; this is
the exact phase).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..index.build import read_manifest, read_postings
from ..index.codec import decode_block, decode_positions


def _decode_with_positions(blocks) -> tuple[np.ndarray, list[np.ndarray]]:
    """term blocks → (doc_ids, per-doc position arrays)."""
    all_docs, all_pos = [], []
    for blk in blocks:
        doc_ids, tfs, _ = decode_block(blk)
        pos_bytes = blk["pos_bytes"] if not hasattr(blk, "pos_bytes") else blk.pos_bytes
        if pos_bytes is None:
            raise ValueError("index was built without positions=True")
        flat = decode_positions(bytes(pos_bytes), tfs)
        bounds = np.concatenate([[0], np.cumsum(tfs)]).astype(np.int64)
        all_docs.append(doc_ids)
        all_pos.extend(flat[bounds[i] : bounds[i + 1]] for i in range(len(doc_ids)))
    return (np.concatenate(all_docs) if all_docs else np.empty(0, np.int64)), all_pos


def phrase_docs_from_index(
    spark: SparkSession, index_dir: str, terms: list[str]
) -> DataFrame:
    """doc_ids containing ``terms`` at consecutive positions (slop=0).

    A term may be a Lucene wildcard (``*``/``?``): each pattern position
    expands against the index term dictionary (the reference's
    WildcardPhraseQuery — per-position term-set producers,
    WildcardTermsProducer.getTerms:26-53) and the position slot accepts
    ANY of its expansion terms; adjacency chains across the slots'
    position unions."""
    from .wand import _is_pattern, expand_patterns_from_index

    read_manifest(index_dir)  # validates the index exists
    pats = sorted({t for t in terms if _is_pattern(t)})
    exp = expand_patterns_from_index(spark, index_dir, pats) if pats else {}
    # per-position term sets: literal -> {literal}; pattern -> expansions
    slots = [sorted(exp[t]) if _is_pattern(t) else [t] for t in terms]
    if any(not s for s in slots):
        # a pattern matching NOTHING in the index: the phrase can't occur
        return spark.createDataFrame([], "doc_id long")
    flat_terms = sorted({t for s in slots for t in s})
    postings = read_postings(spark, index_dir, flat_terms).select(
        "segment_id", "term", "blocks"
    )

    def per_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
        by_term = {r.term: r.blocks for r in pdf.itertuples()}
        decoded = {
            t: _decode_with_positions(by_term[t])
            for t in flat_terms
            if t in by_term
        }
        # slot i: doc -> union of its expansion terms' position arrays
        slot_pos: list[dict[int, np.ndarray]] = []
        for s in slots:
            dmap: dict[int, np.ndarray] = {}
            for t in s:
                if t not in decoded:
                    continue
                docs_t, pos_t = decoded[t]
                for i, d in enumerate(docs_t.tolist()):
                    prev = dmap.get(d)
                    dmap[d] = pos_t[i] if prev is None else np.union1d(prev, pos_t[i])
            if not dmap:
                return empty  # slot unmatched anywhere in this segment
            slot_pos.append(dmap)
        common = set(slot_pos[0])
        for dmap in slot_pos[1:]:
            common &= set(dmap)
        out = []
        for d in sorted(common):
            # start positions = slot0 positions; the phrase holds if some
            # chain p, p+1, ..., p+k-1 exists across the slots
            cand = slot_pos[0][d]
            for offset, dmap in enumerate(slot_pos[1:], start=1):
                cand = cand[np.isin(cand + offset, dmap[d])]
                if len(cand) == 0:
                    break
            if len(cand) > 0:
                out.append(d)
        return pd.DataFrame({"doc_id": pd.Series(out, dtype="int64")})

    return (
        postings.groupBy("segment_id")
        .applyInPandas(per_segment, "doc_id long")
        .dropDuplicates(["doc_id"])
    )
