"""Posting-list block codec: docID-delta + varint, block-max metadata.

The reference leaves storage to Lucene segments (RAMDirectory,
RamDirectoryPercolatorIndex.java:50-66); this engine persists its own
segment layout (north_rule: "docID-delta + varint/FOR compressed blocks with
block-max metadata").

Block layout (BLOCK = 128 postings, Lucene's block size):
- doc_bytes : varint(delta(doc_id)) — first delta is vs. the block's base
- tf_bytes  : varint(tf)
- norm_bytes: float64 LE of the BM25 tf-norm  tf*(k1+1)/(tf+k1*(1-b+b*dl/avgdl))
              (precomputed at build — avgdl is fixed per index build — so
              scoring a block is score = idf * norm, no dl lookup)
- max_doc   : last doc_id of the block (skip pointer)
- max_norm  : max norm in the block (block-max WAND upper bound: idf*max_norm)

Pure-numpy vectorized encode/decode — this code runs inside Arrow pandas
UDFs on executors (no per-row Python at the DataFrame level, input_hint).
"""

from __future__ import annotations

import numpy as np

BLOCK = 128
_U64 = np.uint64


def varint_encode_lens(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """LEB128 varint for a uint64 array, vectorized.

    Returns ``(buf uint8[], nbytes int64[])`` — the encoded stream plus the
    per-value byte length, so a caller encoding a WHOLE segment in one pass
    can slice per-block byte ranges with an offset cumsum instead of calling
    the encoder once per tiny block (the per-call fixed cost dominates at
    df≈1-5 terms).
    """
    v = values.astype(np.uint64, copy=True)
    n = len(v)
    if n == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    # byte length per value: ceil(bitlen/7), min 1
    nbytes = np.ones(n, dtype=np.int64)
    tmp = v >> _U64(7)
    while tmp.any():
        nbytes += (tmp > 0).astype(np.int64)
        tmp >>= _U64(7)
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    pos = np.concatenate([[0], np.cumsum(nbytes)[:-1]])
    rem = v.copy()
    max_len = int(nbytes.max())
    for i in range(max_len):
        mask = nbytes > i
        idx = pos[mask] + i
        byte = (rem[mask] & _U64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] - 1 > i).astype(np.uint8) << 7
        out[idx] = byte | cont
        rem[mask] >>= _U64(7)
    return out, nbytes


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128 varint for a uint64 array, vectorized."""
    buf, _ = varint_encode_lens(values)
    return buf.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Inverse of varint_encode, vectorized (values <= 10 bytes each)."""
    if not buf:
        return np.empty(0, dtype=np.uint64)
    arr = np.frombuffer(buf, dtype=np.uint8)
    ends = np.flatnonzero(arr < 128)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    n = len(ends)
    out = np.zeros(n, dtype=np.uint64)
    max_len = int(lengths.max())
    for i in range(max_len):
        mask = lengths > i
        byte = arr[starts[mask] + i].astype(np.uint64)
        out[mask] |= (byte & _U64(0x7F)) << _U64(7 * i)
    return out


def encode_positions(positions_flat: np.ndarray, tfs: np.ndarray) -> bytes:
    """Within-doc token positions, concatenated per posting, delta+varint.

    ``positions_flat`` holds each posting's ascending positions back to
    back; ``tfs`` gives each posting's count. Deltas reset at every posting
    boundary (the first value of a posting is absolute).
    """
    p = np.asarray(positions_flat, dtype=np.int64)
    if len(p) == 0:
        return b""
    deltas = p.copy()
    deltas[1:] -= p[:-1]
    starts = np.concatenate([[0], np.cumsum(tfs)[:-1]]).astype(np.int64)
    deltas[starts] = p[starts]
    return varint_encode(deltas.astype(np.uint64))


def decode_positions(buf: bytes, tfs: np.ndarray) -> np.ndarray:
    """Inverse of encode_positions → flat positions (split with cumsum(tfs))."""
    vals = varint_decode(buf).astype(np.int64)
    if len(vals) == 0:
        return vals
    c = np.cumsum(vals)
    ends = np.cumsum(np.asarray(tfs, dtype=np.int64))
    offsets = np.concatenate([[0], c[ends[:-1] - 1]])
    return c - np.repeat(offsets, tfs)


def encode_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    norms: np.ndarray,
    block: int = BLOCK,
    positions_flat: np.ndarray | None = None,
) -> list[dict]:
    """Sorted postings → list of block dicts (one term, one segment).

    ``positions_flat``: optional concatenated per-posting positions aligned
    with doc_ids order (caller must pre-sort when providing positions).
    """
    order = np.argsort(doc_ids, kind="stable")
    if positions_flat is not None and not np.array_equal(order, np.arange(len(doc_ids))):
        raise ValueError("positions require pre-sorted postings")
    doc_ids = np.asarray(doc_ids, dtype=np.int64)[order]
    tfs = np.asarray(tfs, dtype=np.int64)[order]
    norms = np.asarray(norms, dtype=np.float64)[order]
    pos_bounds = None
    if positions_flat is not None:
        pos_bounds = np.concatenate([[0], np.cumsum(tfs)]).astype(np.int64)
    blocks = []
    for s in range(0, len(doc_ids), block):
        d = doc_ids[s : s + block]
        t = tfs[s : s + block]
        deltas = np.empty(len(d), dtype=np.uint64)
        deltas[0] = d[0]  # base-absolute first value
        deltas[1:] = np.diff(d).astype(np.uint64)
        blk = {
            "max_doc": int(d[-1]),
            "max_norm": float(norms[s : s + block].max()),
            "n": int(len(d)),
            "doc_bytes": varint_encode(deltas),
            "tf_bytes": varint_encode(t.astype(np.uint64)),
            "norm_bytes": norms[s : s + block].tobytes(),
            "pos_bytes": None,
        }
        if positions_flat is not None:
            lo, hi = pos_bounds[s], pos_bounds[min(s + block, len(doc_ids))]
            blk["pos_bytes"] = encode_positions(positions_flat[lo:hi], t)
        blocks.append(blk)
    return blocks


def decode_block(b) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """block (dict or Row) → (doc_ids int64, tfs int64, norms float64)."""
    doc_bytes = b["doc_bytes"] if not hasattr(b, "doc_bytes") else b.doc_bytes
    tf_bytes = b["tf_bytes"] if not hasattr(b, "tf_bytes") else b.tf_bytes
    norm_bytes = b["norm_bytes"] if not hasattr(b, "norm_bytes") else b.norm_bytes
    deltas = varint_decode(bytes(doc_bytes)).astype(np.int64)
    doc_ids = np.cumsum(deltas)
    tfs = varint_decode(bytes(tf_bytes)).astype(np.int64)
    norms = np.frombuffer(bytes(norm_bytes), dtype=np.float64)
    return doc_ids, tfs, norms
