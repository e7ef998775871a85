"""Codec fuzz: varint + positions + postings round-trip at adversarial
shapes (64-bit boundaries, single-element, giant gaps, max tfs, block=1)."""
import random, sys
import numpy as np
import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from elasticsearch_batch_percolator_spark.index.codec import (
    varint_encode, varint_decode, varint_encode_lens,
    encode_positions, decode_positions, encode_postings, decode_block)

rng = np.random.default_rng(20260820)
# varint: boundary values
edge = np.array([0, 1, 127, 128, 16383, 16384, 2**21 - 1, 2**21, 2**28 - 1,
                 2**28, 2**35, 2**42, 2**49, 2**56, 2**62, 2**63 - 1,
                 2**63, 2**64 - 1], dtype=np.uint64)
assert np.array_equal(varint_decode(varint_encode(edge)), edge)
for trial in range(300):
    n = int(rng.integers(0, 2000))
    bits = int(rng.integers(1, 64))
    vals = rng.integers(0, 1 << bits, size=n, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(vals)), vals), f"varint trial {trial}"
    buf, lens = varint_encode_lens(vals)
    assert bytes(buf) == varint_encode(vals)
    # per-value lens must sum to stream length
    assert lens.sum() == len(buf)
print("varint: PASS (300 trials + 64-bit edges)")

for trial in range(200):
    n = int(rng.integers(1, 300))
    tfs = rng.integers(1, 30, size=n).astype(np.int64)
    pos = np.concatenate([np.sort(rng.choice(10_000, size=t, replace=False)) for t in tfs]).astype(np.int64)
    got = decode_positions(encode_positions(pos, tfs), tfs)
    assert np.array_equal(got, pos), f"positions trial {trial}"
print("positions: PASS (200 trials)")

for trial in range(200):
    n = int(rng.integers(1, 1000))
    space = int(rng.integers(n, max(n + 1, 2**int(rng.integers(10, 40)))))
    doc_ids = np.sort(rng.choice(space, size=n, replace=False)).astype(np.int64)
    if trial % 7 == 0:
        doc_ids += (2**55 - space - 2)  # giant absolute ids
    tfs = rng.integers(1, 255, size=n).astype(np.int64)
    norms = rng.uniform(1e-9, 1e6, size=n)
    block = int(rng.choice([1, 2, 32, 128, 4096]))
    blocks = encode_postings(doc_ids, tfs, norms, block=block)
    rd, rt, rn = [], [], []
    for b in blocks:
        d, t, nr = decode_block(b)
        rd.append(d); rt.append(t); rn.append(nr)
        assert b["max_doc"] == int(d[-1])
        assert abs(b["max_norm"] - nr.max()) < 1e-12
    assert np.array_equal(np.concatenate(rd), doc_ids), f"postings trial {trial}"
    assert np.array_equal(np.concatenate(rt), tfs)
    assert np.allclose(np.concatenate(rn), norms, rtol=0, atol=0)
print("postings: PASS (200 trials incl. 2^55 ids, block=1)")
