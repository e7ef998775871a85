"""Ingestion fuzz: random corrupted NDJSON / batch / single bodies — no
exceptions, parse_error flags where docs are unusable, good slots survive."""
import json, random, string, sys, time
import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from elasticsearch_batch_percolator_spark.sources.json_source import (
    parse_ndjson, parse_batch_body, parse_single_body)
from elasticsearch_batch_percolator_spark.session import get_spark

spark = get_spark("ebp-soak-nd", cores=8)
spark.sparkContext.setLogLevel("ERROR")
base = random.Random(99)
t0 = time.time()

def rand_junk(rng):
    k = rng.randrange(6)
    if k == 0: return ""
    if k == 1: return "".join(rng.choices(string.printable, k=rng.randint(1, 60)))
    if k == 2: return '{"slot": ' + str(rng.randint(0, 9))          # truncated
    if k == 3: return '{"slot": null, "doc": {"content": "x"}}'     # null slot
    if k == 4: return json.dumps({"slot": rng.randint(0, 99), "doc": None})
    return json.dumps({"slot": rng.randint(0, 99), "doc": {"doc_id": rng.randint(0, 9)}})  # no content

for it in range(6):
    seed = base.randrange(1 << 63)
    rng = random.Random(seed)
    lines, good = [], {}
    slot = 0
    for _ in range(200):
        if rng.random() < 0.55:
            c = " ".join(rng.choices(list("abcdef"), k=rng.randint(1, 6)))
            lines.append(json.dumps({"slot": slot, "action": rng.choice(["percolate", None]),
                                     "doc": {"doc_id": slot, "content": c}}))
            good[slot] = c
            slot += 1
        else:
            lines.append(rand_junk(rng))
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    out = parse_ndjson(spark, df).collect()   # must not raise
    got_good = {r["slot"]: r["content"] for r in out if not r["parse_error"]}
    assert got_good == good, f"seed {seed}: good slots mangled: {len(got_good)} vs {len(good)}"
    n_err = sum(1 for r in out if r["parse_error"])
    assert n_err > 0
    print(f"it{it} seed={seed}: ok good={len(good)} flagged={n_err} [{time.time()-t0:.0f}s]", flush=True)

# batch/single bodies: random junk strings must not raise
rng = random.Random(7)
bodies = [rand_junk(rng) for _ in range(50)] + [
    '{"docs": [{"doc_id": 1, "content": "a b"}, {"bogus": 1}]}',
    '{"doc": {"doc_id": 2, "content": "c"} , "size": "NaN"}',
    '[]', '{"docs": "notalist"}', '\x00\x01', '{"docs": []}',
]
bdf = spark.createDataFrame([(b,) for b in bodies], "body string")
n1 = parse_batch_body(bdf).count()
n2 = parse_single_body(bdf).count()
print(f"batch/single fuzz: no exceptions (rows {n1}/{n2})")
print("PASS")
spark.stop()
