"""multi_percolate fuzz: random batches/slots, random get_id resolution
(incl. duplicate corpus ids and missing ids), parse errors, counts,
track_scores+size — vs a python model built on eval_plan."""
import random, sys, time
import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from elasticsearch_batch_percolator_spark.streaming.percolate_stream import multi_percolate
from elasticsearch_batch_percolator_spark.plans.eval_py import eval_plan
from elasticsearch_batch_percolator_spark.sources.registry import CompiledRegistry
from elasticsearch_batch_percolator_spark.session import get_spark

spark = get_spark("ebp-soak-slot", cores=8)
spark.sparkContext.setLogLevel("ERROR")
vocab = list("abcdefgh")
base = random.Random(int(os.environ.get("META_SEED", "5353")))
t0 = time.time()
for it in range(6):
    seed = base.randrange(1 << 63)
    rng = random.Random(seed)
    qs = {}
    for j in range(30):
        if j % 3 == 0:
            qs[f"q{j}"] = {"term": {"content": rng.choice(vocab)}}
        elif j % 3 == 1:
            qs[f"q{j}"] = {"bool": {"must": [{"term": {"content": rng.choice(vocab)}}],
                                     "must_not": [{"term": {"content": rng.choice(vocab)}}]}}
        else:
            qs[f"q{j}"] = {"phrase": {"field": "content",
                                      "terms": [rng.choice(vocab), rng.choice(vocab)]}}
    reg = CompiledRegistry.from_rows(list(qs.items()))
    corpus_rows = [(f"c{i}", " ".join(rng.choices(vocab, k=rng.randint(1, 8)))) for i in range(200)]
    # duplicate corpus ids (dedup contract) — duplicates carry DIFFERENT content;
    # the model accepts either resolution
    dup_ids = {f"c{rng.randrange(200)}" for _ in range(10)}
    corpus_rows += [(d, " ".join(rng.choices(vocab, k=3))) for d in dup_ids]
    corpus = spark.createDataFrame(corpus_rows, "doc_id string, content string")
    slots, model = [], {}
    for b in range(3):
        for s in range(60):
            action = rng.choice(["percolate", "count"])
            kind = rng.random()
            if kind < 0.5:
                c = " ".join(rng.choices(vocab, k=rng.randint(1, 8)))
                slots.append((b, s, action, c, None, False))
                model[(b, s)] = ("ok", c, action)
            elif kind < 0.75:
                gid = f"c{rng.randrange(250)}"  # may miss (>=200 -> absent)
                slots.append((b, s, action, None, gid, False))
                present = [cc for d, cc in corpus_rows if d == gid]
                model[(b, s)] = ("ok", present, action) if present else ("err", None, action)
            else:
                slots.append((b, s, action, None if rng.random() < 0.5 else "x", None,
                              True))  # parse_error flagged
                model[(b, s)] = ("err", None, action)
    bdf = spark.createDataFrame(
        slots, "batch_id long, slot long, action string, content string, get_id string, parse_error boolean")
    out = {(r["batch_id"], r["slot"]): r for r in multi_percolate(
        spark, bdf, reg, corpus=corpus, track_scores=True, size=5).collect()}
    assert set(out) == set(model), f"seed {seed}: slot coverage"
    for key, (st, c, action) in model.items():
        r = out[key]
        if st == "err":
            assert r["error"] == "_parse_error_", f"seed {seed} {key}: expected error row, got {r}"
            continue
        assert r["error"] is None, f"seed {seed} {key}: unexpected error {r['error']}"
        contents = c if isinstance(c, list) else [c]
        ok_any = False
        for cc in contents:
            toks = cc.split()
            exp_q = sorted(q for q in qs if eval_plan(reg.queries[q].plan, {"content": toks}))
            if action == "count":
                ok = r["n_matches"] == len(exp_q)
            else:
                got_q = sorted(r["matched_queries"]) if r["matched_queries"] is not None else []
                ok = (set(got_q) <= set(exp_q) and len(got_q) == min(5, len(exp_q))
                      if len(exp_q) > 5 else sorted(got_q) == exp_q)
                ok = ok and r["n_matches"] == len(exp_q)
                if r["scores"] is not None and len(r["scores"]) > 1:
                    ok = ok and all(r["scores"][i] >= r["scores"][i+1] for i in range(len(r["scores"])-1))
                ok = ok and (r["matched_queries"] is None or len(r["matched_queries"]) <= 5)
            if ok:
                ok_any = True
                break
        assert ok_any, f"seed {seed} {key} action={action}: got {r} want one of {contents}"
    print(f"it{it} seed={seed}: ok 180 slots [{time.time()-t0:.0f}s]", flush=True)
print("PASS")
spark.stop()
