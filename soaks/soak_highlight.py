"""Highlight soak vs an independent model of the DOCUMENTED fragmenter on
short ws-analyzed texts (< fragment_size -> one whole-field fragment):
random term/wildcard/bool queries with random specs (tags, rfm, override)."""
import random, re, sys, time
import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from elasticsearch_batch_percolator_spark.operators.percolate import percolate
from elasticsearch_batch_percolator_spark.plans.eval_py import eval_plan, wildcard_regex
from elasticsearch_batch_percolator_spark.sources.registry import CompiledRegistry
from elasticsearch_batch_percolator_spark.session import get_spark

spark = get_spark("ebp-soak-hl", cores=8)
spark.sparkContext.setLogLevel("ERROR")
VOCAB = ["Fox", "dog", "Cat", "bird", "ant", "bee", "owl", "elk"]
base = random.Random(int(os.environ.get("META_SEED", "8080")))
t0 = time.time()

def leaf(rng, f):
    if rng.random() < 0.3:
        return {"wildcard": {f: rng.choice(["f*", "?og", "c*t", "b*"])}}
    return {"term": {f: rng.choice(VOCAB).lower()}}

for it in range(6):
    seed = base.randrange(1 << 63)
    rng = random.Random(seed)
    qs = {}
    specs = {}
    for j in range(25):
        f = rng.choice(["f1", "f2"])
        q = leaf(rng, f) if rng.random() < 0.6 else {
            "bool": {"must": [leaf(rng, "f1"), leaf(rng, "f2")]}}
        spec = {"fields": rng.sample(["f1", "f2"], rng.randint(1, 2)),
                "pre_tags": [rng.choice(["<b>", "<em>", "["])],
                "post_tags": [rng.choice(["</b>", "</em>", "]"])],
                "require_field_match": rng.random() < 0.5}
        if rng.random() < 0.2:
            spec["highlight_query"] = leaf(rng, rng.choice(["f1", "f2"]))
        qs[f"q{j}"] = {"query": q, "highlight": spec}
        specs[f"q{j}"] = (q, spec)
    reg = CompiledRegistry.from_rows(list(qs.items()))
    docs = [(i, " ".join(rng.choices(VOCAB, k=rng.randint(1, 7))),
                " ".join(rng.choices(VOCAB, k=rng.randint(1, 7)))) for i in range(80)]
    df = spark.createDataFrame(docs, "doc_id long, f1 string, f2 string")
    res = percolate(spark, df, reg, fields={"f1": ("f1", "ws"), "f2": ("f2", "ws")})
    got = {(int(r["doc_id"]), r["query_id"]): r["highlights"]
           for r in res.with_highlights(reg).collect()}
    res.unpersist()

    def positive_pairs(q):
        if "term" in q:
            return [(list(q["term"])[0], ("t", list(q["term"].values())[0]))]
        if "wildcard" in q:
            return [(list(q["wildcard"])[0], ("w", list(q["wildcard"].values())[0]))]
        out = []
        for c in q.get("bool", {}).get("must", []):
            out += positive_pairs(c)
        return out

    def unit_matches(unit, kind, val):
        u = unit.lower()
        if kind == "t":
            return u == val
        return re.fullmatch(wildcard_regex(val), u) is not None

    n_checked = 0
    for (i, qid), hl in got.items():
        q, spec = specs[qid]
        hq = spec.get("highlight_query", q)
        pairs = positive_pairs(hq)
        frow = docs[i]
        exp = {}
        for fld in spec["fields"]:
            text = frow[1] if fld == "f1" else frow[2]
            terms = [(k, v) for qf, (k, v) in pairs
                     if (qf == fld if spec["require_field_match"] else True)]
            units = text.split()
            if not any(unit_matches(u, k, v) for u in units for k, v in terms):
                continue
            frag = " ".join(
                spec["pre_tags"][0] + u + spec["post_tags"][0]
                if any(unit_matches(u, k, v) for k, v in terms) else u
                for u in units)
            exp[fld] = [frag]
        assert dict(hl or {}) == {k: list(v) for k, v in exp.items()}, (
            f"seed {seed} doc {i} {qid}: got {hl} want {exp} (spec {spec}, q {q})")
        n_checked += 1
    assert n_checked > 100
    print(f"it{it} seed={seed}: ok checked={n_checked} [{time.time()-t0:.0f}s]", flush=True)
print("PASS")
spark.stop()
