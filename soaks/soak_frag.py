"""Long-text fragmenter property soak: random long docs, random specs
(fragment_size 20-80, number_of_fragments 1-4, order none/score, ws/code
analyzers). Properties:
P1 each fragment, tags stripped, is a CONTIGUOUS space-joined unit span
   of the original text;
P2 a unit inside a fragment is tagged IFF the unit matches the query's
   highlight terms (per analyzer);
P3 fragments don't overlap and respect number_of_fragments;
P4 order=none -> fragments in position order; order=score -> tag counts
   non-increasing;
P5 every fragment has >=1 tagged unit."""
import random, re, sys, time
import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from elasticsearch_batch_percolator_spark.operators.percolate import percolate
from elasticsearch_batch_percolator_spark.plans.eval_py import wildcard_regex
from elasticsearch_batch_percolator_spark.sources.registry import CompiledRegistry
from elasticsearch_batch_percolator_spark.session import get_spark

spark = get_spark("ebp-soak-fr", cores=8)
spark.sparkContext.setLogLevel("ERROR")
W = ["alpha", "Beta", "GAMMA", "delta_x", "ePsil.on", "zeta9", "Eta", "THETA"]
base = random.Random(515151)
t0 = time.time()
for it in range(6):
    seed = base.randrange(1 << 63)
    rng = random.Random(seed)
    analyzer = rng.choice(["ws", "code"])
    qs, meta = {}, {}
    for j in range(20):
        if rng.random() < 0.6:
            term = rng.choice(W).lower()
            if analyzer == "code":
                term = re.split(r"[^a-z0-9_]+", term)[0]
            q = {"term": {"f": term}}
            atoms = [("t", term)]
        else:
            pat = rng.choice(["alp*", "?eta", "z*9", "*lta*"])
            q = {"wildcard": {"f": pat}}
            atoms = [("w", pat)]
        spec = {"fields": ["f"],
                "fragment_size": rng.randint(20, 80),
                "number_of_fragments": rng.randint(1, 4),
                "order": rng.choice(["none", "score"])}
        qs[f"q{j}"] = {"query": q, "highlight": spec}
        meta[f"q{j}"] = (atoms, spec)
    reg = CompiledRegistry.from_rows(list(qs.items()))
    docs = []
    for i in range(50):
        n = rng.randint(40, 150)
        us = [rng.choice(W) if rng.random() < 0.25 else f"fill{i}x{j}"
              for j in range(n)]
        docs.append((i, " ".join(us)))
    df = spark.createDataFrame(docs, "doc_id long, f string")
    res = percolate(spark, df, reg, fields={"f": ("f", analyzer)})
    rows = res.with_highlights(reg).collect()
    res.unpersist()

    def unit_hit(unit, atoms):
        def m(u):
            for k, v in atoms:
                if (u == v) if k == "t" else re.fullmatch(wildcard_regex(v), u):
                    return True
            return False
        low = unit.lower()
        if m(low):
            return True
        if analyzer == "code":
            return any(s and m(s) for s in re.split(r"[^a-z0-9_]+", low))
        return False

    checked = 0
    for r in rows:
        hl = dict(r["highlights"] or {})
        if "f" not in hl:
            continue
        atoms, spec = meta[r["query_id"]]
        text = docs[int(r["doc_id"])][1]
        units = text.split(" ")
        frags = list(hl["f"])
        assert len(frags) <= spec["number_of_fragments"], f"seed {seed}: frag cap"
        spans, counts = [], []
        for fr in frags:
            stripped = fr.replace("<b>", "").replace("</b>", "")
            fu = stripped.split(" ")
            # P1: contiguous span
            pos = [i for i in range(len(units) - len(fu) + 1) if units[i:i+len(fu)] == fu]
            assert pos, f"seed {seed} q={r['query_id']}: fragment not a span: {fr!r}"
            lo = pos[0]
            spans.append((lo, lo + len(fu) - 1) if len(pos) == 1 else None)
            # P2 + P5
            tagged = [u.startswith("<b>") for u in fr.split(" ")]
            nt = 0
            for off, u in enumerate(fu):
                want = unit_hit(u, atoms)
                gotb = fr.split(" ")[off].startswith("<b>") and fr.split(" ")[off].endswith("</b>")
                assert gotb == want, f"seed {seed} q={r['query_id']} unit {u!r}: tagged={gotb} want={want} frag={fr!r}"
                nt += want
            assert nt >= 1, f"seed {seed}: fragment with no hit {fr!r}"
            counts.append(nt)
        # P3/P4 only when every span is unambiguous
        if all(s is not None for s in spans):
            for (a1, b1), (a2, b2) in zip(sorted(spans), sorted(spans)[1:]):
                assert b1 < a2, f"seed {seed}: overlapping fragments {spans}"
            if spec["order"] == "none":
                assert spans == sorted(spans), f"seed {seed}: not position-ordered"
        if spec["order"] == "score":
            assert counts == sorted(counts, reverse=True), f"seed {seed}: not score-ordered {counts}"
        checked += 1
    assert checked > 50, f"seed {seed}: only {checked} highlighted rows"
    print(f"it{it} seed={seed} analyzer={analyzer}: ok checked={checked} [{time.time()-t0:.0f}s]", flush=True)
print("PASS")
spark.stop()
