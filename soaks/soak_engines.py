"""Three-engine semantic agreement fuzz for the fuzzy/regexp primitives.

The new Fuzzy/Regexp queries rest on a cross-engine contract: Spark's
``levenshtein`` / ``RLIKE`` (Java), python's DP / ``re.fullmatch`` (the
verify lane + eval oracle), and DuckDB's ``levenshtein`` /
``regexp_full_match`` (RE2; the correctness-gate oracle) must agree on
every input the engine can see. The gate entries pin a handful of fixed
patterns; this soak fuzzes the contract: random patterns from the
documented "common core" grammar (literals, ., classes incl. negation,
? * + quantifiers, grouped alternation) x random tokens, and random
string pairs for exact edit-distance equality (not just thresholds).
"""
import os
import random
import re
import sys
import time

_R = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _R)

import duckdb
from pyspark.sql import functions as F

from elasticsearch_batch_percolator_spark.plans.eval_py import within_edits
from elasticsearch_batch_percolator_spark.session import get_spark

spark = get_spark("ebp-soak-engines", cores=8)
spark.sparkContext.setLogLevel("ERROR")
con = duckdb.connect()
ALPH = "abcd"


def rand_atom(rng):
    r = rng.random()
    if r < 0.45:
        return rng.choice(ALPH)
    if r < 0.6:
        return "."
    if r < 0.8:
        chars = "".join(sorted(set(rng.choices(ALPH, k=rng.randint(1, 3)))))
        return f"[{chars}]"
    chars = "".join(sorted(set(rng.choices(ALPH, k=rng.randint(1, 2)))))
    return f"[^{chars}]"


def rand_branch(rng):
    out = []
    for _ in range(rng.randint(1, 4)):
        a = rand_atom(rng)
        if rng.random() < 0.3:
            a += rng.choice("?*+")
        out.append(a)
    return "".join(out)


def rand_pattern(rng):
    branches = [rand_branch(rng) for _ in range(rng.randint(1, 3))]
    return "|".join(branches) if len(branches) > 1 else branches[0]


base = random.Random(int(os.environ.get("META_SEED", "606060")))
t0 = time.time()
N_PAT = int(os.environ.get("N_PAT", "120"))
N_TOK = int(os.environ.get("N_TOK", "400"))
N_PAIRS = int(os.environ.get("N_PAIRS", "30000"))

# --- regexp agreement -----------------------------------------------------
rng = random.Random(base.randrange(1 << 63))
toks = list({
    "".join(rng.choices(ALPH, k=rng.randint(0, 6))) for _ in range(N_TOK)
})
tok_df = spark.createDataFrame([(t,) for t in toks], "tok string")
con.execute("CREATE OR REPLACE TABLE toks AS SELECT * FROM (VALUES "
            + ",".join(f"('{t}')" for t in toks) + ") v(tok)")
bad = 0
for i in range(N_PAT):
    pat = rand_pattern(rng)
    py = {t for t in toks if re.fullmatch(pat, t)}
    anch = "^(?:" + pat + ")$"
    sp = {r[0] for r in tok_df.filter(F.col("tok").rlike(anch)).collect()}
    dk = {r[0] for r in con.execute(
        "SELECT tok FROM toks WHERE regexp_full_match(tok, ?)", [pat]
    ).fetchall()}
    if not (py == sp == dk):
        bad += 1
        print(f"REGEXP MISMATCH pat={pat!r} py-sp={sorted(py ^ sp)[:5]} "
              f"py-dk={sorted(py ^ dk)[:5]}")
print(f"regexp: {N_PAT} patterns x {len(toks)} tokens, mismatches={bad} "
      f"[{time.time()-t0:.0f}s]", flush=True)

# --- levenshtein agreement ------------------------------------------------
rng = random.Random(base.randrange(1 << 63))
pairs = [
    (
        "".join(rng.choices(ALPH, k=rng.randint(0, 7))),
        "".join(rng.choices(ALPH, k=rng.randint(0, 7))),
    )
    for _ in range(N_PAIRS)
]
pair_df = spark.createDataFrame(pairs, "a string, b string")
sp_d = [
    r[0]
    for r in pair_df.select(F.levenshtein("a", "b")).collect()
]
con.execute("CREATE OR REPLACE TABLE pairs AS SELECT * FROM (VALUES "
            + ",".join(f"('{a}','{b}')" for a, b in pairs) + ") v(a,b)")
dk_d = [r[0] for r in con.execute("SELECT levenshtein(a,b) FROM pairs").fetchall()]


def full_dp(a, b):
    # exact distance via the banded checker: smallest m with within_edits
    m = 0
    while not within_edits(a, b, m):
        m += 1
    return m


lev_bad = 0
for (a, b), s, d in zip(pairs, sp_d, dk_d):
    p = full_dp(a, b)
    if not (p == s == d):
        lev_bad += 1
        print(f"LEV MISMATCH {a!r} {b!r}: py={p} spark={s} duck={d}")
# thresholded form (the actual engine predicate) on a sample
thr_bad = 0
for (a, b), s in list(zip(pairs, sp_d))[:5000]:
    for m in (0, 1, 2):
        if within_edits(a, b, m) != (s <= m):
            thr_bad += 1
print(f"levenshtein: {N_PAIRS} pairs exact + 5000x3 thresholded, "
      f"mismatches={lev_bad}+{thr_bad} [{time.time()-t0:.0f}s]", flush=True)

print("PASS" if bad == lev_bad == thr_bad == 0 else "FAIL")
spark.stop()
