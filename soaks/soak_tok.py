"""Tokenizer fuzz: random printable/unicode strings — tokenize_code must
equal its documented regex oracle; tokenize_ws equals str.split."""
import random, string, sys
import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from elasticsearch_batch_percolator_spark.functions.tokenizer import (
    tokenize_code, tokenize_ws)
try:
    from elasticsearch_batch_percolator_spark.functions.tokenizer import tokenize_code_regex
    HAVE_ORACLE = True
except ImportError:
    HAVE_ORACLE = False
from elasticsearch_batch_percolator_spark.session import get_spark

spark = get_spark("ebp-soak-tok", cores=8)
spark.sparkContext.setLogLevel("ERROR")
rng = random.Random(333)
pool = string.printable + "éÉ中文🚀ß​\t\n\0"
rows = []
for i in range(4000):
    n = rng.randint(0, 80)
    rows.append((i, "".join(rng.choices(pool, k=n))))
rows += [(len(rows), None), (len(rows) + 1, ""), (len(rows) + 2, " \t\n ")]
df = spark.createDataFrame(rows, "doc_id long, content string")
got_ws = {r["doc_id"]: r["t"] for r in df.select("doc_id", tokenize_ws("content").alias("t")).collect()}
for i, c in rows:
    exp = None if c is None else [w for w in c.lower().split(" ") if w]
    if got_ws[i] != exp:
        print("WS MISMATCH", i, repr(c), got_ws[i][:8], exp[:8]); sys.exit(1)
print("tokenize_ws: PASS (4003 strings)")
if HAVE_ORACLE:
    a = {r["doc_id"]: r["t"] for r in df.select("doc_id", tokenize_code("content").alias("t")).collect()}
    b = {r["doc_id"]: r["t"] for r in df.select("doc_id", tokenize_code_regex("content").alias("t")).collect()}
    ascii_ids = {i for i, c in rows if c is not None and c.isascii()}
    bad = [i for i in a if i in ascii_ids and a[i] != b[i]]
    assert not bad, f"code tokenizer diverged on {len(bad)} rows, e.g. {bad[:3]}: {[(rows[i][1], a[i], b[i]) for i in bad[:2]]}"
    print("tokenize_code == regex oracle: PASS")
spark.stop()
