"""Registry round-trip soak: random registries -> save_registry(parquet)
-> load_registry -> percolate must EQUAL the original registry's matches,
fresh seeds, including msm/nested/span/wildcard shapes."""
import random, shutil, sys, tempfile, time
import os; _R = os.path.dirname(os.path.dirname(os.path.abspath(__file__))); sys.path.insert(0, _R); sys.path.insert(0, os.path.join(_R, "tests"))
import test_multi_field_random as M
from elasticsearch_batch_percolator_spark.operators.percolate import percolate
from elasticsearch_batch_percolator_spark.sources.registry import (
    CompiledRegistry, save_registry, load_registry)
from elasticsearch_batch_percolator_spark.session import get_spark

spark = get_spark("ebp-soak-reg", cores=16)
spark.sparkContext.setLogLevel("ERROR")
base = random.Random(31337)
t0 = time.time()
FIELDS = {"f1": "f1", "f2": "f2", "num": ("num", "numeric"), "kids": ("kids", "nested")}
for it in range(6):
    seed = base.randrange(1 << 63)
    rng = random.Random(seed)
    queries = {f"q{i}": M._rand_query(rng) for i in range(250)}
    docs = [M._rand_doc(rng, i) for i in range(120)]
    df = spark.createDataFrame(
        docs, "doc_id long, f1 string, f2 string, num long, "
              "kids array<struct<ct: array<string>>>")
    reg = CompiledRegistry.from_rows(list(queries.items()))
    path = tempfile.mkdtemp(prefix="ebp_soak_reg_")
    shutil.rmtree(path, ignore_errors=True)
    save_registry(spark, list(queries.items()), path)
    reg2 = load_registry(spark, path)
    a = {(int(r["doc_id"]), r["query_id"])
         for r in percolate(spark, df, reg, fields=FIELDS).matches.collect()}
    b = {(int(r["doc_id"]), r["query_id"])
         for r in percolate(spark, df, reg2, fields=FIELDS).matches.collect()}
    assert a == b, f"seed {seed}: diff {sorted(a ^ b)[:8]}"
    assert len(reg2.queries) == len(reg.queries)
    shutil.rmtree(path, ignore_errors=True)
    print(f"it{it} seed={seed}: ok |matches|={len(a)} [{time.time()-t0:.0f}s]", flush=True)
print("PASS")
spark.stop()
