"""The north_rule deliverable: spark-submit --py-files <zip> runs the engine
in a FRESH process with only the packaged library on the python path."""

import os
import subprocess
import sys
import textwrap


def test_spark_submit_py_files(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(
        [sys.executable, os.path.join(repo, "make_package.py")],
        check=True, capture_output=True,
    )
    zip_path = os.path.join(repo, "dist", "elasticsearch_batch_percolator_spark.zip")
    job = tmp_path / "job.py"
    job.write_text(textwrap.dedent("""
        from pyspark.sql import SparkSession
        spark = SparkSession.builder.master("local[2]").appName("pkg").getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
        from elasticsearch_batch_percolator_spark.engine import Engine
        from elasticsearch_batch_percolator_spark.operators.percolate import percolate
        from elasticsearch_batch_percolator_spark.sources.registry import CompiledRegistry
        docs = spark.createDataFrame(
            [(1, "the fox is here"), (2, "bad wolf")], "doc_id long, content string")
        assert Engine(spark, docs).topk(["fox"], k=2).count() == 1
        reg = CompiledRegistry.from_rows([("q", {"term": {"content": "fox"}})])
        assert percolate(spark, docs, reg).matches.count() == 1
        print("PKG_SMOKE_OK")
        spark.stop()
    """))
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # only the zip provides the package
    proc = subprocess.run(
        ["spark-submit", "--py-files", zip_path, str(job)],
        capture_output=True, text=True, timeout=300, env=env, cwd=str(tmp_path),
    )
    assert "PKG_SMOKE_OK" in proc.stdout, proc.stderr[-2000:]
