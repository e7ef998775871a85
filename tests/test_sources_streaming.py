"""JSON/NDJSON sources (S1-S4), multi-percolate slots (E9), streaming (foreachBatch)."""

import json
import time

from pyspark.sql import functions as F

from elasticsearch_batch_percolator_spark.sources.json_source import (
    fetch_existing,
    parse_batch_body,
    parse_ndjson,
    parse_single_body,
)
from elasticsearch_batch_percolator_spark.sources.registry import CompiledRegistry
from elasticsearch_batch_percolator_spark.streaming import (
    multi_percolate,
    percolate_stream,
)

QUERIES = {
    "q-fox": {"term": {"content": "fox"}},
    "q-youscan": {"term": {"content": "youscan"}},
    "q-all": {"match_all": {}},
}


def test_parse_batch_body(spark):
    body = json.dumps(
        {"docs": [{"doc_id": 1, "content": "the fox"}, {"doc_id": 2, "content": "bad wolf"}]}
    )
    got = parse_batch_body(spark.createDataFrame([(body,)], "body string")).collect()
    assert [(r["doc_id"], r["content"]) for r in got] == [(1, "the fox"), (2, "bad wolf")]


def test_parse_single_body_defaults(spark):
    body = json.dumps({"doc": {"doc_id": 7, "content": "x"}})
    r = parse_single_body(spark.createDataFrame([(body,)], "body string")).first()
    assert r["doc_id"] == 7 and r["size"] == 2**31 - 1 and r["track_scores"] is False


def test_parse_ndjson(spark, tmp_path):
    lines = [
        json.dumps({"action": "percolate", "slot": 0, "doc": {"doc_id": 1, "content": "the fox is here"}}),
        json.dumps({"action": "count", "slot": 1, "doc": {"doc_id": 2, "content": "youscan percolator"}}),
        "",
        json.dumps({"slot": 2, "doc": {"doc_id": 3, "content": "bad wolf"}}),
    ]
    p = tmp_path / "bulk.ndjson"
    p.write_text("\n".join(lines))
    got = {r["slot"]: (r["action"], r["content"]) for r in parse_ndjson(spark, str(p)).collect()}
    assert got == {
        0: ("percolate", "the fox is here"),
        1: ("count", "youscan percolator"),
        2: ("percolate", "bad wolf"),
    }


def test_fetch_existing(spark, sf_dir):
    corpus = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ids = spark.createDataFrame([(3,), (5,), (999999,)], "doc_id long")
    got = sorted(r["doc_id"] for r in fetch_existing(corpus, ids).select("doc_id").collect())
    assert got == [3, 5]


def test_multi_percolate_slots(spark):
    """APITests._mypercolate semantics: per-slot match sets + count action."""
    reg = CompiledRegistry.from_rows(list(QUERIES.items()))
    batches = spark.createDataFrame(
        [
            (0, 0, "percolate", "the fox is here"),
            (0, 1, "count", "youscan percolator"),
            (0, 2, "percolate", "bad wolf"),
            (1, 0, "percolate", "no match terms qqq"),
        ],
        "batch_id long, slot long, action string, content string",
    )
    rows = {
        (r["batch_id"], r["slot"]): (r["n_matches"], list(r["matched_queries"]))
        for r in multi_percolate(spark, batches, reg).collect()
    }
    assert rows[(0, 0)] == (2, ["q-all", "q-fox"])
    assert rows[(0, 1)] == (2, [])  # count action: count only, no payload
    assert rows[(0, 2)] == (1, ["q-all"])
    assert rows[(1, 0)] == (1, ["q-all"])


def test_percolate_stream_foreachbatch(spark, tmp_path):
    """File stream → foreachBatch percolation → parquet sink."""
    src = tmp_path / "in"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    reg = CompiledRegistry.from_rows(list(QUERIES.items()))

    spark.createDataFrame(
        [(1, "the fox is here"), (2, "youscan percolator")],
        "doc_id long, content string",
    ).write.mode("overwrite").parquet(str(src / "b0"))

    stream = spark.readStream.schema("doc_id long, content string").parquet(
        str(src / "*")
    )
    q = percolate_stream(spark, stream, reg, str(out), str(ckpt))
    try:
        q.processAllAvailable()
        # second micro-batch arrives
        spark.createDataFrame(
            [(3, "bad wolf")], "doc_id long, content string"
        ).write.mode("overwrite").parquet(str(src / "b1"))
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            got = spark.read.parquet(str(out))
            if got.filter(F.col("doc_id") == 3).count() > 0:
                break
            time.sleep(0.5)
    finally:
        q.stop()

    got = {
        (r["doc_id"], r["query_id"])
        for r in spark.read.parquet(str(out)).select("doc_id", "query_id").collect()
    }
    assert got == {
        (1, "q-fox"), (1, "q-all"),
        (2, "q-youscan"), (2, "q-all"),
        (3, "q-all"),
    }


def test_parse_error_slot_channel(spark):
    """A bad slot answers `_parse_error_` while siblings percolate
    (YPercolatorService.java:214-218)."""
    reg = CompiledRegistry.from_rows(list(QUERIES.items()))
    batches = spark.createDataFrame(
        [
            (0, 0, "percolate", "the fox is here", False),
            (0, 1, "percolate", None, True),        # flagged upstream
            (0, 2, "percolate", None, False),       # NULL content -> flagged here
            (0, 3, "count", "youscan percolator", False),
        ],
        "batch_id long, slot long, action string, content string, parse_error boolean",
    )
    rows = {
        (r["batch_id"], r["slot"]): (r["n_matches"], list(r["matched_queries"]), r["error"])
        for r in multi_percolate(spark, batches, reg).collect()
    }
    assert rows[(0, 0)] == (2, ["q-all", "q-fox"], None)
    assert rows[(0, 1)] == (0, [], "_parse_error_")
    assert rows[(0, 2)] == (0, [], "_parse_error_")
    assert rows[(0, 3)] == (2, [], None)


def test_parse_ndjson_flags_bad_lines(spark, tmp_path):
    lines = [
        json.dumps({"action": "percolate", "slot": 0, "doc": {"doc_id": 1, "content": "ok"}}),
        json.dumps({"action": "percolate", "slot": 1}),     # missing doc
        "this is not json at all",                           # unreadable line
    ]
    p = tmp_path / "bulk_bad.ndjson"
    p.write_text("\n".join(lines))
    got = parse_ndjson(spark, str(p)).collect()
    by_slot = {r["slot"]: r["parse_error"] for r in got}
    assert by_slot[0] is False
    assert by_slot[1] is True
    assert by_slot[None] is True  # slot unrecoverable from a garbage line


def test_registry_hot_swap_between_microbatches(spark, tmp_path):
    """S5's real-time listener analog: register/unregister between
    foreachBatch micro-batches — the next batch sees the change."""
    import time as _t

    src = tmp_path / "in"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    reg = CompiledRegistry.from_rows(list(QUERIES.items()))

    spark.createDataFrame(
        [(1, "the fox is here")], "doc_id long, content string"
    ).write.mode("overwrite").parquet(str(src / "b0"))

    stream = spark.readStream.schema("doc_id long, content string").parquet(
        str(src / "*")
    )
    q = percolate_stream(spark, stream, reg, str(out), str(ckpt))
    try:
        q.processAllAvailable()
        # hot-swap: register a new query, drop an old one — same registry
        # object the closure holds, mutated between micro-batches
        reg.register("q-wolf", {"term": {"content": "wolf"}})
        reg.unregister("q-fox")
        spark.createDataFrame(
            [(2, "the fox met a wolf")], "doc_id long, content string"
        ).write.mode("overwrite").parquet(str(src / "b1"))
        deadline = _t.time() + 60
        while _t.time() < deadline:
            q.processAllAvailable()
            got = spark.read.parquet(str(out))
            if got.filter(F.col("doc_id") == 2).count() > 0:
                break
            _t.sleep(0.5)
    finally:
        q.stop()

    got = {
        (r["doc_id"], r["query_id"])
        for r in spark.read.parquet(str(out)).select("doc_id", "query_id").collect()
    }
    # batch 1 saw q-fox; batch 2 saw q-wolf but NOT q-fox
    assert got == {
        (1, "q-fox"), (1, "q-all"),
        (2, "q-wolf"), (2, "q-all"),
    }


def test_multi_percolate_track_scores_and_size(spark):
    """S2 options end-to-end: score-desc ordering per slot (the only sort
    the reference allows, E4) and per-slot size truncation; n_matches
    still counts ALL matches."""
    reg = CompiledRegistry.from_rows(list(QUERIES.items()))
    batches = spark.createDataFrame(
        [(0, 0, "percolate", "the fox fox fox is here"),
         (0, 1, "percolate", "nothing relevant")],
        "batch_id long, slot long, action string, content string",
    )
    rows = {
        r["slot"]: r
        for r in multi_percolate(
            spark, batches, reg, track_scores=True, size=1
        ).collect()
    }
    r0 = rows[0]
    # q-fox (tf=3 BM25 > 0) must outrank q-all (score 0); size=1 keeps it
    assert list(r0["matched_queries"]) == ["q-fox"]
    assert len(r0["scores"]) == 1 and r0["scores"][0] > 0.0
    assert r0["n_matches"] == 2  # total unaffected by size
    r1 = rows[1]
    assert r1["n_matches"] == 1 and list(r1["matched_queries"]) == ["q-all"]
    assert r1["scores"][0] == 0.0


def test_registry_table_auto_reload(spark, tmp_path):
    """registry_path mode: rewriting the durable queries table between
    micro-batches changes what the NEXT batch matches — no restart, no
    shared-object mutation (the stored-docs listener analog)."""
    import time as _t

    from elasticsearch_batch_percolator_spark.sources.registry import save_registry

    src = tmp_path / "in"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    qtab = str(tmp_path / "queries_tab")
    src.mkdir()

    save_registry(spark, [("q-fox", {"term": {"content": "fox"}})], qtab)
    reg = CompiledRegistry.from_rows([("q-fox", {"term": {"content": "fox"}})])

    spark.createDataFrame(
        [(1, "the fox is here")], "doc_id long, content string"
    ).write.mode("overwrite").parquet(str(src / "b0"))
    stream = spark.readStream.schema("doc_id long, content string").parquet(
        str(src / "*")
    )
    q = percolate_stream(spark, stream, reg, str(out), str(ckpt), registry_path=qtab)
    try:
        q.processAllAvailable()
        # rewrite the durable table: drop q-fox, add q-wolf
        save_registry(spark, [("q-wolf", {"term": {"content": "wolf"}})], qtab)
        spark.createDataFrame(
            [(2, "the fox met a wolf")], "doc_id long, content string"
        ).write.mode("overwrite").parquet(str(src / "b1"))
        deadline = _t.time() + 60
        while _t.time() < deadline:
            q.processAllAvailable()
            if spark.read.parquet(str(out)).filter(F.col("doc_id") == 2).count() > 0:
                break
            _t.sleep(0.5)
    finally:
        q.stop()

    got = {
        (r["doc_id"], r["query_id"])
        for r in spark.read.parquet(str(out)).select("doc_id", "query_id").collect()
    }
    assert got == {(1, "q-fox"), (2, "q-wolf")}


def test_multi_percolate_with_existing_docs(spark):
    """Bulk-with-existing-docs: slots referencing corpus doc ids resolve
    content via ONE multi-get join before fan-out
    (TransportMultiYPercolateAction.java:79-116); a missing id flows into
    the per-slot _parse_error_ channel while siblings percolate."""
    reg = CompiledRegistry.from_rows(list(QUERIES.items()))
    corpus = spark.createDataFrame(
        [(100, "the fox is here"), (101, "bad wolf")],
        "doc_id long, content string",
    )
    batches = spark.createDataFrame(
        [
            (0, 0, "percolate", None, 100),     # existing doc -> q-fox
            (0, 1, "percolate", "bad wolf", None),  # inline content
            (0, 2, "percolate", None, 999),     # missing id -> slot error
            (0, 3, "count", None, 101),         # existing doc, count action
        ],
        "batch_id long, slot long, action string, content string, get_id long",
    )
    rows = {
        (r["batch_id"], r["slot"]): (
            r["n_matches"], list(r["matched_queries"]), r["error"],
        )
        for r in multi_percolate(spark, batches, reg, corpus=corpus).collect()
    }
    assert rows[(0, 0)] == (2, ["q-all", "q-fox"], None)
    assert rows[(0, 1)] == (1, ["q-all"], None)
    assert rows[(0, 2)] == (0, [], "_parse_error_")
    assert rows[(0, 3)][0] == 1 and rows[(0, 3)][2] is None
