"""Concurrency stress mirror of the reference's ConcurrentPercolation test
(ConcurrentPercolation.java:51-130): registered queries — term on a STRING
field and a term-on-LONG field (which the mapping turns into a RangeQuery,
:53-57 comment) — percolated by 5 threads over three doc shapes with exact
expected match-sets per shape. Spark analog: 5 driver threads submitting
percolations against one shared session/registry (Spark schedules jobs from
concurrent threads fairly; the registry broadcast is shared)."""

from concurrent.futures import ThreadPoolExecutor

from elasticsearch_batch_percolator_spark.operators.percolate import percolate
from elasticsearch_batch_percolator_spark.sources.registry import CompiledRegistry

QUERIES = {
    "test1": {"term": {"field2": "value"}},
    # the reference's term-on-long: field1 = 1 becomes a range query
    "test2": {"range": {"field1": {"gte": 1, "lte": 1}}},
}

# doc shapes -> expected matched query ids (ConcurrentPercolation.java:57-75)
SHAPES = [
    ((1, None, "value"), {"test1"}),          # only field2
    ((2, 1, None), {"test2"}),                # only field1
    ((3, 1, "value"), {"test1", "test2"}),    # both
]


def test_concurrent_percolation_shapes(spark):
    reg = CompiledRegistry.from_rows(list(QUERIES.items()))

    def one_round(i: int):
        doc, expected = SHAPES[i % len(SHAPES)]
        docs = spark.createDataFrame(
            [doc], "doc_id long, f1 long, f2 string"
        )
        res = percolate(
            spark, docs, reg,
            fields={"field1": ("f1", "numeric"), "field2": ("f2", "ws")},
        )
        got = {r["query_id"] for r in res.matches.collect()}
        assert got == expected, f"shape {i % 3}: {got} != {expected}"
        return True

    with ThreadPoolExecutor(max_workers=5) as pool:
        results = list(pool.map(one_round, range(15)))
    assert all(results)


def test_numeric_field_null_never_matches(spark):
    """A doc with NULL in the numeric field doesn't match the range."""
    reg = CompiledRegistry.from_rows(list(QUERIES.items()))
    docs = spark.createDataFrame([(9, None, "other")], "doc_id long, f1 long, f2 string")
    res = percolate(
        spark, docs, reg,
        fields={"field1": ("f1", "numeric"), "field2": ("f2", "ws")},
    )
    assert res.matches.count() == 0
