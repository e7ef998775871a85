"""Per-field highlight maps: reference goldens + spec semantics.

Goldens mirror APITests.java:132-139 — ``highlights.field1[0] ==
"the <b>fox</b> is here"``, ``highlights.field2[0] == "<b>youscan</b>
percolator"``, and an EMPTY map for the spec-less match_all query.
"""

from pyspark.sql import functions as F

from elasticsearch_batch_percolator_spark.operators.highlight import (
    HighlightSpec,
    _fragments,
    _unit_matcher,
)
from elasticsearch_batch_percolator_spark.operators.percolate import percolate
from elasticsearch_batch_percolator_spark.sources.registry import CompiledRegistry


def _hl_rows(spark, queries, docs_rows, fields):
    reg = CompiledRegistry.from_rows(list(queries.items()))
    docs = spark.createDataFrame(docs_rows, "doc_id long, f1 string, f2 string")
    res = percolate(spark, docs, reg, fields=fields)
    return {
        (int(r["doc_id"]), r["query_id"]): r["highlights"]
        for r in res.with_highlights(reg).collect()
    }


def test_api_tests_goldens(spark):
    """The reference's exact registration shape and expected fragments."""
    queries = {
        "001": {
            "query": {"term": {"field1": "fox"}},
            "highlight": {"fields": ["field1"], "pre_tags": ["<b>"], "post_tags": ["</b>"]},
        },
        "002": {
            "query": {"term": {"field2": "youscan"}},
            "highlight": {
                "fields": ["field2"],
                "pre_tags": ["<b>"],
                "post_tags": ["</b>"],
                "require_field_match": True,
                "highlight_query": {"term": {"field2": "youscan"}},
            },
        },
        "003": {"match_all": {}},  # no spec -> empty highlights
    }
    hl = _hl_rows(
        spark,
        queries,
        [(0, "the fox is here", "youscan percolator")],
        {"field1": "f1", "field2": "f2"},
    )
    assert hl[(0, "001")] == {"field1": ["the <b>fox</b> is here"]}
    assert hl[(0, "002")] == {"field2": ["<b>youscan</b> percolator"]}
    assert hl[(0, "003")] == {}


def test_highlight_query_override(spark):
    """highlightQuery highlights DIFFERENT terms than the match query."""
    queries = {
        "q": {
            "query": {"term": {"field1": "fox"}},
            "highlight": {
                "fields": ["field1"],
                "highlight_query": {"term": {"field1": "here"}},
            },
        },
    }
    hl = _hl_rows(
        spark, queries,
        [(0, "the fox is here", "x")],
        {"field1": "f1", "field2": "f2"},
    )
    assert hl[(0, "q")] == {"field1": ["the fox is <b>here</b>"]}


def test_require_field_match_semantics(spark):
    """require_field_match=False highlights the query's terms in EVERY
    requested field; True only in the term's own field."""
    base = {"query": {"bool": {"must": [{"term": {"field1": "shared"}}]}}}
    queries = {
        "strict": {**base, "highlight": {"fields": ["field1", "field2"],
                                          "require_field_match": True}},
        "loose": {**base, "highlight": {"fields": ["field1", "field2"],
                                         "require_field_match": False}},
    }
    hl = _hl_rows(
        spark, queries,
        [(0, "a shared token", "shared elsewhere")],
        {"field1": "f1", "field2": "f2"},
    )
    assert hl[(0, "strict")] == {"field1": ["a <b>shared</b> token"]}
    assert hl[(0, "loose")] == {
        "field1": ["a <b>shared</b> token"],
        "field2": ["<b>shared</b> elsewhere"],
    }


def test_fragment_windowing():
    """Long text yields windowed fragments, not the whole doc."""
    units = ["w%02d" % i for i in range(50)]
    units[10] = "hit"
    units[40] = "hit"
    text = " ".join(units)
    m = _unit_matcher({"hit"}, [], "ws")
    frags = _fragments(text, m, "<b>", "</b>", fragment_size=30, max_fragments=5)
    assert len(frags) == 2
    assert all("<b>hit</b>" in f for f in frags)
    assert all(len(f) <= 30 + len("<b></b>") * 3 for f in frags)
    # cap honored
    assert len(_fragments(text, m, "<b>", "</b>", 30, 1)) == 1


def test_short_text_single_fragment():
    m = _unit_matcher({"fox"}, [], "ws")
    assert _fragments("the fox is here", m, "<b>", "</b>", 100, 5) == [
        "the <b>fox</b> is here"
    ]
    # no hit -> no fragments
    assert _fragments("nothing here", m, "<b>", "</b>", 100, 5) == []


def test_code_analyzer_unit_match():
    """Code fields highlight the whitespace unit containing a matching
    identifier sub-token."""
    m = _unit_matcher({"parse_request"}, [], "code")
    assert _fragments(
        "def parse_request(x): return", m, "<b>", "</b>", 100, 5
    ) == ["def <b>parse_request(x):</b> return"]


def test_spec_from_dict_defaults():
    s = HighlightSpec.from_dict({"fields": ["f1"]})
    assert s.pre_tag == "<b>" and s.post_tag == "</b>"
    assert s.require_field_match is True  # the ES 2.x default
    assert s.fragment_size == 100 and s.number_of_fragments == 5
    assert s.highlight_query is None


def test_fragment_order_score():
    """order='score': the fragment with more hits comes first."""
    units = ["w%02d" % i for i in range(60)]
    units[5] = "hit"
    units[40] = "hit"
    units[42] = "hit"
    text = " ".join(units)
    m = _unit_matcher({"hit"}, [], "ws")
    frags_doc = _fragments(text, m, "<b>", "</b>", 30, 5, order="none")
    frags_score = _fragments(text, m, "<b>", "</b>", 30, 5, order="score")
    assert frags_doc[0].count("<b>") == 1  # document order: lone hit first
    assert frags_score[0].count("<b>") == 2  # score order: double-hit first
    assert sorted(frags_doc) == sorted(frags_score)


def test_per_doc_responses_shape(spark):
    """S7 full response item: matches sorted by query_id with per-field
    highlight maps; empty docs get matches=[]."""
    import json

    from elasticsearch_batch_percolator_spark.sources.response import (
        per_doc_responses,
    )

    queries = {
        "001": {"query": {"term": {"f": "fox"}},
                "highlight": {"fields": ["f"]}},
        "000": {"match_all": {}},
    }
    reg = CompiledRegistry.from_rows(list(queries.items()))
    docs = spark.createDataFrame(
        [(1, "the fox is here"), (2, "nothing")], "doc_id long, c string"
    )
    res = percolate(spark, docs, reg, fields={"f": "c"})
    rows = {r["doc_id"]: json.loads(r["response_json"])
            for r in per_doc_responses(res, reg).collect()}
    assert rows[1]["n_matches"] == 2
    assert [m["query_id"] for m in rows[1]["matches"]] == ["000", "001"]
    assert rows[1]["matches"][1]["highlights"] == {"f": ["the <b>fox</b> is here"]}
    assert rows[1]["matches"][0]["highlights"] in ({}, None)  # spec-less query
    assert rows[2]["matches"] == [{"query_id": "000", "highlights": {}}] or \
           rows[2]["matches"][0]["query_id"] == "000"
