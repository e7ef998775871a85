"""Lucene sloppy-phrase (edit-distance) semantics for Phrase slop > 0.

The reference inherits Lucene's ``PhraseQuery`` behavior wherever phrase
queries flow through its limiting filter
(LimitingFilterFactory.java:177-192): a phrase matches iff one document
position p_i can be assigned to each phrase occurrence i (query offset
o_i, DISTINCT positions for repeated terms) with
``max(p_i - o_i) - min(p_i - o_i) <= slop`` — so terms may match out of
order at slop >= 2 (a transposition costs 2 moves).

``brute_lucene_slop`` below is an independent direct model (exhaustive
position assignment); the engine's window-greedy matcher is checked
against it on randomized docs, plus the canonical Lucene goldens.
"""

from itertools import product

from hypothesis import given, settings
from hypothesis import strategies as st

from elasticsearch_batch_percolator_spark.plans.eval_py import (
    eval_plan,
    sloppy_phrase_match,
)
from elasticsearch_batch_percolator_spark.plans.query_plan import Phrase

VOCAB = list("abcd")


def brute_lucene_slop(toks, terms, slop):
    """Exhaustive reference model of Lucene sloppy-phrase matching."""
    cand = [[i for i, x in enumerate(toks) if x == t] for t in terms]
    if any(not c for c in cand):
        return False
    for combo in product(*cand):
        if len(set(combo)) < len(combo):
            continue  # repeated terms need distinct positions
        adj = [p - o for o, p in enumerate(combo)]
        if max(adj) - min(adj) <= slop:
            return True
    return False


def test_lucene_goldens():
    # transposition costs 2: "b a"~2 matches "a b", ~1 does not
    assert sloppy_phrase_match(["a", "b"], ("b", "a"), 2) is True
    assert sloppy_phrase_match(["a", "b"], ("b", "a"), 1) is False
    # in-order gap of one intervening token costs 1
    assert sloppy_phrase_match(["a", "x", "b"], ("a", "b"), 1) is True
    assert sloppy_phrase_match(["a", "x", "b"], ("a", "b"), 0) is False
    # repeats need distinct positions
    assert sloppy_phrase_match(["a"], ("a", "a"), 5) is False
    assert sloppy_phrase_match(["a", "x", "a"], ("a", "a"), 1) is True
    assert sloppy_phrase_match(["a", "x", "a"], ("a", "a"), 0) is False
    # 3-term out-of-order
    assert sloppy_phrase_match(["c", "a", "b"], ("a", "b", "c"), 4) is True
    assert sloppy_phrase_match(["c", "a", "b"], ("a", "b", "c"), 2) is False


def test_eval_plan_uses_lucene_semantics():
    doc = {"content": ["a", "b"]}
    assert eval_plan(Phrase("content", ("b", "a"), slop=2), doc) is True
    assert eval_plan(Phrase("content", ("b", "a"), slop=1), doc) is False


@settings(max_examples=300, deadline=None)
@given(
    toks=st.lists(st.sampled_from(VOCAB), min_size=0, max_size=12),
    terms=st.lists(st.sampled_from(VOCAB), min_size=1, max_size=4),
    slop=st.integers(0, 6),
)
def test_matches_brute_model(toks, terms, slop):
    terms = tuple(terms)
    assert sloppy_phrase_match(toks, terms, slop) == brute_lucene_slop(
        toks, terms, slop
    )
    # eval_plan agrees for slop>0 (slop=0 keeps the consecutive fast path,
    # which the brute model subsumes: all adjusted positions equal)
    assert eval_plan(Phrase("f", terms, slop), {"f": toks}) == brute_lucene_slop(
        toks, terms, slop
    )


def test_percolate_sloppy_out_of_order(spark):
    """End-to-end: a registered sloppy phrase matches a transposed doc."""
    from elasticsearch_batch_percolator_spark.operators.percolate import percolate
    from elasticsearch_batch_percolator_spark.sources.registry import (
        CompiledRegistry,
    )

    reg = CompiledRegistry.from_rows(
        [
            ("q-slop2", {"phrase": {"field": "content",
                                    "terms": ["fox", "quick"], "slop": 2}}),
            ("q-slop1", {"phrase": {"field": "content",
                                    "terms": ["fox", "quick"], "slop": 1}}),
        ]
    )
    docs = spark.createDataFrame(
        [(1, "the quick fox jumps"), (2, "fox quick")],
        "doc_id long, content string",
    )
    res = percolate(spark, docs, reg)
    got = {(int(r["doc_id"]), r["query_id"]) for r in res.matches.collect()}
    # doc 1 "quick fox": transposed for the query -> needs slop 2
    # doc 2 "fox quick": exact order -> matches both
    assert got == {(1, "q-slop2"), (2, "q-slop2"), (2, "q-slop1")}
