"""Compiler round-trip + limiting-filter superset property (pure Python).

Mirrors the reference's randomized corpus test: 10,000 random query trees
over random docs, asserting the limiting filter's match set is a SUPERSET of
the exact query's match set (LimitingFilterFactoryTest.groovy.txt:67-99).
"""

from hypothesis import given, settings, strategies as st

from elasticsearch_batch_percolator_spark.plans import (
    Bool,
    MatchAll,
    Phrase,
    SpanNear,
    SpanNot,
    SpanOr,
    SpanTerm,
    Term,
    Wildcard,
    WildcardPhrase,
    compile_query,
    limiting_filter,
)
from elasticsearch_batch_percolator_spark.plans.eval_py import eval_plan

FIELD = "content"
VOCAB = list("abcdefgh")

terms = st.sampled_from(VOCAB)
patterns = st.sampled_from(["a*", "?b", "c?", "*e*", "f", "a?c", "*"])

leaf = st.one_of(
    st.builds(Term, st.just(FIELD), terms),
    st.builds(Wildcard, st.just(FIELD), patterns),
    st.builds(lambda ts: Phrase(FIELD, tuple(ts)), st.lists(terms, min_size=1, max_size=3)),
    st.builds(
        lambda ts, slop: Phrase(FIELD, tuple(ts), slop),
        st.lists(terms, min_size=2, max_size=3),
        st.integers(0, 2),
    ),
    st.just(MatchAll()),
    st.builds(
        lambda ps: WildcardPhrase(FIELD, tuple(ps)),
        st.lists(
            st.one_of(
                st.builds(Term, st.just(FIELD), terms),
                st.builds(Wildcard, st.just(FIELD), patterns),
            ),
            min_size=1,
            max_size=3,
        ),
    ),
)

span_leaf = st.builds(SpanTerm, st.just(FIELD), terms)
spans = st.recursive(
    span_leaf,
    lambda inner: st.one_of(
        st.builds(
            lambda cs, slop, io: SpanNear(tuple(cs), slop, io),
            st.lists(inner, min_size=1, max_size=3),
            st.integers(0, 3),
            st.booleans(),
        ),
        st.builds(lambda cs: SpanOr(tuple(cs)), st.lists(inner, min_size=1, max_size=3)),
        st.builds(SpanNot, inner, inner),
    ),
    max_leaves=4,
)

plans = st.recursive(
    st.one_of(leaf, spans),
    lambda inner: st.builds(
        lambda m, s, mn, f, k: Bool(
            tuple(m), tuple(s), tuple(mn), tuple(f),
            # minimum_should_match: only meaningful with shoulds; the
            # compiler normalizes msm > len(should) to MatchNone, so cap it
            # here to keep to_dict round-trips comparable.
            msm=min(k, len(s)) if s else 0,
        ),
        st.lists(inner, max_size=2),
        st.lists(inner, max_size=2),
        st.lists(inner, max_size=2),
        st.lists(inner, max_size=1),
        st.integers(0, 2),
    ),
    max_leaves=6,
)

docs = st.lists(terms, max_size=10).map(lambda ts: {FIELD: ts})


@settings(max_examples=2000, deadline=None, derandomize=True)
@given(plans, docs)
def test_limiting_filter_superset(plan, doc):
    approx = limiting_filter(plan)
    if approx is None:
        return  # "cannot approximate" — phase 2 always runs: trivially sound
    if eval_plan(plan, doc):
        assert eval_plan(approx, doc), (
            f"approximation excluded a true match\nplan={plan}\napprox={approx}\ndoc={doc}"
        )


@settings(max_examples=500, deadline=None, derandomize=True)
@given(plans, st.lists(docs, min_size=5, max_size=5))
def test_compile_round_trip_semantic(plan, doc_sample):
    """to_dict -> compile may normalize (1-term phrase -> term) but must be
    semantically identical on every doc."""
    recompiled = compile_query(plan.to_dict())
    for doc in doc_sample:
        assert eval_plan(recompiled, doc) == eval_plan(plan, doc), (
            f"\nplan={plan}\nrecompiled={recompiled}\ndoc={doc}"
        )


@settings(max_examples=1000, deadline=None, derandomize=True)
@given(plans, docs)
def test_compile_predicate_matches_eval_plan(plan, doc):
    from elasticsearch_batch_percolator_spark.plans.eval_py import compile_predicate

    pred = compile_predicate(plan, FIELD)
    got = pred(doc[FIELD], set(doc[FIELD]))
    assert got == eval_plan(plan, doc), f"plan={plan}\ndoc={doc}"


def test_compiler_es_shorthand():
    assert compile_query({"term": {"content": "Fox"}}) == Term("content", "fox")
    assert compile_query({"match_phrase": {"content": "the Fox"}}) == Phrase(
        "content", ("the", "fox")
    )
    assert compile_query({"match": {"content": "quick fox"}}) == Bool(
        should=(Term("content", "quick"), Term("content", "fox"))
    )
    assert compile_query('{"match_all": {}}') == MatchAll()
    # ES-style match with operator:and (nested-spec form)
    assert compile_query(
        {"match": {"content": {"query": "quick fox", "operator": "and"}}}
    ) == Bool(must=(Term("content", "quick"), Term("content", "fox")))
    # terms (IN-list) and prefix
    assert compile_query({"terms": {"content": ["a", "B"]}}) == Bool(
        should=(Term("content", "a"), Term("content", "b"))
    )
    assert compile_query({"prefix": {"content": "Fo"}}) == Wildcard("content", "fo*")


def test_limiting_reference_rules():
    # phrase -> AND of terms (LimitingFilterFactory.java:177-192)
    p = Phrase(FIELD, ("a", "b"))
    assert limiting_filter(p) == Bool(must=(Term(FIELD, "a"), Term(FIELD, "b")))
    # negated multi-term phrase -> absent
    assert limiting_filter(p, negated=True) is None
    # 1-term phrase -> exact term, allowed under negation
    assert limiting_filter(Phrase(FIELD, ("a",)), negated=True) == Term(FIELD, "a")
    # bool must_not with inexact inner approx -> clause dropped, not unsound
    b = Bool(must=(Term(FIELD, "a"),), must_not=(p,))
    assert limiting_filter(b) == Bool(must=(Term(FIELD, "a"),))
    # span near -> AND of clause terms
    sn = SpanNear((SpanTerm(FIELD, "a"), SpanTerm(FIELD, "b")), slop=1)
    assert limiting_filter(sn) == Bool(must=(Term(FIELD, "a"), Term(FIELD, "b")))
    # negated span -> absent
    assert limiting_filter(sn, negated=True) is None


def test_compiler_minimum_should_match():
    from elasticsearch_batch_percolator_spark.plans import MatchNone
    from elasticsearch_batch_percolator_spark.plans.compiler import QueryParseError
    import pytest as _pytest

    q = {
        "bool": {
            "should": [{"term": {"content": "a"}}, {"term": {"content": "b"}}],
            "minimum_should_match": 2,
        }
    }
    p = compile_query(q)
    assert isinstance(p, Bool) and p.msm == 2
    assert eval_plan(p, {FIELD: ["a", "b"]})
    assert not eval_plan(p, {FIELD: ["a", "x"]})
    # round-trips through to_dict
    assert compile_query(p.to_dict()) == p
    # Lucene: minimumNumberShouldMatch above the clause count never matches
    q["bool"]["minimum_should_match"] = 3
    assert isinstance(compile_query(q), MatchNone)
    # with must present, msm shoulds become REQUIRED (not score-only)
    q2 = {
        "bool": {
            "must": [{"term": {"content": "m"}}],
            "should": [{"term": {"content": "a"}}, {"term": {"content": "b"}}],
            "minimum_should_match": 1,
        }
    }
    p2 = compile_query(q2)
    assert eval_plan(p2, {FIELD: ["m", "a"]})
    assert not eval_plan(p2, {FIELD: ["m"]})  # default would match
    # percent spec resolves against the optional-clause count at parse time
    q2["bool"]["minimum_should_match"] = "75%"
    assert compile_query(q2).msm == 1  # trunc(2 * 0.75)
    # malformed specs are parse-time errors, never silent
    q2["bool"]["minimum_should_match"] = "abc%"
    with _pytest.raises(QueryParseError):
        compile_query(q2)


def test_minimum_should_match_spec_grammar():
    """ES 1.7 Queries.calculateMinShouldMatch semantics (the reference's
    registered queries parse through it): integer, negative, percent,
    negative percent, and conditional combination forms."""
    from elasticsearch_batch_percolator_spark.plans.compiler import (
        calculate_min_should_match as c,
    )

    assert c(4, 3) == 3
    assert c(4, "3") == 3
    assert c(4, -1) == 3
    assert c(4, "-5") == 0          # clamps at 0
    assert c(4, "75%") == 3
    assert c(3, "75%") == 2         # trunc(2.25), toward zero
    assert c(4, "-25%") == 3        # all but trunc(1.0)
    assert c(3, "-25%") == 3        # int(-0.75) == 0 (toward zero)
    assert c(4, "150%") == 6        # > n signals unmatchable upstream
    # conditional: n <= bound -> ALL required; else sub-spec applies
    assert c(3, "3<90%") == 3
    assert c(10, "3<90%") == 9
    # multiple conditions, left to right (Solr/ES doc example)
    spec = "2<-25% 9<-3"
    assert c(2, spec) == 2          # n <= 2: all
    assert c(8, spec) == 6          # 2 < 8 <= 9: -25% => 8 - trunc(2.0)
    assert c(12, spec) == 9         # n > 9: -3
    # camelCase + legacy aliases parse on bool / terms / match
    b = compile_query({"bool": {"should": [{"term": {"content": "a"}},
                                           {"term": {"content": "b"}}],
                                "minimumShouldMatch": 2}})
    assert b.msm == 2
    t = compile_query({"terms": {"content": ["a", "b", "c"],
                                 "minimum_match": 2}})
    assert t.msm == 2
    m = compile_query({"match": {"content": {"query": "a b c",
                                             "minimum_should_match": "67%"}}})
    assert m.msm == 2


def test_msm_should_group_gates():
    """minimum_should_match makes shoulds REQUIRED, so phase 1 gains a
    >=1-of-union gate group alongside the must groups (wider than >=k:
    sound; without msm the should group must NOT gate)."""
    from elasticsearch_batch_percolator_spark.sources.registry import (
        CompiledRegistry,
    )

    reg = CompiledRegistry.from_rows([
        ("msm", {"bool": {"must": [{"term": {"content": "m"}}],
                          "should": [{"term": {"content": "a"}},
                                     {"term": {"content": "b"}}],
                          "minimum_should_match": 1}}),
        ("plain", {"bool": {"must": [{"term": {"content": "m"}}],
                            "should": [{"term": {"content": "a"}},
                                       {"term": {"content": "b"}}]}}),
    ])
    g_msm = reg.queries["msm"].groups
    g_plain = reg.queries["plain"].groups
    assert {("t", "content", "m")} in g_msm
    assert {("t", "content", "a"), ("t", "content", "b")} in g_msm
    assert g_plain == [{("t", "content", "m")}]
    # both still verify in phase 2 (groups are >=1-of, not >=k-of)
    assert reg.queries["msm"].needs_verify


def test_terms_single_token_respects_msm():
    """ES 1.7 TermsQueryParser ALWAYS builds a BooleanQuery, so an msm
    above the clause count matches nothing even with one value — the
    single-token Term collapse must not short-circuit past it. (A match
    query with one token stays a TermQuery and ignores msm: ES applies
    applyMinimumShouldMatch only to BooleanQueries.)"""
    from elasticsearch_batch_percolator_spark.plans.query_plan import (
        MatchNone,
        Term,
    )

    assert isinstance(
        compile_query({"terms": {"f": ["alpha"], "minimum_match": 2}}),
        MatchNone,
    )
    assert isinstance(
        compile_query(
            {"terms": {"f": ["alpha"], "minimum_should_match": 2}}
        ),
        MatchNone,
    )
    # msm <= clause count: the one-clause disjunction is exactly a Term
    assert compile_query(
        {"terms": {"f": ["alpha"], "minimum_match": 1}}
    ) == Term("f", "alpha")
    # match: single token -> TermQuery, msm is an ES no-op
    assert compile_query(
        {"match": {"f": {"query": "alpha", "minimum_should_match": 2}}}
    ) == Term("f", "alpha")
