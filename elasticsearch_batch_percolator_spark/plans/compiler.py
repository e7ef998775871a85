"""JSON query DSL → Plan (the registration-time parse).

The reference parses registered query JSON once, at registration, into a
Lucene Query plus a precomputed limiting-filter approximation
(BatchPercolatorQueriesRegistry.parsePercolatorDocument:138-185). This
compiler is the Spark-side analog: JSON → Plan dataclass; the approximation
is computed by plans/limiting.py, also once, on the driver.

Accepted DSL (FIXTURES.md §2 + ES-flavored aliases):

    {"term": {"field": "content", "value": "fox"}}
    {"term": {"content": "fox"}}                      # ES shorthand
    {"match": {"content": "quick fox"}}               # analyzed -> bool should of terms
    {"phrase": {"field": "content", "terms": ["the","fox"], "slop": 0}}
    {"match_phrase": {"content": "the fox"}}
    {"wildcard": {"field": "content", "value": "fo*"}}
    {"wildcard_phrase": {"field": "content", "producers": [ ... ]}}
    {"bool": {"must": [...], "should": [...], "must_not": [...], "filter": [...]}}
    {"span_term"|"span_near"|"span_or"|"span_not": ...}
    {"match_all": {}} / {"match_none": {}}
    {"range": {"field": "n_chars", "gte": 10, "lte": 99}}
"""

from __future__ import annotations

import json
from typing import Any

from .query_plan import (
    Bool,
    MatchAll,
    MatchNone,
    Nested,
    Phrase,
    Plan,
    Range,
    SpanNear,
    SpanNot,
    SpanOr,
    SpanTerm,
    Term,
    Wildcard,
    WildcardPhrase,
)

DEFAULT_FIELD = "content"


class QueryParseError(ValueError):
    pass


def _field_value(body: dict, value_key: str = "value") -> tuple[str, Any]:
    """Support both explicit {"field": f, "value": v} and ES {"f": v}."""
    if "field" in body:
        return body["field"], body.get(value_key) if value_key in body else body.get("terms")
    if len(body) == 1:
        f, v = next(iter(body.items()))
        return f, v
    raise QueryParseError(f"cannot infer field from {body!r}")


def _analyze(text: str) -> list[str]:
    """Query-side analysis — MUST mirror tokenize_ws (one analyzer everywhere,
    SURVEY.md §7 hard part 1)."""
    return [t for t in str(text).lower().split(" ") if t]


def compile_query(q: str | dict) -> Plan:
    if isinstance(q, str):
        q = json.loads(q)
    if not isinstance(q, dict) or len(q) != 1:
        raise QueryParseError(f"query must be a single-key object, got {q!r}")
    kind, body = next(iter(q.items()))

    if kind == "term":
        f, v = _field_value(body)
        toks = _analyze(v)
        if len(toks) != 1:
            raise QueryParseError(f"term value must analyze to one token: {v!r}")
        return Term(f, toks[0])

    if kind == "match":
        if "field" in body or ("query" in body and len(body) > 1):
            f = body.get("field") or next(
                k for k in body if k not in ("query", "operator")
            )
            v = body.get("query", body.get(f))
            op = body.get("operator", "or")
        elif len(body) == 1 and isinstance(next(iter(body.values())), dict):
            f, spec = next(iter(body.items()))
            v = spec.get("query", "")
            op = spec.get("operator", "or")
        else:
            f, v = _field_value(body, "query")
            op = "or"
        toks = _analyze(v)
        if not toks:
            return MatchNone()
        if len(toks) == 1:
            return Term(f, toks[0])
        terms = tuple(Term(f, t) for t in toks)
        return Bool(must=terms) if str(op).lower() == "and" else Bool(should=terms)

    if kind == "terms":
        f, vals = _field_value(body)
        if not isinstance(vals, (list, tuple)):
            raise QueryParseError(f"terms value must be a list: {vals!r}")
        toks = [t for v in vals for t in _analyze(v)]
        if not toks:
            return MatchNone()
        if len(toks) == 1:
            return Term(f, toks[0])
        return Bool(should=tuple(Term(f, t) for t in toks))

    if kind == "prefix":
        f, v = _field_value(body)
        return Wildcard(f, str(v).lower() + "*")

    if kind in ("phrase", "match_phrase"):
        if "terms" in body:
            f = body.get("field", DEFAULT_FIELD)
            toks = [t.lower() for t in body["terms"]]
            slop = int(body.get("slop", 0))
        else:
            f, v = _field_value(body, "query")
            toks = _analyze(v)
            slop = int(body.get("slop", 0)) if "slop" in body else 0
        if not toks:
            return MatchNone()
        if len(toks) == 1:
            return Term(f, toks[0])
        return Phrase(f, tuple(toks), slop)

    if kind == "wildcard":
        f, v = _field_value(body)
        return Wildcard(f, str(v).lower())

    if kind == "wildcard_phrase":
        f = body.get("field", DEFAULT_FIELD)
        producers = []
        for p in body["producers"]:
            sub = compile_query(p)
            if not isinstance(sub, (Term, Wildcard)):
                raise QueryParseError(f"wildcard_phrase producer must be term|wildcard: {p!r}")
            producers.append(sub)
        if not producers:
            return MatchNone()
        return WildcardPhrase(f, tuple(producers))

    if kind == "bool":
        def many(key: str) -> tuple[Plan, ...]:
            items = body.get(key, [])
            if isinstance(items, dict):
                items = [items]
            return tuple(compile_query(i) for i in items)

        msm = body.get("minimum_should_match", 0)
        try:
            msm = int(msm)
        except (TypeError, ValueError):
            # ES also accepts percent/combination specs ("75%", "3<90%");
            # only integer counts are supported here — fail at registration
            # like the reference's parse-time errors, never silently.
            raise QueryParseError(
                f"minimum_should_match must be an integer count, got {msm!r}"
            )
        if msm < 0:
            raise QueryParseError(
                f"negative minimum_should_match not supported: {msm}"
            )
        plan = Bool(must=many("must"), should=many("should"),
                    must_not=many("must_not"), filter=many("filter"),
                    msm=msm if body.get("should") else 0)
        if plan.msm > len(plan.should):
            # Lucene: minimumNumberShouldMatch above the optional-clause
            # count can never be satisfied
            return MatchNone()
        if not (plan.must or plan.should or plan.must_not or plan.filter):
            return MatchAll()
        return plan

    if kind == "span_term":
        f, v = _field_value(body)
        return SpanTerm(f, str(v).lower())

    if kind == "span_near":
        clauses = tuple(compile_query(c) for c in body["clauses"])
        return SpanNear(clauses, int(body.get("slop", 0)), bool(body.get("in_order", True)))

    if kind == "span_or":
        return SpanOr(tuple(compile_query(c) for c in body["clauses"]))

    if kind == "span_not":
        return SpanNot(compile_query(body["include"]), compile_query(body["exclude"]))

    if kind == "nested":
        return Nested(body["path"], compile_query(body["query"]))

    if kind == "match_all":
        return MatchAll()
    if kind == "match_none":
        return MatchNone()

    if kind == "range":
        if "field" in body:
            f = body["field"]
            spec = body
        else:
            f, spec = next(iter(body.items()))
        return Range(f, gte=spec.get("gte"), lte=spec.get("lte"))

    raise QueryParseError(f"unsupported query type: {kind!r}")
