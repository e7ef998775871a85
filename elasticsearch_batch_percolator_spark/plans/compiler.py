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
import re as _re
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


#: accepted DSL spellings for bool minimum_should_match (ES 1.7
#: BoolQueryParser accepts snake_case and camelCase, with and without
#: "number")
_MSM_KEYS = (
    "minimum_should_match",
    "minimum_number_should_match",
    "minimumShouldMatch",
    "minimumNumberShouldMatch",
)


def calculate_min_should_match(n_optional: int, spec) -> int:
    """Resolve an ES minimum_should_match spec against the optional-clause
    count, with ES 1.7 semantics (Queries.calculateMinShouldMatch,
    elasticsearch-1.7 common/lucene/search/Queries.java — the parser the
    reference's registered queries go through):

    - integer ``k``: exactly k (k < 0 means ``n_optional + k``)
    - ``"75%"``: truncate(n * 75 / 100); ``"-25%"`` leaves all but that many
    - conditional ``"3<90%"``: if n <= 3 all optional clauses are required,
      else the sub-spec applies; multiple space-separated conditions are
      evaluated left to right
    Negative results clamp to 0; a result above ``n_optional`` is the
    caller's signal for Lucene's unmatchable BooleanQuery.
    """
    if isinstance(spec, bool) or spec is None:
        raise QueryParseError(f"invalid minimum_should_match: {spec!r}")
    if isinstance(spec, int):
        return max(n_optional + spec if spec < 0 else spec, 0)
    if isinstance(spec, float):
        if not spec.is_integer():
            raise QueryParseError(
                f"minimum_should_match must be integral, got {spec!r}"
            )
        return calculate_min_should_match(n_optional, int(spec))
    s = str(spec).strip()
    try:
        if "<" in s:
            # normalize spaces around '<' the way the reference does, then
            # evaluate space-separated conditions left to right
            s = _re.sub(r"\s*<\s*", "<", s)
            result = n_optional  # no condition applies -> all required
            for cond in s.split():
                upper_s, _, sub = cond.partition("<")
                if n_optional <= int(upper_s):
                    return result
                result = calculate_min_should_match(n_optional, sub)
            return result
        if s.endswith("%"):
            percent = int(s[:-1])
            calc = n_optional * percent / 100.0
            # Java's (int) cast truncates toward zero, as does int() here
            result = n_optional + int(calc) if calc < 0 else int(calc)
        else:
            calc = int(s)
            result = n_optional + calc if calc < 0 else calc
    except ValueError:
        raise QueryParseError(f"invalid minimum_should_match spec: {spec!r}")
    return max(result, 0)


def _msm_from(body: dict, n_optional: int) -> int:
    for key in _MSM_KEYS:
        if key in body:
            return calculate_min_should_match(n_optional, body[key])
    return 0


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
        spec = body
        if "field" in body or ("query" in body and len(body) > 1):
            f = body.get("field") or next(
                k for k in body if k not in ("query", "operator", *_MSM_KEYS)
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
        if str(op).lower() == "and":
            return Bool(must=terms)
        # ES 1.7 MatchQueryParser honors minimum_should_match on the
        # analyzed-disjunction form
        msm = _msm_from(spec, len(terms))
        if msm > len(terms):
            return MatchNone()
        return Bool(should=terms, msm=msm)

    if kind == "terms":
        # ES 1.7 TermsQueryParser: "minimum_match" is its legacy alias
        msm_spec = {k: v for k, v in body.items()
                    if k in _MSM_KEYS or k == "minimum_match"}
        if "minimum_match" in msm_spec:
            msm_spec.setdefault("minimum_should_match",
                                msm_spec.pop("minimum_match"))
        f, vals = _field_value(
            {k: v for k, v in body.items() if k not in _MSM_KEYS
             and k != "minimum_match"}
        )
        if not isinstance(vals, (list, tuple)):
            raise QueryParseError(f"terms value must be a list: {vals!r}")
        toks = [t for v in vals for t in _analyze(v)]
        if not toks:
            return MatchNone()
        msm = _msm_from(msm_spec, len(toks))
        if msm > len(toks):
            return MatchNone()
        if len(toks) == 1:
            # msm <= 1 here; a pure one-clause disjunction requires that
            # clause regardless of minShouldMatch 0/1, so Term is exact.
            return Term(f, toks[0])
        return Bool(should=tuple(Term(f, t) for t in toks), msm=msm)

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

        shoulds = many("should")
        plan = Bool(must=many("must"), should=shoulds,
                    must_not=many("must_not"), filter=many("filter"),
                    msm=_msm_from(body, len(shoulds)) if shoulds else 0)
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
