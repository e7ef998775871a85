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
    Exists,
    Fuzzy,
    Ids,
    MatchAll,
    MatchNone,
    Nested,
    Phrase,
    Plan,
    Range,
    Regexp,
    SpanFirst,
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

#: ES 1.x query types the reference's IndexQueryParserService would parse
#: but this engine rejects by design — no analog over the batch schema
#: (geo mappings, parent/child routing, scripted scoring, index-side MLT
#: statistics). Listed so registration fails with the documented set
#: rather than an anonymous "unsupported query type".
_UNSUPPORTED_TYPES = frozenset({
    "function_score",
    "more_like_this",
    "mlt",
    "geo_shape",
    "geo_distance",
    "geo_bounding_box",
    "geo_polygon",
    "geo_distance_range",
    "geohash_cell",
    "has_child",
    "has_parent",
    "top_children",
    "script",
    "template",
    "fquery",
    "indices",
})


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


def _boost_of(body, v=None) -> float:
    """Per-clause boost from either the explicit body ({"field": f,
    "value": v, "boost": b}) or the ES long form ({f: {"value": v,
    "boost": b}}). Matching stays boost-free; the value feeds
    positive_term_weights for scored responses (round-5 item)."""
    for src in (v, body):
        if isinstance(src, dict) and "boost" in src:
            try:
                return float(src["boost"])
            except (TypeError, ValueError):
                raise QueryParseError(f"invalid boost: {src['boost']!r}")
    return 1.0


def _unwrap_value(v, kind: str):
    """ES long-form leaf bodies ({f: {"value": v, "boost": b}}) carry the
    value one level down; boost is retained as a SCORING weight
    (plans carry it; matching is boost-free — COVERAGE.md)."""
    if isinstance(v, dict):
        inner = v.get("value", v.get("wildcard" if kind == "wildcard" else "term"))
        if inner is None:
            inner = v.get("prefix") if kind == "prefix" else None
        if inner is None:
            raise QueryParseError(f"{kind} needs a value: {v!r}")
        return inner
    return v


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
        bst = _boost_of(body, v)
        v = _unwrap_value(v, kind)
        toks = _analyze(v)
        if len(toks) != 1:
            raise QueryParseError(f"term value must analyze to one token: {v!r}")
        return Term(f, toks[0], boost=bst)

    if kind == "match":
        spec = body
        if "field" in body or ("query" in body and len(body) > 1):
            f = body.get("field") or next(
                k for k in body
                if k not in ("query", "operator", "fuzziness",
                             "prefix_length", *_MSM_KEYS)
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
        # ES match fuzziness: each analyzed token becomes a fuzzy clause
        # (MatchQuery.parse builds one FuzzyQuery per token); AUTO resolves
        # per token length, distance 0 degrades to Term
        fz_spec = spec.get("fuzziness") if isinstance(spec, dict) else None
        pl = int(spec.get("prefix_length", 0)) if isinstance(spec, dict) else 0
        bst = _boost_of(spec) if isinstance(spec, dict) else 1.0

        def leaf(t: str, b: float = 1.0) -> Plan:
            if fz_spec is None:
                return Term(f, t, boost=b)
            fz = resolve_fuzziness(fz_spec, len(t))
            return Term(f, t, boost=b) if fz == 0 else Fuzzy(f, t, fz, pl)

        if len(toks) == 1:
            return leaf(toks[0], bst)
        terms = tuple(leaf(t) for t in toks)
        if str(op).lower() == "and":
            return Bool(must=terms, boost=bst)
        # ES 1.7 MatchQueryParser honors minimum_should_match on the
        # analyzed-disjunction form
        msm = _msm_from(spec, len(terms))
        if msm > len(terms):
            return MatchNone()
        return Bool(should=terms, msm=msm, boost=bst)

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
        return Wildcard(f, str(_unwrap_value(v, kind)).lower() + "*")

    if kind == "fuzzy":
        # ES spellings: {"fuzzy": {"field": f, "value": v, "fuzziness": ..}}
        # / {"fuzzy": {f: v}} / {"fuzzy": {f: {"value": v, "fuzziness": ..}}}
        f, v = _field_value(body)
        opts = body
        if isinstance(v, dict):
            opts = v
            v = v.get("value", v.get("term"))
        if v is None:
            raise QueryParseError(f"fuzzy needs a value: {body!r}")
        val = str(v).lower()
        fz = resolve_fuzziness(
            opts.get("fuzziness", body.get("fuzziness", "AUTO")), len(val)
        )
        pl = int(opts.get("prefix_length", body.get("prefix_length", 0)))
        if fz == 0:
            return Term(f, val)  # distance 0 == exact term
        return Fuzzy(f, val, fz, pl)

    if kind == "regexp":
        f, v = _field_value(body)
        if isinstance(v, dict):
            v = v.get("value")
        if v is None:
            raise QueryParseError(f"regexp needs a value: {body!r}")
        # the PATTERN is not lowercased (char classes / escapes like \W are
        # case-significant); indexed terms are analyzer-lowercased, so
        # uppercase literals in a pattern simply never match — ES behaves
        # the same for analyzed fields.
        return Regexp(f, str(v))

    if kind == "ids":
        # ES IdsQueryParser: {"ids": {"values": [...], "type": ...}} —
        # "type"/"types" accepted and ignored (one doc type per batch, the
        # reference percolates a single mapping type per request). Numeric
        # ids coerce to their canonical string (ES _id is a string).
        from .query_plan import canonical_id

        # only "values" (a list) is legal — ES IdsQueryParser rejects a
        # singular "value" key and bare scalars; staying strict keeps a
        # malformed registration failing here exactly as it would there
        vals = body.get("values")
        if vals is None or not isinstance(vals, (list, tuple)):
            raise QueryParseError(f"ids needs a values list: {body!r}")
        svals = tuple(sorted({canonical_id(v) for v in vals}))
        if not svals:
            return MatchNone()  # IdsQueryParser with no ids matches nothing
        return Ids(svals)

    if kind == "exists":
        if "field" not in body:
            raise QueryParseError(f"exists needs a field: {body!r}")
        return Exists(body["field"])

    if kind == "constant_score":
        # non-scoring wrapper -> Bool FILTER (Q5 filter-context semantics);
        # the wrapped query's boost-as-score is not modeled (matching is
        # identical; percolation responses carry BM25 scores only when
        # with_scores is on)
        inner = body.get("filter", body.get("query"))
        if inner is None:
            raise QueryParseError(f"constant_score needs filter/query: {body!r}")
        return Bool(filter=(compile_query(inner),))

    if kind == "match_phrase_prefix":
        f, v = _field_value(body, "query")
        toks = _analyze(v)
        if not toks:
            return MatchNone()
        # last analyzed token becomes a prefix producer; wildcard chars in
        # the token itself keep their wildcard meaning (our Wildcard has no
        # escape syntax) — a documented over-match for tokens containing
        # literal * / ?
        last = Wildcard(f, toks[-1] + "*")
        if len(toks) == 1:
            return last
        return WildcardPhrase(
            f, tuple(Term(f, t) for t in toks[:-1]) + (last,)
        )

    if kind in ("query_string", "simple_query_string"):
        qtext = body.get("query") if isinstance(body, dict) else body
        if qtext is None:
            raise QueryParseError(f"query_string needs query: {body!r}")
        return parse_query_string(
            str(qtext),
            default_field=body.get("default_field", DEFAULT_FIELD)
            if isinstance(body, dict)
            else DEFAULT_FIELD,
            default_operator=str(
                body.get("default_operator", "or")
            ).lower()
            if isinstance(body, dict)
            else "or",
        )

    if kind in ("phrase", "match_phrase"):
        if "terms" in body:
            f = body.get("field", DEFAULT_FIELD)
            toks = [t.lower() for t in body["terms"]]
            slop = int(body.get("slop", 0))
            bst = _boost_of(body)
        else:
            f, v = _field_value(body, "query")
            bst = _boost_of(body, v)
            if isinstance(v, dict):
                # ES long form {f: {"query": q, "slop": n, "boost": b}}
                slop = int(v.get("slop", 0))
                v = v.get("query")
                if v is None:
                    raise QueryParseError(f"{kind} needs a query: {body!r}")
            else:
                slop = int(body.get("slop", 0)) if "slop" in body else 0
            toks = _analyze(v)
        if not toks:
            return MatchNone()
        if len(toks) == 1:
            return Term(f, toks[0], boost=bst)
        return Phrase(f, tuple(toks), slop, boost=bst)

    if kind == "wildcard":
        f, v = _field_value(body)
        return Wildcard(f, str(_unwrap_value(v, kind)).lower())

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
                    msm=_msm_from(body, len(shoulds)) if shoulds else 0,
                    boost=_boost_of(body))
        if plan.msm > len(plan.should):
            # Lucene: minimumNumberShouldMatch above the optional-clause
            # count can never be satisfied
            return MatchNone()
        if not (plan.must or plan.should or plan.must_not or plan.filter):
            return MatchAll()
        return plan

    if kind == "span_term":
        f, v = _field_value(body)
        return SpanTerm(f, str(_unwrap_value(v, kind)).lower())

    if kind == "span_near":
        clauses = tuple(compile_query(c) for c in body["clauses"])
        return SpanNear(clauses, int(body.get("slop", 0)), bool(body.get("in_order", True)))

    if kind == "span_or":
        return SpanOr(tuple(compile_query(c) for c in body["clauses"]))

    if kind == "span_not":
        return SpanNot(compile_query(body["include"]), compile_query(body["exclude"]))

    if kind == "span_first":
        return SpanFirst(compile_query(body["match"]), int(body["end"]))

    if kind == "span_multi":
        # SpanMultiTermQueryWrapper: the wrapped multi-term query (wildcard
        # / prefix / fuzzy / regexp) evaluates positionally inside span
        # contexts — our spans_of handles those atoms directly, so the
        # wrapper compiles away
        inner = compile_query(body["match"])
        if not isinstance(inner, (Wildcard, Fuzzy, Regexp, Term)):
            raise QueryParseError(
                f"span_multi wraps a multi-term query, got {inner!r}"
            )
        return inner

    if kind == "dis_max":
        # ES DisMaxQueryParser: matches iff ANY subquery matches — the
        # disjunction rewrite is EXACT for matching. Scoring in ES is
        # max(sub) + tie_breaker*rest; percolation responses here score
        # BM25 over the union of match terms (documented approximation,
        # same contract as constant_score). The reference accepts dis_max
        # because it delegates to the full IndexQueryParserService
        # (BatchPercolatorQueriesRegistry.java:187-206) and its limiting
        # filter passes unknown types through
        # (LimitingFilterFactory.java:56-77).
        subs = body.get("queries")
        if not isinstance(subs, (list, tuple)) or not subs:
            raise QueryParseError(f"dis_max needs a queries list: {body!r}")
        plans = tuple(compile_query(s) for s in subs)
        if len(plans) == 1:
            return plans[0]
        return Bool(should=plans, msm=1)

    if kind == "boosting":
        # ES BoostingQueryParser: the negative clause only DEMOTES score —
        # it never excludes — so matching is exactly the positive clause.
        if "positive" not in body:
            raise QueryParseError(f"boosting needs a positive clause: {body!r}")
        return compile_query(body["positive"])

    if kind == "common":
        # ES 1.x CommonTermsQueryParser ({"common": {field: {"query": ...,
        # "cutoff_frequency": ...}}}). Frequency-splitting is a SCORING
        # optimization: with every term treated as low-frequency the query
        # degrades to the analyzed disjunction with minimum_should_match —
        # a superset match of ES's (high-freq terms there become
        # must-if-no-low-freq-matches). Documented over-match; exact when
        # no term crosses the cutoff.
        if not isinstance(body, dict) or len(body) != 1:
            raise QueryParseError(f"common needs one field object: {body!r}")
        f, spec = next(iter(body.items()))
        if not isinstance(spec, dict) or "query" not in spec:
            raise QueryParseError(f"common needs a query: {spec!r}")
        toks = _analyze(spec["query"])
        if not toks:
            return MatchNone()
        msm_spec = spec.get("minimum_should_match")
        if isinstance(msm_spec, dict):  # {"low_freq": ..., "high_freq": ...}
            msm_spec = msm_spec.get("low_freq")
        op = str(spec.get("low_freq_operator", "or")).lower()
        if len(toks) == 1:
            return Term(f, toks[0])
        terms = tuple(Term(f, t) for t in toks)
        if op == "and":
            return Bool(must=terms)
        msm = (
            _msm_from({"minimum_should_match": msm_spec}, len(terms))
            if msm_spec is not None
            else 1
        )
        if msm > len(terms):
            return MatchNone()
        return Bool(should=terms, msm=msm)

    if kind == "filtered":
        # ES 1.x FilteredQueryParser — the pre-2.x spelling of bool
        # {must, filter}; either part may be absent (defaults match_all)
        inner_q = body.get("query")
        inner_f = body.get("filter")
        if inner_q is None and inner_f is None:
            raise QueryParseError(f"filtered needs query and/or filter: {body!r}")
        return Bool(
            must=(compile_query(inner_q),) if inner_q is not None else (),
            filter=(compile_query(inner_f),) if inner_f is not None else (),
        )

    if kind in _UNSUPPORTED_TYPES:
        # legal registrations in the reference (full IndexQueryParserService)
        # that this engine rejects by DESIGN — geo/percolator-metadata/
        # scripted scoring have no analog over the batch schema. Raising a
        # typed error with the documented list keeps the failure at
        # registration time, the same place the reference would fail a
        # query over an unmapped geo field.
        raise QueryParseError(
            f"query type {kind!r} is documented-unsupported "
            f"(see COVERAGE.md §DSL): {sorted(_UNSUPPORTED_TYPES)}"
        )

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


def resolve_fuzziness(spec, term_len: int) -> int:
    """ES Fuzziness spec -> max edit distance for a term of ``term_len``.

    ``"AUTO"`` (and ``"AUTO:lo,hi"``) follows Lucene's auto ladder: 0 edits
    below ``lo`` chars, 1 from ``lo`` to ``hi``-1, 2 at ``hi``+ (defaults
    3,6). Integers pass through; Lucene supports at most distance 2
    (LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE), larger specs raise."""
    if isinstance(spec, bool):
        raise QueryParseError(f"invalid fuzziness: {spec!r}")
    if isinstance(spec, (int, float)):
        fz = int(spec)
    else:
        s = str(spec).strip()
        if s.upper().startswith("AUTO"):
            lo, hi = 3, 6
            if ":" in s:
                try:
                    lo_s, hi_s = s.split(":", 1)[1].split(",")
                    lo, hi = int(lo_s), int(hi_s)
                except ValueError:
                    raise QueryParseError(f"invalid fuzziness: {spec!r}")
            return 0 if term_len < lo else (1 if term_len < hi else 2)
        try:
            fz = int(s)
        except ValueError:
            raise QueryParseError(f"invalid fuzziness: {spec!r}")
    if not 0 <= fz <= 2:
        raise QueryParseError(
            f"fuzziness must be 0..2 (Lucene's supported range), got {fz}"
        )
    return fz


# ---- query_string mini-language ------------------------------------------
#
# The reference's registered queries go through the full ES query parser,
# so `query_string` bodies are legal registrations. We implement the
# classic-QueryParser core as a conventional lexer + recursive-descent
# parser producing the SAME plan algebra as the structured DSL:
#
#     clause   := or_expr
#     or_expr  := and_expr ("OR" and_expr)*
#     and_expr := unary (["AND"] unary)*      adjacent = default_operator
#     unary    := ("NOT" | "+" | "-") unary | primary
#     primary  := "(" clause ")" | field ":" primary | STRING | TERM
#     STRING   := '"..."' ["~" slop]          -> phrase
#     TERM     := token ["~" [fuzz]]          -> term / wildcard / fuzzy
#     range    := field ":" "[" a "TO" b "]"  -> numeric range (inclusive)
#
# NOT binds tightest, then AND, then OR (documented precedence; Lucene's
# classic parser flattens mixed operators into one BooleanQuery, a
# widely-documented surprise we deliberately do not reproduce).

_QS_TOKEN = _re.compile(
    r"""\s*(?:
        (?P<lparen>\() | (?P<rparen>\)) |
        (?P<lbrack>\[) | (?P<rbrack>\]) |
        (?P<colon>:) |
        (?P<plus>\+) | (?P<minus>-) |
        (?P<quoted>"(?P<qbody>[^"]*)"(?:~(?P<slop>\d+))?) |
        (?P<term>[^\s()\[\]:"+]+)
    )""",
    _re.VERBOSE,
)


def _qs_lex(s: str) -> list[tuple[str, object]]:
    out: list[tuple[str, object]] = []
    pos = 0
    while pos < len(s):
        m = _QS_TOKEN.match(s, pos)
        if m is None:
            if s[pos:].strip() == "":
                break
            raise QueryParseError(f"query_string: cannot lex at {s[pos:]!r}")
        pos = m.end()
        if m.group("quoted") is not None:
            out.append(("phrase", (m.group("qbody"), int(m.group("slop") or 0))))
        elif m.group("term") is not None:
            out.append(("term", m.group("term")))
        else:
            for name in ("lparen", "rparen", "lbrack", "rbrack", "colon",
                         "plus", "minus"):
                if m.group(name) is not None:
                    out.append((name, m.group(name)))
                    break
    return out


class _QSParser:
    def __init__(self, toks: list, default_field: str, default_op: str):
        self.toks = toks
        self.i = 0
        self.default_op = default_op
        self.field_stack = [default_field]

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def take(self):
        t = self.peek()
        self.i += 1
        return t

    def parse(self) -> Plan:
        p = self.or_expr()
        if self.peek()[0] is not None:
            raise QueryParseError(
                f"query_string: trailing tokens at {self.toks[self.i:]!r}"
            )
        return p

    def or_expr(self) -> Plan:
        parts = [self.and_expr()]
        while self.peek() == ("term", "OR"):
            self.take()
            parts.append(self.and_expr())
        if len(parts) == 1:
            return parts[0]
        return Bool(should=tuple(parts), msm=1)

    def and_expr(self) -> Plan:
        def boundary(tok):
            k, v = tok
            return k is None or k in ("rparen",) or (k == "term" and v == "OR")

        first = self.unary()
        groups: list[tuple[str, Plan]] = [first]
        while not boundary(self.peek()):
            if self.peek() == ("term", "AND"):
                self.take()
                groups.append(("must", self._unary_plan()))
            else:
                groups.append(self.unary())
        if len(groups) == 1:
            mode, plan = groups[0]
            if mode == "plain":
                return plan
        must, should, must_not = [], [], []
        explicit_and = any(m == "must" for m, _ in groups)
        for mode, plan in groups:
            if mode == "not":
                must_not.append(plan)
            elif mode == "req" or mode == "must":
                must.append(plan)
            elif self.default_op == "and" or explicit_and:
                # one explicit AND makes the whole conjunction required —
                # the least-surprising reading; document divergence from
                # the classic parser's per-pair behavior
                must.append(plan)
            else:
                should.append(plan)
        if len(groups) == 1 and must_not:
            return Bool(must_not=tuple(must_not))
        return Bool(
            must=tuple(must),
            should=tuple(should),
            must_not=tuple(must_not),
            msm=1 if should else 0,
        )

    def _unary_plan(self) -> Plan:
        mode, plan = self.unary()
        if mode == "not":
            return Bool(must_not=(plan,))
        return plan

    def unary(self) -> tuple[str, Plan]:
        k, v = self.peek()
        if k == "term" and v == "NOT":
            self.take()
            return ("not", self._unary_plan())
        if k == "minus":
            self.take()
            return ("not", self._unary_plan())
        if k == "plus":
            self.take()
            return ("req", self._unary_plan())
        return ("plain", self.primary())

    def primary(self) -> Plan:
        k, v = self.take()
        field = self.field_stack[-1]
        if k == "lparen":
            p = self.or_expr()
            if self.take()[0] != "rparen":
                raise QueryParseError("query_string: unbalanced parens")
            return p
        if k == "phrase":
            text, slop = v
            toks = _analyze(text)
            if not toks:
                return MatchNone()
            if len(toks) == 1:
                return Term(field, toks[0])
            return Phrase(field, tuple(toks), slop)
        if k == "lbrack":
            return self._range(field)
        if k == "term":
            if self.peek()[0] == "colon":
                self.take()
                self.field_stack.append(v)
                try:
                    nk = self.peek()[0]
                    if nk == "lbrack":
                        self.take()
                        return self._range(v)
                    return self.primary()
                finally:
                    self.field_stack.pop()
            return self._term_plan(field, v)
        raise QueryParseError(f"query_string: unexpected token {(k, v)!r}")

    def _range(self, field: str) -> Plan:
        # consumed "["; expect  a TO b ]  with * as an open endpoint
        def endpoint(tok):
            if tok[0] != "term":
                raise QueryParseError("query_string: bad range endpoint")
            if tok[1] == "*":
                return None
            try:
                return float(tok[1])
            except ValueError:
                raise QueryParseError(
                    f"query_string: numeric range endpoints only, got {tok[1]!r}"
                )

        lo = endpoint(self.take())
        if self.take() != ("term", "TO"):
            raise QueryParseError("query_string: range needs 'TO'")
        hi = endpoint(self.take())
        if self.take()[0] != "rbrack":
            raise QueryParseError("query_string: unclosed range")
        return Range(field, gte=lo, lte=hi)

    def _term_plan(self, field: str, raw: str) -> Plan:
        fuzz = None
        if "~" in raw:
            base, _, f_s = raw.rpartition("~")
            if base:
                fuzz = f_s if f_s else "AUTO"
                raw = base
        tok = raw.lower()
        if fuzz is not None:
            fz = resolve_fuzziness(fuzz, len(tok))
            return Term(field, tok) if fz == 0 else Fuzzy(field, tok, fz)
        if "*" in tok or "?" in tok:
            return Wildcard(field, tok)
        toks = _analyze(tok)
        if not toks:
            return MatchNone()
        return Term(field, toks[0])


def parse_query_string(
    query: str, default_field: str = DEFAULT_FIELD, default_operator: str = "or"
) -> Plan:
    """Compile a classic-QueryParser-style string to the plan algebra."""
    toks = _qs_lex(query)
    if not toks:
        return MatchNone()
    return _QSParser(toks, default_field, default_operator).parse()
