"""Query plan dataclasses — the engine's logical query algebra.

Covers the query types the reference handles (SURVEY.md §2.3, Q1-Q14):
term, bool(must/should/must_not/filter), phrase, wildcard, wildcard-phrase
(the reference's custom Lucene extension, WildcardPhraseQuery.java:20-83),
span near/or/not (LimitingFilterFactory.java:80-102), match_all, numeric
range. Nested block-join (Q10) is documented-unsupported for the flat code
corpus.

Plans are frozen dataclasses → hashable, serializable via to_dict/from_dict
(queries are registered as JSON rows in the queries table, mirroring the
reference storing them as ~ypercolator docs,
BatchPercolatorQueriesRegistry.java:270-313).
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Plan:
    """Marker base class."""

    def to_dict(self) -> dict:
        raise NotImplementedError


@dataclass(frozen=True)
class Term(Plan):
    #: ``boost`` is a SCORING weight only (Lucene per-clause boost,
    #: inherited by the reference via queryParserService.parse) — matching
    #: is boost-free everywhere; positive_term_weights() folds path boosts
    #: into the BM25 term weight map. Default 1.0 keeps equality/pickle
    #: compatible with boost-free construction.
    field: str
    value: str
    boost: float = 1.0

    def to_dict(self):
        d = {"term": {"field": self.field, "value": self.value}}
        if self.boost != 1.0:
            d["term"]["boost"] = self.boost
        return d


@dataclass(frozen=True)
class Wildcard(Plan):
    """Pattern with ``*`` (any run) and ``?`` (one char), Lucene-style."""

    field: str
    pattern: str

    def to_dict(self):
        return {"wildcard": {"field": self.field, "value": self.pattern}}


@dataclass(frozen=True)
class Phrase(Plan):
    """Terms at consecutive positions (slop generalizes adjacency)."""

    field: str
    terms: tuple[str, ...]
    slop: int = 0
    boost: float = 1.0  # scoring weight only, see Term.boost

    def to_dict(self):
        d = {"phrase": {"field": self.field, "terms": list(self.terms), "slop": self.slop}}
        if self.boost != 1.0:
            d["phrase"]["boost"] = self.boost
        return d


@dataclass(frozen=True)
class WildcardPhrase(Plan):
    """Phrase where each position is a term-set producer: literal or wildcard
    (reference TermsProducer family, TermTermsProducer.java / WildcardTermsProducer.java)."""

    field: str
    producers: tuple[Plan, ...]  # each Term or Wildcard

    def to_dict(self):
        return {"wildcard_phrase": {"field": self.field, "producers": [p.to_dict() for p in self.producers]}}


@dataclass(frozen=True)
class Bool(Plan):
    """``msm`` is Lucene's minimumNumberShouldMatch (ES 1.7
    ``minimum_should_match``, honored by the reference's phase-2
    BooleanQuery). 0 = default semantics: shoulds are optional when
    must/filter exist, else >=1 must match. ``effective_msm()`` folds
    that default in."""

    must: tuple[Plan, ...] = ()
    should: tuple[Plan, ...] = ()
    must_not: tuple[Plan, ...] = ()
    filter: tuple[Plan, ...] = ()
    msm: int = 0
    boost: float = 1.0  # scoring weight only (multiplies child weights)

    def effective_msm(self) -> int:
        if self.msm > 0:
            return self.msm
        if self.should and not (self.must or self.filter):
            return 1
        return 0

    def to_dict(self):
        d = {
            "bool": {
                "must": [p.to_dict() for p in self.must],
                "should": [p.to_dict() for p in self.should],
                "must_not": [p.to_dict() for p in self.must_not],
                "filter": [p.to_dict() for p in self.filter],
            }
        }
        if self.msm:
            d["bool"]["minimum_should_match"] = self.msm
        return d


@dataclass(frozen=True)
class SpanTerm(Plan):
    field: str
    value: str

    def to_dict(self):
        return {"span_term": {"field": self.field, "value": self.value}}


@dataclass(frozen=True)
class SpanNear(Plan):
    """Clauses within ``slop`` positions, optionally in order
    (reference spanNearFilter approximation, LimitingFilterFactory.java:214-220)."""

    clauses: tuple[Plan, ...]
    slop: int = 0
    in_order: bool = True

    def to_dict(self):
        return {
            "span_near": {
                "clauses": [c.to_dict() for c in self.clauses],
                "slop": self.slop,
                "in_order": self.in_order,
            }
        }


@dataclass(frozen=True)
class SpanOr(Plan):
    clauses: tuple[Plan, ...] = ()

    def to_dict(self):
        return {"span_or": {"clauses": [c.to_dict() for c in self.clauses]}}


@dataclass(frozen=True)
class SpanNot(Plan):
    """Matches of ``include`` whose span does not overlap a match of
    ``exclude`` (LimitingFilterFactory.spanNotFilter:222-224)."""

    include: Plan = None  # type: ignore[assignment]
    exclude: Plan = None  # type: ignore[assignment]

    def to_dict(self):
        return {"span_not": {"include": self.include.to_dict(), "exclude": self.exclude.to_dict()}}


@dataclass(frozen=True)
class MatchAll(Plan):
    def to_dict(self):
        return {"match_all": {}}


@dataclass(frozen=True)
class MatchNone(Plan):
    """Rewrite target for impossible queries (WildcardPhraseQuery.rewrite:51-61
    returns MatchNoDocsQuery when a position's term set is empty)."""

    def to_dict(self):
        return {"match_none": {}}


@dataclass(frozen=True)
class Nested(Plan):
    """Parent-child block join (Q10): the parent matches iff AT LEAST ONE
    child object under ``path`` satisfies ``query`` — child fields are
    scoped per child, so must-clauses must hold within the SAME child
    (the semantics ToParentBlockJoinQuery provides and the reference
    passes through, LimitingFilterFactory.java:68-72)."""

    path: str
    query: Plan = None  # type: ignore[assignment]

    def to_dict(self):
        return {"nested": {"path": self.path, "query": self.query.to_dict()}}


@dataclass(frozen=True)
class Range(Plan):
    """Numeric range — the reference's term-on-long-field becomes a
    RangeQuery via the mapping (ConcurrentPercolation.java:53-57)."""

    field: str
    gte: float | None = None
    lte: float | None = None

    def to_dict(self):
        return {"range": {"field": self.field, "gte": self.gte, "lte": self.lte}}


@dataclass(frozen=True)
class SpanFirst(Plan):
    """Lucene SpanFirstQuery: the ``match`` span must end within the first
    ``end`` positions (spans.end() <= end, with end() = last position + 1 —
    our inclusive span end must satisfy end_incl <= end - 1)."""

    match: Plan
    end: int

    def to_dict(self):
        return {"span_first": {"match": self.match.to_dict(), "end": self.end}}


@dataclass(frozen=True)
class Fuzzy(Plan):
    """Edit-distance term match: the doc matches iff some token of ``field``
    is within ``fuzziness`` PLAIN Levenshtein edits of ``value`` (and shares
    its first ``prefix_length`` chars). The reference accepts the full ES
    DSL (BatchPercolatorQueriesRegistry.parseQuery:187-204 delegates to
    IndexQueryParserService), whose fuzzy query is Lucene FuzzyQuery; we fix
    ``transpositions=false`` (a supported Lucene mode) so the Spark lane
    (``levenshtein``), the python evaluator, and the DuckDB oracle
    (``levenshtein``) agree on one metric. Like Wildcard, phase 1 expands
    the atom against the batch term dictionary — exact for flat token
    fields."""

    field: str
    value: str
    fuzziness: int = 1
    prefix_length: int = 0

    def to_dict(self):
        return {"fuzzy": {"field": self.field, "value": self.value,
                          "fuzziness": self.fuzziness,
                          "prefix_length": self.prefix_length}}


@dataclass(frozen=True)
class Regexp(Plan):
    """Whole-term (anchored) regex match, Lucene RegexpQuery semantics: the
    doc matches iff some token of ``field`` fully matches ``pattern``.
    Patterns are the Java/python/RE2 common core (literals, ``.``, classes,
    alternation, ``* + ?`` quantifiers, grouping) so the Spark ``RLIKE``
    lane, the python ``re.fullmatch`` evaluator, and the DuckDB
    ``regexp_full_match`` oracle agree. Expanded against the batch term
    dictionary in phase 1, like Wildcard."""

    field: str
    pattern: str

    def to_dict(self):
        return {"regexp": {"field": self.field, "value": self.pattern}}


@dataclass(frozen=True)
class Exists(Plan):
    """ES exists query: the doc has an indexed value for ``field`` — for
    analyzed (token) fields that means >=1 token (an empty/whitespace
    string analyzes to no tokens and is NOT indexed, matching Lucene),
    for numeric fields a non-null non-NaN value. Not term-joinable: like
    a pure-negation bool it is an all-docs candidate settled by phase-2
    verify."""

    field: str

    def to_dict(self):
        return {"exists": {"field": self.field}}


@dataclass(frozen=True)
class Ids(Plan):
    """ES ``ids`` query: the document's ``_id`` is one of ``values``
    (IdsQueryParser — a legal registration because the reference delegates
    to the full ES parser, BatchPercolatorQueriesRegistry.parseQuery:187-204).
    Ids compare as STRINGS (ES ``_id`` is a string; numeric batch id
    columns coerce via ``canonical_id``). Exact and sound under NOT, but
    not term-joinable: an all-docs phase-1 candidate settled by phase-2
    verify against the reserved ``_id`` pseudo-field the percolation
    runner injects from its ``id_col``."""

    values: tuple[str, ...]

    def to_dict(self):
        return {"ids": {"values": list(self.values)}}


def canonical_id(v) -> str:
    """Doc-id value → canonical string for ``Ids`` comparison. Integral
    floats print as integers (Arrow ships a nullable int64 column as
    float64, so id 5 can arrive as 5.0); everything else is ``str``."""
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


def fields_of(plan: Plan) -> set[str]:
    """All TOP-LEVEL document fields a plan touches (a Nested plan's child
    fields live inside the path's objects — the path is the doc field)."""
    if isinstance(
        plan,
        (Term, Wildcard, Phrase, WildcardPhrase, SpanTerm, Range,
         Fuzzy, Regexp, Exists),
    ):
        return {plan.field}
    if isinstance(plan, Ids):
        return {"_id"}
    if isinstance(plan, Nested):
        return {plan.path}
    if isinstance(plan, Bool):
        out: set[str] = set()
        for group in (plan.must, plan.should, plan.must_not, plan.filter):
            for p in group:
                out |= fields_of(p)
        return out
    if isinstance(plan, (SpanNear, SpanOr)):
        out = set()
        for c in plan.clauses:
            out |= fields_of(c)
        return out
    if isinstance(plan, SpanNot):
        return fields_of(plan.include) | fields_of(plan.exclude)
    if isinstance(plan, SpanFirst):
        return fields_of(plan.match)
    return set()


def positive_terms(plan: Plan) -> set[tuple[str, str]]:
    """(field, term) literals contributing positively to a match — the BM25
    scoring terms (must/should/phrase/span; never must_not or filter —
    FILTER is non-scoring, Q5). Nested children score under the PATH field
    (parent-side aggregation of child term hits)."""
    if isinstance(plan, (Term, SpanTerm)):
        return {(plan.field, plan.value)}
    if isinstance(plan, Nested):
        return {(plan.path, t) for _, t in positive_terms(plan.query)}
    if isinstance(plan, Phrase):
        return {(plan.field, t) for t in plan.terms}
    if isinstance(plan, WildcardPhrase):
        out: set[tuple[str, str]] = set()
        for p in plan.producers:
            if isinstance(p, Term):
                out.add((p.field, p.value))
        return out
    if isinstance(plan, Bool):
        out = set()
        for group in (plan.must, plan.should):
            for p in group:
                out |= positive_terms(p)
        return out
    if isinstance(plan, (SpanNear, SpanOr)):
        out = set()
        for c in plan.clauses:
            out |= positive_terms(c)
        return out
    if isinstance(plan, SpanNot):
        return positive_terms(plan.include)
    if isinstance(plan, SpanFirst):
        return positive_terms(plan.match)
    return set()


def positive_term_weights(plan: Plan, boost: float = 1.0) -> dict[tuple[str, str], float]:
    """(field, term) → BM25 term weight: the per-OCCURRENCE accumulation of
    path boosts over the positive literals. Lucene's BooleanQuery sums every
    clause, so a term appearing in two positive clauses (or twice in one)
    weights by its multiplicity — the qtf semantics the index scorers use
    (operators/wand.py) — and each occurrence carries the product of boosts
    from the root to its clause. A boost-free, repeat-free plan yields
    weight 1.0 for exactly positive_terms(plan)."""
    out: dict[tuple[str, str], float] = {}

    def add(f: str, t: str, w: float) -> None:
        out[(f, t)] = out.get((f, t), 0.0) + w

    def walk(p: Plan, b: float) -> None:
        if isinstance(p, Term):
            add(p.field, p.value, b * p.boost)
        elif isinstance(p, SpanTerm):
            add(p.field, p.value, b)
        elif isinstance(p, Nested):
            for (_, t), w in positive_term_weights(p.query, b).items():
                add(p.path, t, w)
        elif isinstance(p, Phrase):
            pb = b * p.boost
            for t in p.terms:
                add(p.field, t, pb)
        elif isinstance(p, WildcardPhrase):
            for pr in p.producers:
                if isinstance(pr, Term):
                    add(pr.field, pr.value, b)
        elif isinstance(p, Bool):
            bb = b * p.boost
            for group in (p.must, p.should):
                for c in group:
                    walk(c, bb)
        elif isinstance(p, (SpanNear, SpanOr)):
            for c in p.clauses:
                walk(c, b)
        elif isinstance(p, SpanNot):
            walk(p.include, b)
        elif isinstance(p, SpanFirst):
            walk(p.match, b)

    walk(plan, boost)
    return out


def _tuple_reduce(cls):
    """Constructor-tuple pickling for the frozen plan dataclasses: ~20%
    faster to unpickle and ~25% smaller than the default state-dict
    reduce — plan trees cross process boundaries constantly (verify-plan
    broadcasts, distributed registry compile, per-worker predicate
    compile), and a 225k-query registry holds ~10^6 of these objects."""
    import dataclasses as _dc

    names = [f.name for f in _dc.fields(cls)]

    def _reduce(self):
        return (cls, tuple(getattr(self, n) for n in names))

    return _reduce


for _cls in (
    Term, Wildcard, Phrase, WildcardPhrase, Bool, SpanTerm, SpanNear,
    SpanOr, SpanNot, SpanFirst, MatchAll, MatchNone, Nested, Range, Fuzzy,
    Regexp, Exists, Ids,
):
    _cls.__reduce__ = _tuple_reduce(_cls)
