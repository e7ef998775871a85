"""Exact plan evaluator over a tokenized document (pure Python).

This is the engine's phase-2 "verify" semantics in one place: the
percolation runner executes it inside an Arrow-vectorized pandas UDF over
candidate (query, doc) pairs only (mirroring the reference running the full
Lucene query only for queries that survived the limiting filter,
BatchPercolatorService.java:166,347-394), and the test suite uses it as the
independent oracle for the Catalyst predicate path (operators/match.py).

Documents are dicts: tokenized fields map to ``list[str]``; numeric fields
map to int/float (the reference's mapping-typed long fields, Q12).

Span semantics (engine-defined; the reference inherits Lucene's):
- span_term(t): spans = [(p, p)] for every position p of t.
- span_near(clauses, slop, in_order): one span per clause, pairwise
  non-overlapping, ordered iff in_order; total gap =
  (cover_end - cover_start + 1) - sum(len(span_i)) must be <= slop.
- span_or: union of clause spans.
- span_not(inc, exc): spans of inc not overlapping any span of exc.
- phrase(terms, slop): slop=0 → consecutive positions; slop>0 → LUCENE
  sloppy-phrase (edit-distance) semantics, matching the reference's
  inherited ``PhraseQuery`` behavior (flows through
  LimitingFilterFactory.java:177-192): the phrase matches iff one document
  position p_i can be assigned to each phrase occurrence i (query offset
  o_i, repeated terms take DISTINCT positions) such that
  ``max_i(p_i - o_i) - min_i(p_i - o_i) <= slop``. Terms may match out of
  order at slop >= 2 — a transposition costs 2 moves, so ``"b a"~2``
  matches the document ``a b`` exactly as in Lucene.
"""

from __future__ import annotations

import re
from bisect import bisect_left
from functools import lru_cache

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
    canonical_id,
)


@lru_cache(maxsize=4096)
def wildcard_regex(pattern: str) -> re.Pattern:
    """Lucene wildcard (* = any run, ? = one char) → anchored regex."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return re.compile("^" + "".join(out) + "$")


@lru_cache(maxsize=4096)
def regexp_regex(pattern: str) -> re.Pattern:
    """Anchored (whole-term) compile of a Regexp plan pattern — the
    fullmatch counterpart of Spark's ``RLIKE '^(?:p)$'`` and DuckDB's
    ``regexp_full_match``."""
    return re.compile(pattern)


def within_edits(a: str, b: str, maxd: int) -> bool:
    """Plain (non-transposing) Levenshtein distance <= maxd, banded: O(maxd)
    per row, early-exit when a full row exceeds the bound. Must agree
    exactly with Spark's ``levenshtein(a, b) <= maxd`` and DuckDB's
    ``levenshtein`` (all unit-cost, per code point)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > maxd:
        return False
    if la == 0 or lb == 0:
        return True  # length gap already checked
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        ca = a[i - 1]
        cur = [i] + [0] * lb
        lo = max(1, i - maxd)
        hi = min(lb, i + maxd)
        if lo > 1:
            cur[lo - 1] = maxd + 1  # outside the band
        best = maxd + 1
        for j in range(lo, hi + 1):
            cost = 0 if ca == b[j - 1] else 1
            v = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + cost,
            )
            cur[j] = v
            if v < best:
                best = v
        if hi < lb:
            cur[hi + 1 :] = [maxd + 1] * (lb - hi)
        if best > maxd:
            return False
        prev = cur
    return prev[lb] <= maxd


def fuzzy_pred(value: str, fuzziness: int, prefix_length: int):
    """token -> bool for a Fuzzy atom (shared by eval and highlight)."""
    pfx = value[: prefix_length]

    def pred(tok: str) -> bool:
        return tok.startswith(pfx) and within_edits(tok, value, fuzziness)

    return pred


def _tokens(doc: dict, field: str) -> list[str]:
    v = doc.get(field)
    return v if isinstance(v, (list, tuple)) else []


def sloppy_phrase_match(toks: list[str], terms: tuple, slop: int) -> bool:
    """Lucene SloppyPhraseScorer match decision (see module docstring).

    Sliding adjusted-position window: every candidate window left edge L is
    some occurrence's adjusted position; feasibility inside [L, L + slop]
    reduces per term to matching its query occurrences (intervals
    [L + o_i, L + slop + o_i], identical length, sorted) against its sorted
    document positions — the greedy smallest-available-position assignment
    is exact for same-length intervals. O(|positions| · k · log n), no
    combinatorial blowup on repeated common terms.
    """
    occ: dict[str, list[int]] = {}
    for o, t in enumerate(terms):
        occ.setdefault(t, []).append(o)
    pos_by_term: dict[str, list[int]] = {}
    for t in occ:
        plist = [i for i, x in enumerate(toks) if x == t]
        if len(plist) < len(occ[t]):
            return False  # not enough distinct positions for the repeats
        pos_by_term[t] = plist
    lefts = sorted(
        {p - o for t, offs in occ.items() for o in offs for p in pos_by_term[t]}
    )
    for L in lefts:
        ok = True
        for t, offs in occ.items():
            plist = pos_by_term[t]
            lo = 0  # chosen positions ascend with o: resume, never reuse
            for o in offs:  # offs ascend -> interval endpoints ascend
                idx = bisect_left(plist, L + o, lo)
                if idx >= len(plist) or plist[idx] > L + slop + o:
                    ok = False
                    break
                lo = idx + 1
            if not ok:
                break
        if ok:
            return True
    return False


def _producer_pred(p: Plan):
    if isinstance(p, Term):
        v = p.value
        return lambda t: t == v
    if isinstance(p, Wildcard):
        rx = wildcard_regex(p.pattern)
        return lambda t: rx.match(t) is not None
    raise TypeError(f"not a producer: {p!r}")


def spans_of(plan: Plan, doc: dict) -> list[tuple[int, int]]:
    """Inclusive (start, end) position spans of a span-family plan."""
    if isinstance(plan, (SpanTerm, Term)):
        toks = _tokens(doc, plan.field)
        return [(i, i) for i, t in enumerate(toks) if t == plan.value]
    if isinstance(plan, Wildcard):
        rx = wildcard_regex(plan.pattern)
        toks = _tokens(doc, plan.field)
        return [(i, i) for i, t in enumerate(toks) if rx.match(t)]
    if isinstance(plan, Fuzzy):
        pred = fuzzy_pred(plan.value, plan.fuzziness, plan.prefix_length)
        toks = _tokens(doc, plan.field)
        return [(i, i) for i, t in enumerate(toks) if pred(t)]
    if isinstance(plan, Regexp):
        rx = regexp_regex(plan.pattern)
        toks = _tokens(doc, plan.field)
        return [(i, i) for i, t in enumerate(toks) if rx.fullmatch(t)]
    if isinstance(plan, SpanFirst):
        # Lucene: spans.end() <= end, end() = inclusive end + 1
        return [s for s in spans_of(plan.match, doc) if s[1] + 1 <= plan.end]
    if isinstance(plan, SpanOr):
        out: list[tuple[int, int]] = []
        for c in plan.clauses:
            out.extend(spans_of(c, doc))
        return sorted(set(out))
    if isinstance(plan, SpanNot):
        inc = spans_of(plan.include, doc)
        exc = spans_of(plan.exclude, doc)
        return [
            s for s in inc
            if not any(not (s[1] < e[0] or e[1] < s[0]) for e in exc)
        ]
    if isinstance(plan, SpanNear):
        per_clause = [spans_of(c, doc) for c in plan.clauses]
        if any(not s for s in per_clause):
            return []
        out = []

        def rec(i: int, chosen: list[tuple[int, int]]):
            if i == len(per_clause):
                cover = (min(s[0] for s in chosen), max(s[1] for s in chosen))
                width = cover[1] - cover[0] + 1
                total = sum(e - s + 1 for s, e in chosen)
                if width - total <= plan.slop:
                    out.append(cover)
                return
            for s in per_clause[i]:
                ok = True
                for c in chosen:
                    if not (s[1] < c[0] or c[1] < s[0]):
                        ok = False  # overlap
                        break
                if ok and plan.in_order and chosen and s[0] <= chosen[-1][1]:
                    ok = False
                if ok:
                    rec(i + 1, chosen + [s])

        rec(0, [])
        return sorted(set(out))
    raise TypeError(f"not a span plan: {plan!r}")


def eval_plan(plan: Plan, doc: dict) -> bool:
    if isinstance(plan, MatchAll):
        return True
    if isinstance(plan, MatchNone):
        return False
    if isinstance(plan, Term):
        return plan.value in _tokens(doc, plan.field)
    if isinstance(plan, Wildcard):
        rx = wildcard_regex(plan.pattern)
        return any(rx.match(t) for t in _tokens(doc, plan.field))
    if isinstance(plan, Fuzzy):
        pred = fuzzy_pred(plan.value, plan.fuzziness, plan.prefix_length)
        return any(pred(t) for t in _tokens(doc, plan.field))
    if isinstance(plan, Regexp):
        rx = regexp_regex(plan.pattern)
        return any(rx.fullmatch(t) for t in _tokens(doc, plan.field))
    if isinstance(plan, Exists):
        v = doc.get(plan.field)
        if isinstance(v, (list, tuple)):
            return len(v) > 0  # analyzed field: indexed iff >=1 token
        return v is not None and v == v  # non-null, non-NaN scalar
    if isinstance(plan, Ids):
        v = doc.get("_id")
        if v is None or isinstance(v, (list, tuple)):
            return False
        return canonical_id(v) in plan.values
    if isinstance(plan, Range):
        v = doc.get(plan.field)
        if v is None or isinstance(v, (list, tuple)) or v != v:
            return False  # v != v catches NaN (Arrow's nullable-int repr)
        if plan.gte is not None and v < plan.gte:
            return False
        if plan.lte is not None and v > plan.lte:
            return False
        return True
    if isinstance(plan, Phrase):
        toks = _tokens(doc, plan.field)
        k = len(plan.terms)
        if plan.slop == 0:
            return any(
                tuple(toks[i : i + k]) == plan.terms for i in range(len(toks) - k + 1)
            )
        return sloppy_phrase_match(toks, plan.terms, plan.slop)
    if isinstance(plan, WildcardPhrase):
        toks = _tokens(doc, plan.field)
        preds = [_producer_pred(p) for p in plan.producers]
        k = len(preds)
        return any(
            all(preds[j](toks[i + j]) for j in range(k))
            for i in range(len(toks) - k + 1)
        )
    if isinstance(plan, Nested):
        kids = doc.get(plan.path)
        if not isinstance(kids, (list, tuple)):
            return False
        return any(
            eval_plan(plan.query, k) for k in kids if isinstance(k, dict)
        )
    if isinstance(plan, (SpanTerm, SpanNear, SpanOr, SpanNot, SpanFirst)):
        return bool(spans_of(plan, doc))
    if isinstance(plan, Bool):
        for c in plan.must:
            if not eval_plan(c, doc):
                return False
        for c in plan.filter:
            if not eval_plan(c, doc):
                return False
        for c in plan.must_not:
            if eval_plan(c, doc):
                return False
        need = plan.effective_msm()
        if need:
            hits = 0
            for c in plan.should:
                if eval_plan(c, doc):
                    hits += 1
                    if hits >= need:
                        return True
            return False
        return True
    raise TypeError(f"cannot evaluate {plan!r}")


_EMPTY_VIEW: tuple[list, frozenset] = ([], frozenset())


def compile_predicate_fields(plan: Plan):
    """plan → ``(fieldmap) -> bool`` closure over MULTI-FIELD documents.

    ``fieldmap`` maps query field name → ``(tokens_list, token_set)`` for
    analyzed text fields or a scalar for numeric fields (Range targets). A
    field absent from the map behaves as an empty field (no tokens — the ES
    semantics for querying a field the doc doesn't have).

    The percolation phase-2 UDF calls the evaluator once per surviving
    (query, doc) pair; pre-compiling removes the per-row dataclass walk,
    and the caller-supplied token SETS make term membership O(1) — they are
    built once per DOC, amortized over every query verified against it.
    Semantics are eval_plan's exactly (asserted by tests side by side).
    """
    if isinstance(plan, MatchAll):
        return lambda fm: True
    if isinstance(plan, MatchNone):
        return lambda fm: False
    if isinstance(plan, Term):
        v, f = plan.value, plan.field
        return lambda fm: v in fm.get(f, _EMPTY_VIEW)[1]
    if isinstance(plan, Wildcard):
        rx = wildcard_regex(plan.pattern)
        f = plan.field
        return lambda fm: any(rx.match(t) for t in fm.get(f, _EMPTY_VIEW)[1])
    if isinstance(plan, Range):
        f, gte, lte = plan.field, plan.gte, plan.lte

        def range_pred(fm):
            v = fm.get(f)
            # v != v catches NaN — Arrow ships a NULL long as float NaN,
            # which would otherwise slip past both bound comparisons
            if v is None or isinstance(v, (tuple, list)) or v != v:
                return False
            if gte is not None and v < gte:
                return False
            if lte is not None and v > lte:
                return False
            return True

        return range_pred
    if isinstance(plan, Ids):
        vals = frozenset(plan.values)

        def ids_pred(fm):
            v = fm.get("_id")
            if v is None or isinstance(v, (tuple, list)):
                return False
            return canonical_id(v) in vals

        return ids_pred
    if isinstance(plan, Phrase) and plan.slop == 0:
        terms = plan.terms
        f = plan.field
        first = terms[0]
        k = len(terms)
        if k == 1:
            return lambda fm: first in fm.get(f, _EMPTY_VIEW)[1]
        rest = terms[1:]
        all_terms = frozenset(terms)

        def phrase_pred(fm):
            toks, tset = fm.get(f, _EMPTY_VIEW)
            if not all_terms <= tset:
                return False
            n = len(toks)
            i = 0
            while True:
                try:
                    i = toks.index(first, i, n - k + 1)
                except ValueError:
                    return False
                ok = True
                for j, t in enumerate(rest, start=1):
                    if toks[i + j] != t:
                        ok = False
                        break
                if ok:
                    return True
                i += 1

        return phrase_pred
    if isinstance(plan, Bool):
        musts = [compile_predicate_fields(c) for c in plan.must]
        filters = [compile_predicate_fields(c) for c in plan.filter]
        must_nots = [compile_predicate_fields(c) for c in plan.must_not]
        shoulds = [compile_predicate_fields(c) for c in plan.should]
        need_should = plan.effective_msm()

        def bool_pred(fm):
            for p in musts:
                if not p(fm):
                    return False
            for p in filters:
                if not p(fm):
                    return False
            for p in must_nots:
                if p(fm):
                    return False
            if need_should:
                hits = 0
                for p in shoulds:
                    if p(fm):
                        hits += 1
                        if hits >= need_should:
                            return True
                return False
            return True

        return bool_pred

    # sloppy phrase / wildcard-phrase / spans: generic walk over a plain
    # field→tokens dict (rebuilt per call — positional plans are the
    # documented slow path)
    def generic(fm, _p=plan):
        doc = {
            f: (v[0] if isinstance(v, tuple) else v) for f, v in fm.items()
        }
        return eval_plan(_p, doc)

    return generic


def compile_predicate(plan: Plan, field: str):
    """Single-field convenience wrapper: ``(tokens_list, token_set) -> bool``
    where EVERY text field the plan references resolves to the given tokens
    (the flat single-content-column mode of operators/percolate.py)."""
    from .query_plan import fields_of

    inner = compile_predicate_fields(plan)
    fields = fields_of(plan) | {field}

    def pred(toks, tset):
        view = (toks, tset)
        return inner({f: view for f in fields})

    return pred
