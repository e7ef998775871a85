"""Limiting filter: cheap over-approximation of any plan (phase 1 of 2).

Re-expression of the reference's signature optimization,
``LimitingFilterFactory.limitingFilter`` (LimitingFilterFactory.java:47-253).
Contract (class comment :29-45): in a NON-negated context the approximation
may match MORE docs than the real query, never fewer; inside a negation only
EXACT rewrites are sound (an over-approximation under NOT would exclude true
matches), so lossy rewrites return None there — None = "cannot approximate,
always run phase 2" (the reference's ``Optional.absent()``).

Rules (mirroring :56-232):
- negated context → the exact rewrite of the plan, or None.
- Term / Wildcard / Range / MatchAll / MatchNone → itself (exact).
- Phrase → AND of its terms; 1-term → Term (exact) (:177-192).
- WildcardPhrase → AND of all its producers' presence tests (sound: a phrase
  match implies each producer matched some token); 1-producer → the producer
  (exact) (:194-212).
- SpanTerm → Term (exact). SpanNear → AND of clause approxes; SpanOr → OR;
  SpanNot → approx(include) (:80-102, 214-232).
- Bool → recurse with negation tracking (:104-152): non-approximable MUST /
  FILTER clauses are dropped (superset stays sound); must_not kept only when
  exactly rewritable, else dropped; SHOULD-only bools need every should
  approximable (a lost should could hide matches) else None.
"""

from __future__ import annotations

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

# Fuzzy / Regexp are exact presence atoms like Wildcard: phase 1 expands
# them against the batch term dictionary, so "some expanded term present"
# IS the match. Exists / Ids are exact-but-not-term-joinable, like Range:
# they survive the rewrite (sound under NOT) and _flatten_groups drops them.
_EXACT_ATOMS = (
    Term, Wildcard, Fuzzy, Regexp, Range, Exists, Ids, MatchAll, MatchNone
)


def exact_rewrite(plan: Plan) -> Plan | None:
    """The presence-test rewrite of ``plan`` when it is NOT lossy, else None."""
    if isinstance(plan, _EXACT_ATOMS):
        return plan
    if isinstance(plan, SpanTerm):
        return Term(plan.field, plan.value)
    if isinstance(plan, Phrase) and len(plan.terms) == 1:
        return Term(plan.field, plan.terms[0])
    if isinstance(plan, WildcardPhrase) and len(plan.producers) == 1:
        return plan.producers[0]
    if isinstance(plan, Bool):
        groups = {}
        for name in ("must", "should", "must_not", "filter"):
            out = []
            for c in getattr(plan, name):
                e = exact_rewrite(c)
                if e is None:
                    return None
                out.append(e)
            groups[name] = tuple(out)
        # msm must survive an EXACT rewrite: dropping it widens the plan,
        # and exact_rewrite's output is used under NOT, where a widened
        # clause would exclude true matches (unsound).
        return Bool(msm=plan.msm, **groups)
    return None


def _strip_negations(plan: Plan) -> Plan | None:
    """Monotone-positive restriction of an approximation tree (None = no
    derivable positive constraint, i.e. matches everything). Dropping a
    conjunct or a whole should-group only WIDENS the approximation (sound);
    partially dropping members of a should/msm group would NARROW it
    (>=k of fewer options), so those are all-or-nothing."""
    if isinstance(plan, Bool):
        must = []
        for c in plan.must + plan.filter:
            p = _strip_negations(c)
            if p is not None:
                must.append(p)
        should: tuple[Plan, ...] = ()
        if plan.should:
            kept = []
            for c in plan.should:
                p = _strip_negations(c)
                if p is None:
                    kept = None  # one unconstrained disjunct: group vacuous
                    break
                kept.append(p)
            should = tuple(kept) if kept else ()
        if not (must or should):
            return None
        # msm only meaningful while the FULL group survives; a dropped
        # group must also drop its msm (Bool(msm=k, should=()) would
        # evaluate to never-match, the opposite of widening)
        return Bool(must=tuple(must), should=should,
                    msm=plan.msm if should else 0)
    if isinstance(plan, _EXACT_ATOMS):
        return plan
    return None  # unknown node: treat as unconstrained


def limiting_filter(plan: Plan, negated: bool = False) -> Plan | None:
    if negated:
        # an over-approximation under NOT would exclude true matches
        # (reference isNegated tracking, LimitingFilterFactory.java:122-127)
        return exact_rewrite(plan)

    if isinstance(plan, _EXACT_ATOMS):
        return plan

    if isinstance(plan, SpanTerm):
        return Term(plan.field, plan.value)

    if isinstance(plan, Phrase):
        if len(plan.terms) == 1:
            return Term(plan.field, plan.terms[0])
        return Bool(must=tuple(Term(plan.field, t) for t in plan.terms))

    if isinstance(plan, WildcardPhrase):
        if len(plan.producers) == 1:
            return plan.producers[0]
        return Bool(must=plan.producers)

    if isinstance(plan, SpanNear):
        approxes = [limiting_filter(c) for c in plan.clauses]
        kept = tuple(a for a in approxes if a is not None)
        return Bool(must=kept) if kept else None

    if isinstance(plan, SpanOr):
        approxes = [limiting_filter(c) for c in plan.clauses]
        if not approxes or any(a is None for a in approxes):
            return None  # one lost branch could hide matches
        return Bool(should=tuple(approxes))

    if isinstance(plan, SpanNot):
        return limiting_filter(plan.include)

    if isinstance(plan, SpanFirst):
        # presence of the match anywhere is a superset of "within the
        # first N positions"; lossy (never exact), so under NOT the
        # exact_rewrite default (None) correctly refuses it
        return limiting_filter(plan.match)

    if isinstance(plan, Nested):
        # the parent's flattened token stream (field = path) contains every
        # child's tokens, so "child exists with all terms" implies "parent
        # stream has all terms" — a sound over-approximation of the block
        # join (the reference runs the block-join query itself as phase 1,
        # LimitingFilterFactory.java:68-72; our flattened rewrite is the
        # Spark-joinable equivalent). Never exact: phase 2 always verifies.
        # Only the POSITIVE part of the child approx survives flattening:
        # child-has-t implies parent-stream-has-t, but child-LACKS-t does
        # NOT imply the parent stream lacks it (a sibling child may carry
        # it), so child-scope must_nots must be stripped, not remapped.
        child = limiting_filter(plan.query)
        if child is not None:
            child = _strip_negations(child)
        return _remap_fields(child, plan.path) if child is not None else None

    if isinstance(plan, Bool):
        must_approx = []
        for c in list(plan.must) + list(plan.filter):
            a = limiting_filter(c)
            if a is not None:
                must_approx.append(a)  # dropped clause = sound superset

        must_not_approx = []
        for c in plan.must_not:
            a = limiting_filter(c, negated=True)
            if a is not None:
                must_not_approx.append(a)  # drop inexact negations

        has_positive = bool(plan.must) or bool(plan.filter)
        if has_positive:
            if not must_approx:
                return None  # nothing cheap survived
            # minimum_should_match makes shoulds REQUIRED (>=k >= 1), so
            # the should group becomes a usable >=1-of-group gate; carry
            # msm=1 so eval/gating know the group is required (>=1 is the
            # widest sound weakening of >=k). All-or-nothing: one
            # unapproximable disjunct and the group must be dropped.
            should_approx: tuple = ()
            msm_flag = 0
            if plan.should and plan.effective_msm():
                sa = [limiting_filter(c) for c in plan.should]
                if all(a is not None for a in sa):
                    should_approx = tuple(sa)
                    msm_flag = 1
            return Bool(must=tuple(must_approx), should=should_approx,
                        must_not=tuple(must_not_approx), msm=msm_flag)
        if plan.should:
            approxes = [limiting_filter(c) for c in plan.should]
            if any(a is None for a in approxes):
                return None
            return Bool(should=tuple(approxes), must_not=tuple(must_not_approx))
        if plan.must_not:
            # pure negation matches everything outside N — only exact
            # rewrites make a usable filter
            return Bool(must_not=tuple(must_not_approx)) if must_not_approx else None
        return MatchAll()

    return None  # unknown plan type: always phase-2


def _remap_fields(plan: Plan, path: str) -> Plan:
    """Copy of ``plan`` with every field reference replaced by ``path``
    (child-field terms become parent-stream terms for gating)."""
    from dataclasses import replace

    from .query_plan import Phrase, SpanTerm, Term, Wildcard, WildcardPhrase

    if isinstance(plan, (Term, Wildcard, Phrase, WildcardPhrase, SpanTerm, Range)):
        return replace(plan, field=path)
    if isinstance(plan, Bool):
        return Bool(
            must=tuple(_remap_fields(c, path) for c in plan.must),
            should=tuple(_remap_fields(c, path) for c in plan.should),
            must_not=tuple(_remap_fields(c, path) for c in plan.must_not),
            filter=tuple(_remap_fields(c, path) for c in plan.filter),
            msm=plan.msm,
        )
    if isinstance(plan, (SpanNear, SpanOr)):
        from dataclasses import replace as _r

        return _r(plan, clauses=tuple(_remap_fields(c, path) for c in plan.clauses))
    if isinstance(plan, SpanNot):
        return SpanNot(_remap_fields(plan.include, path), _remap_fields(plan.exclude, path))
    return plan  # MatchAll/MatchNone/Nested-in-nested approximations
