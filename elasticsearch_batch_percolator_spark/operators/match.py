"""Plan → Catalyst boolean Column (the exact-match operator surface).

Everything stays JVM-side / whole-stage-codegen'd except sloppy phrases and
span queries, which fall back to ONE Arrow-vectorized pandas UDF running the
shared exact evaluator (plans/eval_py.py) — the same split as the reference,
where Boolean structure is cheap and positional queries are the documented
slow path (README.md:127-133).

Catalyst constructions:
- Term       → array_contains(tokens, t)                         (Q1)
- Wildcard   → exists(tokens, t -> t LIKE 'fo%')                 (Q7)
- Phrase s=0 → exists(sequence(1, size-k+1),
                 i -> tokens[i]=t0 AND tokens[i+1]=t1 ...)       (Q6)
- WildcardPhrase → same with per-position LIKE                   (Q8)
- Bool       → AND / OR / NOT composition                        (Q2-Q5)
- Range      → col BETWEEN                                       (Q12)
- MatchAll/None → lit(True/False)                                (Q11)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.eval_py import eval_plan
from ..plans.query_plan import (
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
    fields_of,
)

_LIKE_SPECIAL = {"%": r"\%", "_": r"\_", "\\": "\\\\"}


def wildcard_to_like(pattern: str) -> str:
    """Lucene wildcard (* ?) → SQL LIKE pattern (% _), escaping %/_/\\."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append("%")
        elif ch == "?":
            out.append("_")
        else:
            out.append(_LIKE_SPECIAL.get(ch, ch))
    return "".join(out)


def _positional_col(tokens: Column, position_preds: list, k: int) -> Column:
    """exists(start positions, all k consecutive tokens satisfy their pred).

    ``position_preds[j]`` maps a token Column to a boolean Column.
    element_at is 1-based; sequence guarded against size < k (an unguarded
    sequence(1, n) with n < 1 would generate a DESCENDING range).
    """
    def at_start(i: Column) -> Column:
        cond = F.lit(True)
        for j, pred in enumerate(position_preds):
            cond = cond & pred(F.element_at(tokens, i + F.lit(j)))
        return cond

    n_starts = F.size(tokens) - F.lit(k - 1)
    return F.when(
        n_starts >= 1, F.exists(F.sequence(F.lit(1), n_starts), at_start)
    ).otherwise(F.lit(False))


def _verify_udf_col(plan: Plan, tokens: Column, field: str) -> Column:
    """Fallback: exact evaluator inside an Arrow-batched pandas UDF."""

    @F.pandas_udf(T.BooleanType())
    def verify(s: pd.Series) -> pd.Series:
        return s.map(lambda toks: eval_plan(plan, {field: list(toks) if toks is not None else []}))

    return verify(tokens)


def match_col(
    plan: Plan,
    token_fields: dict[str, Column],
    value_fields: dict[str, Column] | None = None,
) -> Column:
    """Exact boolean match predicate for ``plan``.

    ``token_fields``: field name → array<string> tokens Column.
    ``value_fields``: field name → numeric Column (Range targets).
    """
    value_fields = value_fields or {}

    if isinstance(plan, MatchAll):
        return F.lit(True)
    if isinstance(plan, MatchNone):
        return F.lit(False)

    if isinstance(plan, (Term, SpanTerm)):
        return F.array_contains(token_fields[plan.field], plan.value)

    if isinstance(plan, Wildcard):
        like = wildcard_to_like(plan.pattern)
        return F.exists(token_fields[plan.field], lambda t: t.like(like))

    if isinstance(plan, Fuzzy):
        # threshold form short-circuits the DP past ``fuzziness`` (returns
        # -1 above it); prefix_length via startswith — exact Lucene
        # semantics because equal prefixes strip from the edit distance
        v, fz, pl = plan.value, plan.fuzziness, plan.prefix_length

        def fuzz_pred(t: Column) -> Column:
            cond = F.levenshtein(t, F.lit(v), fz) >= 0
            if pl:
                cond = t.startswith(v[:pl]) & cond
            return cond

        return F.exists(token_fields[plan.field], fuzz_pred)

    if isinstance(plan, Regexp):
        rx = "^(?:" + plan.pattern + ")$"  # whole-term, Lucene RegexpQuery
        return F.exists(token_fields[plan.field], lambda t: t.rlike(rx))

    if isinstance(plan, Exists):
        if plan.field in token_fields:
            return F.size(token_fields[plan.field]) > 0
        c = value_fields[plan.field]
        return c.isNotNull() & ~F.isnan(c.cast("double"))

    if isinstance(plan, Ids):
        # the caller exposes the doc-id column as value_fields["_id"] or —
        # in percolate's columnar verify lane, which passes only token
        # columns — as the scalar ``token_fields["_id"]`` entry resolve maps
        # to value___id; long ids cast to their decimal string, matching
        # canonical_id. A missing _id RAISES (KeyError) so per-query
        # fallback lanes catch it, exactly like Range/Exists: a silent
        # lit(False) here would make must/filter ids clauses never match
        # and must_not ids clauses vacuously true — wrong results, not an
        # error the isolation channel can see.
        c = value_fields.get("_id")
        if c is None:
            c = token_fields["_id"]
        # null doc ids pin to non-matching in BOTH polarities (isin alone
        # yields NULL, which under must_not drops the row), matching
        # eval_plan's False for None ids
        return F.coalesce(c.cast("string").isin(*plan.values), F.lit(False))

    if isinstance(plan, Range):
        c = value_fields[plan.field]
        cond = F.lit(True)
        if plan.gte is not None:
            cond = cond & (c >= F.lit(plan.gte))
        if plan.lte is not None:
            cond = cond & (c <= F.lit(plan.lte))
        return cond

    if isinstance(plan, Phrase):
        tokens = token_fields[plan.field]
        if plan.slop == 0:
            preds = [(lambda t, v=v: t == F.lit(v)) for v in plan.terms]
            return _positional_col(tokens, preds, len(plan.terms))
        return _verify_udf_col(plan, tokens, plan.field)

    if isinstance(plan, WildcardPhrase):
        tokens = token_fields[plan.field]
        preds = []
        for p in plan.producers:
            if isinstance(p, Term):
                preds.append(lambda t, v=p.value: t == F.lit(v))
            else:
                preds.append(lambda t, lk=wildcard_to_like(p.pattern): t.like(lk))
        return _positional_col(tokens, preds, len(plan.producers))

    if isinstance(plan, Nested):
        # Q10 block join, Catalyst-native: EXISTS over the array<struct>
        # children column; child token-array fields resolve via getField, so
        # must-clauses bind within ONE child (the ToParentBlockJoinQuery
        # contract) — no explode, no shuffle, whole-stage codegen'd
        arr = token_fields[plan.path]
        child_fields = fields_of(plan.query)

        def child_pred(c: Column) -> Column:
            return match_col(
                plan.query,
                {f: c.getField(f) for f in child_fields},
                value_fields,
            )

        return F.exists(arr, child_pred)

    if isinstance(plan, (SpanNear, SpanOr, SpanNot, SpanFirst)):
        fs = fields_of(plan)
        if len(fs) != 1:
            raise ValueError(f"span plans must target one field, got {fs}")
        field = next(iter(fs))
        return _verify_udf_col(plan, token_fields[field], field)

    if isinstance(plan, Bool):
        cond = F.lit(True)
        for c in plan.must:
            cond = cond & match_col(c, token_fields, value_fields)
        for c in plan.filter:
            cond = cond & match_col(c, token_fields, value_fields)
        for c in plan.must_not:
            cond = cond & ~match_col(c, token_fields, value_fields)
        need = plan.effective_msm()
        if need == 1:
            any_should = F.lit(False)
            for c in plan.should:
                any_should = any_should | match_col(c, token_fields, value_fields)
            cond = cond & any_should
        elif need > 1:
            # minimum_should_match: count satisfied shoulds JVM-side
            n_hits = None
            for c in plan.should:
                h = match_col(c, token_fields, value_fields).cast("int")
                n_hits = h if n_hits is None else n_hits + h
            cond = cond & (n_hits >= F.lit(need))
        return cond

    raise TypeError(f"cannot build match column for {plan!r}")


def alias_filter(
    docs: DataFrame,
    query: dict | Plan,
    token_fields: dict[str, Column],
    value_fields: dict[str, Column] | None = None,
) -> DataFrame:
    """Q14 alias filter: AND a filtered-alias query into the context before
    percolation/search, the reference's
    ``YPercolatorService.createContext`` alias handling
    (YPercolatorService.java:141-149). ``query`` is a query-DSL dict (or a
    compiled Plan); the returned DataFrame is ``docs`` restricted to rows
    satisfying it — pure Catalyst WHERE, non-scoring (filter context)."""
    from ..plans.compiler import compile_query

    plan = query if isinstance(query, Plan) else compile_query(query)
    return docs.filter(match_col(plan, token_fields, value_fields))
