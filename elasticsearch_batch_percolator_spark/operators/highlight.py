"""Highlighting: wrap matched terms of each (query, doc) pair in tags.

The reference re-runs ES's highlight phase per matched (query, doc)
(BatchPercolatorService.java:420-448, per-hit execution
YPercolatorService.java:446-468) with forced source highlighting; golden
outputs are token-wrapped fragments like ``"the <b>fox</b> is here"`` and
``"<b>youscan</b> percolator"`` (APITests.java:132-139).

Here: one Arrow pandas UDF over matched pairs; tokens matching any of the
query's positive literal terms or wildcard patterns get wrapped. Tokenization
must agree with the analyzer (whitespace split), so highlighting operates on
the raw split, preserving original casing of the source text.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.eval_py import wildcard_regex
from ..plans.query_plan import Plan, Wildcard, positive_terms
from ..sources.registry import CompiledRegistry


def _wildcards_of(plan: Plan) -> set[str]:
    from ..plans.query_plan import Bool, SpanNear, SpanNot, SpanOr, WildcardPhrase

    if isinstance(plan, Wildcard):
        return {plan.pattern}
    if isinstance(plan, WildcardPhrase):
        return {p.pattern for p in plan.producers if isinstance(p, Wildcard)}
    if isinstance(plan, Bool):
        out: set[str] = set()
        for g in (plan.must, plan.should, plan.filter):
            for c in g:
                out |= _wildcards_of(c)
        return out
    if isinstance(plan, (SpanNear, SpanOr)):
        out = set()
        for c in plan.clauses:
            out |= _wildcards_of(c)
        return out
    if isinstance(plan, SpanNot):
        return _wildcards_of(plan.include)
    return set()


def highlight_col(
    registry: CompiledRegistry,
    query_id_col: Column,
    content_col: Column,
    pre_tag: str = "<b>",
    post_tag: str = "</b>",
) -> Column:
    """Column: highlighted content for a (query_id, content) pair."""
    terms_by_q = {
        qid: ({t for _, t in positive_terms(q.plan)}, _wildcards_of(q.plan))
        for qid, q in registry.queries.items()
    }

    @F.pandas_udf(T.StringType())
    def hl(qids: pd.Series, contents: pd.Series) -> pd.Series:
        out = []
        for qid, content in zip(qids, contents):
            literals, wilds = terms_by_q.get(qid, (set(), set()))
            rxs = [wildcard_regex(w) for w in wilds]
            toks = (content or "").split(" ")
            parts = []
            for tok in toks:
                low = tok.lower()
                if low in literals or any(r.match(low) for r in rxs):
                    parts.append(f"{pre_tag}{tok}{post_tag}")
                else:
                    parts.append(tok)
            out.append(" ".join(parts))
        return pd.Series(out)

    return hl(query_id_col, content_col)
