"""Batch percolation: registered query set × document micro-batch.

The reference's core pipeline (BatchPercolatorService.percolate:132-174):
parse docs → index batch into a RAMDirectory → phase-1 limiting filter over
ALL queries → per-query phase-2 search + highlight → per-doc result map.
Its per-query loop (E1) is replaced by ONE set-oriented joined plan:

  phase 1   batch (doc_id, term) ⋈ broadcast query (group, term) pairs
            → groupBy(doc_id, query_id) countDistinct(group) == n_groups
            (the semi-join shape of hasDocumentMatchingFilter,
            BatchPercolatorService.java:197-222 — but for all queries at once)
  wildcards expanded against the BATCH term dictionary, exactly like the
            reference's automaton over the index terms
            (WildcardTermsProducer.getTerms:26-53)
  phase 2   exact evaluator (plans/eval_py.py) inside one Arrow pandas UDF,
            only over surviving (query, doc) pairs — and only for queries
            whose phase-1 semantics are not already exact
  errors    per-query isolation: a failing phase-2 eval drops that query for
            that doc and is counted, Meltwater-style skip-and-log
            (BatchPercolatorService.java:364-368), not YouScan abort

Scale notes (100 TB / 1000-executor thinking):
- query tables are broadcast (225k queries × few terms ≈ MBs);
- the only shuffle is groupBy(doc_id, query_id) over phase-1 HITS, which is
  |batch ∩ query terms|-sized, not |batch × queries|;
- unfilterable queries (approx=None / match_all) cross-join the batch — the
  same cost the reference pays (they run against every RAMDirectory);
- per-batch cleanup = unpersist (E11).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.eval_py import compile_predicate
from ..sources.registry import CompiledRegistry


@dataclass
class PercolateResult:
    """matches: (doc_id, query_id); per_doc(): reference-style per-doc map."""

    matches: DataFrame
    docs: DataFrame  # (doc_id, content, tokens)

    def per_doc(self) -> DataFrame:
        """E7: every doc gets an entry, docs with no matches get []
        (emptyPercolateResponses, BatchPercolatorService.java:268-275)."""
        agg = self.matches.groupBy("doc_id").agg(
            F.sort_array(F.collect_list("query_id")).alias("matched_queries")
        )
        return (
            self.docs.select("doc_id")
            .join(agg, "doc_id", "left")
            .withColumn(
                "matched_queries",
                F.coalesce("matched_queries", F.array().cast("array<string>")),
            )
        )

    def counts(self) -> DataFrame:
        """E5 count-only mode (YPercolateRequest.onlyCount:151-158)."""
        return self.matches.groupBy("query_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_matches")
        )

    def with_scores(self, registry: CompiledRegistry, round_to: int | None = 4) -> DataFrame:
        """(doc_id, query_id, score): BM25 of each match against the BATCH
        corpus statistics — the reference scores percolation hits against
        the transient RAMDirectory index, so N/avgdl/df are batch-local
        (track_scores, YPercolatorService.java:518). Our upgrade: ES 2.4
        exposed no scores in percolate responses; BM25 is the north_rule
        contract. Zero-term queries (match_all) score 0.0.
        """
        from .bm25 import score_terms
        from .stats import corpus_stats, doc_freq, doc_lengths, term_frequencies
        from ..plans.query_plan import positive_terms

        spark = self.docs.sparkSession
        rows = [
            (qid, t)
            for qid, cq in registry.queries.items()
            for _, t in sorted(positive_terms(cq.plan))
        ]
        out_score = (
            F.round("score", round_to) if round_to is not None else F.col("score")
        )
        if rows:
            tf = term_frequencies(self.docs)
            dl = doc_lengths(self.docs)
            dfreq = doc_freq(tf)
            n, avgdl = corpus_stats(self.docs)
            qt = spark.createDataFrame(rows, "query_id string, term string")
            scored = score_terms(tf, dl, dfreq, qt, n, avgdl).select(
                "doc_id", "query_id", "score"
            )
        else:
            scored = self.matches.select(
                "doc_id", "query_id", F.lit(0.0).alias("score")
            ).limit(0)
        return (
            self.matches.join(scored, ["doc_id", "query_id"], "left")
            .fillna({"score": 0.0})
            .select("doc_id", "query_id", out_score.alias("score"))
        )


def percolate(
    spark: SparkSession,
    docs: DataFrame,
    registry: CompiledRegistry,
    content_col: str = "content",
    id_col: str = "doc_id",
    tokenizer=None,
) -> PercolateResult:
    """Match every registered query against every doc of the batch."""
    from ..functions.tokenizer import tokenize_ws

    tokenizer = tokenizer or tokenize_ws
    batch = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(content_col).alias("content"),
        tokenizer(content_col).alias("tokens"),
    )

    # ---- phase 1: candidate (query, doc) pairs via GATE groups ----------
    # Joining every query term against the batch multiplies each (doc, term)
    # row by |queries containing term| — 10^8 rows at 225k queries. Instead
    # each query joins on ONE group: its most selective (lowest batch-df)
    # necessary condition — the classic rarest-term gate. Candidate volume
    # becomes sum_q df(gate_q); phase 2 settles the rest.
    batch_terms = batch.select(
        "doc_id", F.explode("tokens").alias("term")
    ).dropDuplicates(["doc_id", "term"])

    involved = sorted(
        {
            v
            for q in registry.queries.values()
            if q.groups
            for g in q.groups
            for kind, v in g
            if kind == "t"
        }
    )
    term_df: dict[str, int] = {}
    if involved:
        inv_df = spark.createDataFrame([(t,) for t in involved], "term string")
        term_df = {
            r["term"]: int(r["df"])
            for r in batch_terms.join(F.broadcast(inv_df), "term")
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
            .collect()
        }

    lit_rows, pat_rows = registry.gates(term_df)
    parts_cand = []
    if lit_rows:
        gates = spark.createDataFrame(lit_rows, "query_id string, term string")
        parts_cand.append(batch_terms.join(F.broadcast(gates), "term"))
    if pat_rows:
        patterns = spark.createDataFrame(pat_rows, "query_id string, pattern string")
        term_dict = batch_terms.select("term").dropDuplicates(["term"])
        expanded = (
            term_dict.join(F.broadcast(patterns))
            .filter(F.expr("term LIKE pattern"))
            .select("query_id", "term")
        )
        parts_cand.append(batch_terms.join(F.broadcast(expanded), "term"))

    all_doc_qids = registry.all_docs_query_ids()
    if all_doc_qids:
        parts_cand.append(
            batch.select("doc_id").crossJoin(
                spark.createDataFrame([(q,) for q in all_doc_qids], "query_id string")
            )
        )

    if not parts_cand:
        candidates = spark.createDataFrame([], "doc_id long, query_id string")
    else:
        candidates = parts_cand[0].select("doc_id", "query_id")
        for p in parts_cand[1:]:
            candidates = candidates.unionByName(p.select("doc_id", "query_id"))
        candidates = candidates.dropDuplicates(["doc_id", "query_id"])

    # ---- phase 2: exact verify on survivors only -------------------------
    # Split the verify set: everything non-positional becomes ONE Catalyst
    # when-chain over match_col predicates (JVM-side, codegen'd); only
    # positional queries (spans, sloppy phrases) cross into Python — the
    # same boundary the reference draws ("positional queries are magnitudes
    # slower", README.md:127-133).
    verify_plans = registry.gate_verify_plans()
    columnar = {q: p for q, p in verify_plans.items() if not _is_positional(p)}
    pythonic = {q: p for q, p in verify_plans.items() if _is_positional(p)}
    # a when-chain with 10^5 branches (225k-query registries) would blow up
    # codegen; past the cap the compiled-python evaluator is the right tool
    # (it is exactly the reference's per-(query,doc) evaluation loop)
    max_branches = int(os.environ.get("EBP_MAX_WHEN_BRANCHES", "1500"))
    if len(columnar) > max_branches:
        pythonic.update(columnar)
        columnar = {}
    parts = [
        candidates.join(
            F.broadcast(
                spark.createDataFrame([(q,) for q in verify_plans], "query_id string")
            ),
            "query_id",
            "left_anti",
        )
        if verify_plans
        else candidates
    ]

    if columnar:
        field = _single_field(columnar)
        token_col = {field: F.col("tokens")}
        pred = None
        for qid, plan in list(columnar.items()):
            try:
                branch = match_col(plan, token_col)
            except Exception:
                # per-query isolation (E10): un-buildable predicate falls
                # back to the python evaluator, which isolates per row
                del columnar[qid]
                pythonic[qid] = plan
                continue
            pred = (
                F.when(F.col("query_id") == qid, branch)
                if pred is None
                else pred.when(F.col("query_id") == qid, branch)
            )
    if columnar:
        cands = candidates.join(
            F.broadcast(spark.createDataFrame([(q,) for q in columnar], "query_id string")),
            "query_id",
            "left_semi",
        ).join(batch.select("doc_id", "tokens"), "doc_id")
        parts.append(
            cands.filter(pred.otherwise(F.lit(False))).select("doc_id", "query_id")
        )

    if pythonic:
        field = _single_field(pythonic)
        # plans ship ONCE per executor via a Spark broadcast (pickling 10^5
        # compiled closures into every task would dominate the job);
        # predicates compile lazily per worker and memoize
        bc_plans = spark.sparkContext.broadcast(dict(pythonic))
        memo: dict = {}

        def _pred(qid):
            p = memo.get(qid)
            if p is None:
                plan = bc_plans.value.get(qid)
                if plan is None:
                    return None
                p = compile_predicate(plan, field)
                memo[qid] = p
            return p

        # group candidates per doc: tokens ship ONCE per doc (not once per
        # (doc, query) pair — a ~|queries|x blowup at dense candidate sets),
        # and the token list/set conversions amortize over all its queries
        @F.pandas_udf(T.ArrayType(T.StringType()))
        def verify_doc(qid_lists: pd.Series, tokens: pd.Series) -> pd.Series:
            out = []
            for qids, toks in zip(qid_lists, tokens):
                tlist = toks.tolist() if toks is not None else []
                tset = set(tlist)
                hit = []
                for qid in qids:
                    try:
                        p = _pred(qid)
                        if p is not None and p(tlist, tset):
                            hit.append(qid)
                    except Exception:
                        pass  # per-query error isolation (E10)
                out.append(hit)
            return pd.Series(out)

        to_verify = (
            candidates.join(
                F.broadcast(
                    spark.createDataFrame([(q,) for q in pythonic], "query_id string")
                ),
                "query_id",
                "left_semi",
            )
            .groupBy("doc_id")
            .agg(F.collect_list("query_id").alias("qids"))
            .join(batch.select("doc_id", "tokens"), "doc_id")
        )
        parts.append(
            to_verify.select(
                "doc_id",
                F.explode(verify_doc(F.col("qids"), F.col("tokens"))).alias("query_id"),
            )
        )

    matches = parts[0]
    for p in parts[1:]:
        matches = matches.unionByName(p)

    return PercolateResult(matches=matches, docs=batch)


def _is_positional(plan) -> bool:
    """True if exact evaluation needs token positions beyond adjacency-
    expressible Catalyst (spans, sloppy phrases) — anywhere in the tree."""
    from ..plans.query_plan import (
        Bool,
        Phrase,
        SpanNear,
        SpanNot,
        SpanOr,
    )

    if isinstance(plan, (SpanNear, SpanOr, SpanNot)):
        return True
    if isinstance(plan, Phrase):
        return plan.slop > 0
    if isinstance(plan, Bool):
        return any(
            _is_positional(c)
            for g in (plan.must, plan.should, plan.must_not, plan.filter)
            for c in g
        )
    return False


def _single_field(plans: dict) -> str:
    """The flat corpus has one analyzed field; recover its name from plans."""
    from ..plans.query_plan import fields_of

    fields = set()
    for p in plans.values():
        fields |= fields_of(p)
    if len(fields) > 1:
        raise ValueError(f"multi-field verify not supported yet: {fields}")
    return next(iter(fields)) if fields else "content"
