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

    # ---- phase 1: candidate (query, doc) pairs --------------------------
    batch_terms = batch.select(
        "doc_id", F.explode_outer("tokens").alias("term")
    ).dropDuplicates(["doc_id", "term"])

    literal = registry.literal_pairs(spark)
    patterns = registry.pattern_pairs(spark)
    group_counts = registry.group_counts(spark)

    # wildcard expansion against the batch term dictionary (Q7/Q8)
    term_dict = batch_terms.select("term").dropDuplicates(["term"])
    expanded = (
        term_dict.join(F.broadcast(patterns))
        .filter(F.expr("term LIKE pattern"))
        .select("query_id", "group_id", "term")
    )
    qterms = literal.unionByName(expanded)

    hits = (
        batch_terms.join(F.broadcast(qterms), "term")
        .groupBy("doc_id", "query_id")
        .agg(F.countDistinct("group_id").alias("n_hit"))
        .join(F.broadcast(group_counts), "query_id")
        .filter(F.col("n_hit") == F.col("n_groups"))
        .select("doc_id", "query_id")
    )

    all_doc_qids = registry.all_docs_query_ids()
    if all_doc_qids:
        everywhere = batch.select("doc_id").crossJoin(
            spark.createDataFrame([(q,) for q in all_doc_qids], "query_id string")
        )
        candidates = hits.unionByName(everywhere)
    else:
        candidates = hits

    # ---- phase 2: exact verify on survivors only -------------------------
    # Split the verify set: everything non-positional becomes ONE Catalyst
    # when-chain over match_col predicates (JVM-side, codegen'd); only
    # positional queries (spans, sloppy phrases) cross into Python — the
    # same boundary the reference draws ("positional queries are magnitudes
    # slower", README.md:127-133).
    verify_plans = registry.verify_plans()
    columnar = {q: p for q, p in verify_plans.items() if not _is_positional(p)}
    pythonic = {q: p for q, p in verify_plans.items() if _is_positional(p)}
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
        predicates = {
            qid: compile_predicate(plan, field) for qid, plan in pythonic.items()
        }

        @F.pandas_udf(T.BooleanType())
        def verify(qids: pd.Series, tokens: pd.Series) -> pd.Series:
            out = []
            for qid, toks in zip(qids, tokens):
                p = predicates.get(qid)
                try:
                    out.append(
                        p is not None and p(toks.tolist() if toks is not None else [])
                    )
                except Exception:
                    out.append(False)  # per-query error isolation (E10)
            return pd.Series(out)

        to_verify = candidates.join(
            F.broadcast(spark.createDataFrame([(q,) for q in pythonic], "query_id string")),
            "query_id",
            "left_semi",
        ).join(batch.select("doc_id", "tokens"), "doc_id")
        parts.append(
            to_verify.withColumn("ok", verify(F.col("query_id"), F.col("tokens")))
            .filter("ok")
            .select("doc_id", "query_id")
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
