"""Watermarked windowed percolation counts (Structured Streaming).

The reference's percolation responses are strictly per-batch
(BatchPercolatorService.java:131-178); trend counts over match streams are
what its users build downstream. Spark-first, that downstream is ONE
declarative incremental pipeline — no foreachBatch, no python UDF:

    tokenize → explode (kind, gate) candidate streams
             → broadcast gate join (ONE static gate atom per query, so at
               most one candidate row per (doc, query) — no dedup state)
             → data-driven conjunction predicate (forall/exists over the
               carried token/bigram arrays vs the query's atom arrays)
             → withWatermark + window() aggregate

Late data is handled by the watermark; closed windows emit in append mode.
The same plan runs on a BATCH DataFrame unchanged (watermark is a no-op),
which is how the DuckDB oracle checks it.

Supported query shapes: conjunctions of Term / 2-term-slop-0-Phrase atoms
(must + must_not — the join-verify atom algebra), bare Terms, MatchAll.
Wildcards need the per-batch term dictionary and positional queries need
the evaluator — both stay on the foreachBatch path (percolate_stream).
Field names resolve to the single analyzed content column (the flat-corpus
default, percolate(fields=None)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.query_plan import Term
from ..sources.registry import CompiledRegistry, _jv_requirements

_BIGRAMS = (
    "zip_with(slice(tokens, 1, greatest(size(tokens)-1, 0)), "
    "slice(tokens, 2, greatest(size(tokens)-1, 0)), "
    "(x, y) -> concat(x, ' ', y))"
)


def _specs(
    registry: CompiledRegistry, term_df: dict | None
) -> tuple[list[tuple], list[str], list[str]]:
    """One spec row per supported query:
    (kind, gate, query_id, need_t, need_b, forb_t, forb_b).
    Gate = the query's rarest need atom (by ``term_df`` df when given,
    unigrams preferred) — a necessary condition, so the join is a sound
    candidate filter and the predicate settles the rest."""
    specs: list[tuple] = []
    matchall = registry.all_docs_query_ids()
    unsupported: list[str] = []
    for qid, cq in registry.queries.items():
        if cq.match_none or qid in matchall:
            continue
        plan = cq.plan
        if isinstance(plan, Term):
            req = ((("t", plan.field, plan.value),), ())
        else:
            req = _jv_requirements(plan)
        if req is None:
            unsupported.append(qid)
            continue
        need, forbid = req
        need_t = sorted({v for k, _f, v in need if k == "t"})
        need_b = sorted({v for k, _f, v in need if k == "b"})
        forb_t = sorted({v for k, _f, v in forbid if k == "t"})
        forb_b = sorted({v for k, _f, v in forbid if k == "b"})
        if not need_t and not need_b:
            unsupported.append(qid)  # must_not-only: no positive gate
            continue

        def df_of(kind: str, v: str) -> int:
            if term_df is None:
                return 0
            if kind == "b":
                w1, w2 = v.split(" ", 1)
                return min(term_df.get(w1, 0), term_df.get(w2, 0))
            return term_df.get(v, 0)

        cands = [("t", v) for v in need_t] + [("b", v) for v in need_b]
        kind, gate = min(cands, key=lambda kv: (df_of(*kv), kv[0] != "t", kv[1]))
        specs.append((kind, gate, qid, need_t, need_b, forb_t, forb_b))
    return specs, matchall, unsupported


def windowed_match_counts(
    spark: SparkSession,
    docs: DataFrame,
    registry: CompiledRegistry,
    *,
    ts_col: str = "ts",
    window_duration: str = "10 minutes",
    slide: str | None = None,
    watermark: str | None = "20 minutes",
    content_col: str = "content",
    id_col: str = "doc_id",
    tokenizer=None,
    term_df: dict | None = None,
    skip_unsupported: bool = False,
) -> DataFrame:
    """docs (streaming or batch) → (window_start, window_end, query_id,
    n_docs): matched-document counts per event-time window per registered
    query. ``term_df`` (term → global df, e.g. from an index manifest)
    improves gate selectivity; without it the first atom gates.
    """
    from ..functions.tokenizer import tokenize_ws

    specs, matchall, unsupported = _specs(registry, term_df)
    if unsupported and not skip_unsupported:
        raise ValueError(
            "unsupported for windowed streaming percolation (use "
            f"percolate_stream/foreachBatch): {sorted(unsupported)[:10]}"
        )

    tok = tokenizer or tokenize_ws
    base = docs.select(
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("doc_id"),
        tok(content_col).alias("tokens"),
    ).withColumn("bigrams", F.expr(_BIGRAMS))
    if watermark is not None:
        base = base.withWatermark("ts", watermark)

    parts = []
    if specs:
        spec_df = spark.createDataFrame(
            specs,
            "kind string, gate string, query_id string, "
            "need_t array<string>, need_b array<string>, "
            "forb_t array<string>, forb_b array<string>",
        )
        uni = base.select(
            "ts", "doc_id", "tokens", "bigrams",
            F.lit("t").alias("kind"),
            F.explode(F.array_distinct("tokens")).alias("gate"),
        )
        big = base.select(
            "ts", "doc_id", "tokens", "bigrams",
            F.lit("b").alias("kind"),
            F.explode(F.array_distinct("bigrams")).alias("gate"),
        )
        cand = uni.unionByName(big).join(F.broadcast(spec_df), ["kind", "gate"])
        ok = (
            F.forall("need_t", lambda t: F.array_contains("tokens", t))
            & F.forall("need_b", lambda b: F.array_contains("bigrams", b))
            & ~F.exists("forb_t", lambda t: F.array_contains("tokens", t))
            & ~F.exists("forb_b", lambda b: F.array_contains("bigrams", b))
        )
        parts.append(cand.filter(ok).select("ts", "doc_id", "query_id"))
    if matchall:
        qdf = spark.createDataFrame(
            [(q,) for q in sorted(matchall)], "query_id string"
        )
        parts.append(
            base.select("ts", "doc_id").crossJoin(F.broadcast(qdf))
        )
    if not parts:
        return spark.createDataFrame(
            [],
            "window_start timestamp, window_end timestamp, "
            "query_id string, n_docs long",
        )
    matches = parts[0]
    for p in parts[1:]:
        matches = matches.unionByName(p)

    win = (
        F.window("ts", window_duration, slide)
        if slide
        else F.window("ts", window_duration)
    )
    return (
        matches.groupBy(win.alias("win"), "query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "query_id",
            "n_docs",
        )
    )
