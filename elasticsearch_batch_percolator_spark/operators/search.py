"""Ad-hoc search execution: compiled plan → filtered, scored, paged results.

The reference's per-query search path (E1-E4): set the parsed query on a
SearchContext, run queryPhase + fetchPhase, window the TopDocs by from/size
(BatchPercolatorService.executeSearch:374-394, setDocIdsToLoad:403-417), and
allow only _score desc sort (YPercolatorService.parseSort:394-402).

Spark shape: exact-match predicate (operators/match.py) filters the corpus;
BM25 scores come from the query's positive terms only (must/should/phrase —
never must_not; FILTER clauses are non-scoring, Q5); `from`/`size` page the
score-desc window with the deterministic doc_id tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.query_plan import MatchAll, Plan, positive_term_weights
from .bm25 import score_terms
from .match import match_col


class SortNotSupportedError(ValueError):
    """Only _score desc exists (reference parse error for anything else)."""


def validate_sort(sort: str | None) -> None:
    if sort not in (None, "_score", "_score desc"):
        raise SortNotSupportedError(
            f"only '_score desc' is supported, got {sort!r} "
            "(reference behavior: YPercolatorService.parseSort:394-402)"
        )


def search(
    engine,
    plan: Plan,
    k: int = 10,
    from_: int = 0,
    sort: str | None = None,
    round_to: int | None = 4,
) -> DataFrame:
    """(rank, doc_id, score_r) page [from_, from_+k) for ``plan``.

    ``engine`` is an engine.Engine (provides docs/tf/dl/dfreq/stats).
    Zero-score matches (match_all, pure-filter queries) rank by doc_id.
    """
    validate_sort(sort)
    matched = engine.docs.filter(
        match_col(plan, {"content": F.col("tokens")})
    ).select("doc_id")

    # weight map = qtf x path boost per term (round-5: consistent with
    # percolate scored responses and the index scorers)
    w: dict[str, float] = {}
    for (_f, t), wt in positive_term_weights(plan).items():
        w[t] = w.get(t, 0.0) + wt
    if w and not isinstance(plan, MatchAll):
        n, avgdl = engine.stats
        qt = engine.spark.createDataFrame(
            [("q", t, wt) for t, wt in sorted(w.items())],
            "query_id string, term string, w double",
        )
        scored = (
            score_terms(engine.tf, engine.dl, engine.dfreq, qt, n, avgdl)
            .select("doc_id", "score")
            .join(matched, "doc_id", "right")
            .fillna({"score": 0.0})
        )
    else:
        scored = matched.withColumn("score", F.lit(0.0))

    rank_score = F.round("score", round_to) if round_to is not None else F.col("score")
    # TopK via orderBy().limit() — Spark's distributed take-ordered (per-
    # partition heaps + tiny final merge), NOT a global window over every
    # match; the window only ranks the already-limited from_+k rows
    top = (
        scored.withColumn("score_r", rank_score)
        .orderBy(F.desc("score_r"), F.asc("doc_id"))
        .limit(from_ + k)
    )
    w = Window.orderBy(F.desc("score_r"), F.asc("doc_id"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") > from_)
        .select("rank", "doc_id", "score_r")
    )
