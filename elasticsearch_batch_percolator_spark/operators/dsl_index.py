"""Full-DSL BM25 top-k over the persisted compressed index.

``topk_from_index`` (operators/wand.py) answers TERM-LIST queries;
``phrase_docs_from_index`` answers one phrase. This module closes the
north-rule contract — "answer top-k BM25 queries with posting-list
intersection" for ANY registrable DSL query — by compiling bool / phrase /
span / wildcard / fuzzy / regexp trees into an index-side
retrieve → verify → score pass:

retrieve  the query's limiting filter (plans/limiting.py — the reference's
          LimitingFilterFactory approximation, exactly the two-phase split
          README.md:127-133 describes) flattens to conjunctive term-groups;
          candidates are docs satisfying >=1 term of EVERY group, computed
          per segment from the decoded posting lists (numpy set ops, no
          doc store touched).
verify    candidates of inexact plans re-evaluate EXACTLY against a
          pseudo-document reconstructed from the query vocabulary's
          positional postings: every literal the (expanded) plan can
          reference is in the vocabulary, so placing those terms at their
          indexed positions reproduces precisely the token view the
          evaluator needs — phrases, slop, spans, msm and must_not all run
          through the same plans/eval_py evaluator the percolator uses.
          Positions decode only when the plan is positional.
score     BM25 with the per-term weight map (qtf x path boost x idf,
          plans/query_plan.positive_term_weights) over the candidates'
          precomputed norms — identical weighting to the join scorer and
          topk_from_index, so results are rank-identical to the in-memory
          engine on the same corpus.

Multi-term atoms (wildcard / fuzzy / regexp) expand against the persisted
term dictionary with predicate-pushdown scans (LIKE / levenshtein threshold
/ rlike evaluate JVM-side in the parquet scan; only matching dictionary
rows are collected — the reference's automaton walk over the index terms,
WildcardTermsProducer.java:26-53). Expansion happens BEFORE planning, so
gates, verification and scoring all see literal terms only.

Execution shape (the 100 TB question): ONE parquet scan covers every
query's vocabulary (``PushedFilters: In(term, ...)``), segments verify and
score independently in parallel (applyInPandas over groupBy(segment_id)),
the driver never sees a posting, and the only data movement is the
(n_segments x k) local-top-k rows into the final window — the same merge
the reference does across shards (TransportBatchPercolateAction:94-143).
Python evaluation touches only gate-surviving candidates, the same
boundary the reference draws for its phase 2.

Out of scope by design (documented): queries needing the DOC STORE rather
than the token index — numeric range / exists / ids / nested block join /
top-level match_all — raise ``UnsupportedIndexQuery``; they remain served
by the batch surfaces (operators/search.py, operators/percolate.py).
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..index.build import read_manifest, read_postings, read_term_stats
from ..index.codec import decode_block, decode_positions
from ..plans.compiler import compile_query
from ..plans.eval_py import eval_plan
from ..plans.limiting import limiting_filter
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
    positive_term_weights,
)
from .wand import _idf, _round_half_up


class UnsupportedIndexQuery(ValueError):
    """Plan needs the doc store (range/exists/ids/nested/match_all) or has
    no positive token constraint — not answerable from the inverted index."""


#: token placed at positions the reconstruction cannot attribute to a
#: vocabulary term; after multi-term expansion every atom is a LITERAL
#: comparison, which this can never satisfy ("\\x00" is not analyzer-
#: producible)
_HOLE = "\x00"
_NEVER = "\x00never"  # literal for an empty span-context expansion


def _wildcard_like(pattern: str) -> str:
    from .match import wildcard_to_like

    return wildcard_to_like(pattern)


def _collect_multiterm(plan: Plan, out: dict) -> None:
    """Gather wildcard/fuzzy/regexp atoms keyed by their expansion params."""
    if isinstance(plan, Wildcard):
        out[("w", plan.pattern)] = plan
    elif isinstance(plan, Fuzzy):
        out[("f", plan.value, plan.fuzziness, plan.prefix_length)] = plan
    elif isinstance(plan, Regexp):
        out[("r", plan.pattern)] = plan
    elif isinstance(plan, Bool):
        for g in (plan.must, plan.should, plan.must_not, plan.filter):
            for c in g:
                _collect_multiterm(c, out)
    elif isinstance(plan, (SpanNear, SpanOr)):
        for c in plan.clauses:
            _collect_multiterm(c, out)
    elif isinstance(plan, SpanNot):
        _collect_multiterm(plan.include, out)
        _collect_multiterm(plan.exclude, out)
    elif isinstance(plan, SpanFirst):
        _collect_multiterm(plan.match, out)
    elif isinstance(plan, WildcardPhrase):
        for p in plan.producers:
            _collect_multiterm(p, out)


def _expand_from_index(
    spark: SparkSession, index_dir: str, atoms: dict
) -> dict[tuple, list[str]]:
    """Each multi-term atom -> sorted matching dictionary terms.

    One scan of ``term_stats`` with every atom's predicate OR-ed and pushed
    into the parquet scan; only rows matching >=1 atom come back, then each
    atom confirms its own matches driver-side (the per-atom split). The
    dictionary is the set of ALL corpus terms, so expansion is EXHAUSTIVE —
    replacing an atom by its expansion set is an exact rewrite.
    """
    if not atoms:
        return {}
    term = F.col("term")
    preds = []
    for key in atoms:
        if key[0] == "w":
            preds.append(term.like(_wildcard_like(key[1])))
        elif key[0] == "f":
            _, v, fz, pl = key
            p = F.levenshtein(term, F.lit(v), fz) >= 0
            if pl:
                p = term.startswith(v[:pl]) & p
            preds.append(p)
        else:  # regexp
            preds.append(term.rlike("^(?:" + key[1] + ")$"))
    import functools

    cand = [
        r["term"]
        for r in spark.read.parquet(f"{index_dir}/term_stats")
        .select("term")
        .filter(functools.reduce(lambda a, b: a | b, preds))
        .collect()
    ]
    from ..plans.eval_py import fuzzy_pred, regexp_regex, wildcard_regex

    out: dict[tuple, list[str]] = {}
    for key in atoms:
        if key[0] == "w":
            rx = wildcard_regex(key[1])
            out[key] = sorted(t for t in cand if rx.match(t))
        elif key[0] == "f":
            _, v, fz, pl = key
            pred = fuzzy_pred(v, fz, pl)
            out[key] = sorted(t for t in cand if pred(t))
        else:
            rx = regexp_regex(key[1])
            out[key] = sorted(t for t in cand if rx.fullmatch(t))
    return out


def _atom_key(plan: Plan) -> tuple:
    if isinstance(plan, Wildcard):
        return ("w", plan.pattern)
    if isinstance(plan, Fuzzy):
        return ("f", plan.value, plan.fuzziness, plan.prefix_length)
    return ("r", plan.pattern)


def _transform(plan: Plan, exp: dict, in_span: bool = False) -> Plan:
    """Literal-only rewrite: multi-term atoms become term-set alternatives
    (Bool should/msm=1, or SpanOr inside span contexts); WildcardPhrase
    becomes the equivalent in-order slop-0 SpanNear of per-slot SpanOrs.
    Doc-store plans raise UnsupportedIndexQuery."""
    if isinstance(plan, (Range, Exists, Ids, Nested)):
        raise UnsupportedIndexQuery(
            f"{type(plan).__name__} needs the doc store — serve it via the "
            "batch surfaces (search/percolate), not the inverted index"
        )
    if isinstance(plan, (Wildcard, Fuzzy, Regexp)):
        terms = exp.get(_atom_key(plan), [])
        f = plan.field
        if in_span:
            if not terms:
                return SpanTerm(f, _NEVER)
            if len(terms) == 1:
                return SpanTerm(f, terms[0])
            return SpanOr(tuple(SpanTerm(f, t) for t in terms))
        if not terms:
            return MatchNone()
        if len(terms) == 1:
            return Term(f, terms[0])
        return Bool(should=tuple(Term(f, t) for t in terms), msm=1)
    if isinstance(plan, WildcardPhrase):
        slots = tuple(_transform(p, exp, in_span=True) for p in plan.producers)
        slots = tuple(
            SpanTerm(s.field, s.value) if isinstance(s, Term) else s
            for s in slots
        )
        return SpanNear(slots, slop=0, in_order=True)
    if isinstance(plan, Bool):
        return Bool(
            must=tuple(_transform(c, exp) for c in plan.must),
            should=tuple(_transform(c, exp) for c in plan.should),
            must_not=tuple(_transform(c, exp) for c in plan.must_not),
            filter=tuple(_transform(c, exp) for c in plan.filter),
            msm=plan.msm,
            boost=plan.boost,
        )
    if isinstance(plan, (SpanNear, SpanOr)):
        from dataclasses import replace

        return replace(
            plan, clauses=tuple(_transform(c, exp, in_span=True) for c in plan.clauses)
        )
    if isinstance(plan, SpanNot):
        return SpanNot(
            _transform(plan.include, exp, in_span=True),
            _transform(plan.exclude, exp, in_span=True),
        )
    if isinstance(plan, SpanFirst):
        return SpanFirst(_transform(plan.match, exp, in_span=True), plan.end)
    return plan  # Term / SpanTerm / Phrase / MatchAll / MatchNone


def _literal_terms(plan: Plan, out: set) -> None:
    """Every literal the transformed plan can reference (incl. must_not —
    verification must SEE a negated term to exclude its docs)."""
    if isinstance(plan, (Term, SpanTerm)):
        out.add(plan.value)
    elif isinstance(plan, Phrase):
        out.update(plan.terms)
    elif isinstance(plan, Bool):
        for g in (plan.must, plan.should, plan.must_not, plan.filter):
            for c in g:
                _literal_terms(c, out)
    elif isinstance(plan, (SpanNear, SpanOr)):
        for c in plan.clauses:
            _literal_terms(c, out)
    elif isinstance(plan, SpanNot):
        _literal_terms(plan.include, out)
        _literal_terms(plan.exclude, out)
    elif isinstance(plan, SpanFirst):
        _literal_terms(plan.match, out)


def _fields_of(plan: Plan, out: set) -> None:
    if isinstance(plan, (Term, SpanTerm, Phrase, Wildcard, Fuzzy, Regexp)):
        out.add(plan.field)
    elif isinstance(plan, Bool):
        for g in (plan.must, plan.should, plan.must_not, plan.filter):
            for c in g:
                _fields_of(c, out)
    elif isinstance(plan, (SpanNear, SpanOr)):
        for c in plan.clauses:
            _fields_of(c, out)
    elif isinstance(plan, SpanNot):
        _fields_of(plan.include, out)
        _fields_of(plan.exclude, out)
    elif isinstance(plan, SpanFirst):
        _fields_of(plan.match, out)


def _needs_positions(plan: Plan) -> bool:
    if isinstance(plan, Phrase):
        return len(plan.terms) > 1
    if isinstance(plan, (SpanNear, SpanOr, SpanNot, SpanFirst)):
        return True
    if isinstance(plan, Bool):
        return any(
            _needs_positions(c)
            for g in (plan.must, plan.should, plan.must_not, plan.filter)
            for c in g
        )
    return False


def _gate_groups(plan: Plan) -> list[list[str]]:
    """Conjunctive term-group gates of the TRANSFORMED (literal-only) plan:
    a matching doc holds >=1 term of every group."""
    from ..sources.registry import _flatten_groups

    approx = limiting_filter(plan)
    groups = _flatten_groups(approx) if approx is not None else None
    if not groups:
        raise UnsupportedIndexQuery(
            "query has no positive token constraint (pure negation / "
            "match_all): top-k retrieval from the index needs >=1 required "
            "term group"
        )
    return [sorted({v for _k, _f, v in g}) for g in groups]


def _needs_verify(plan: Plan) -> bool:
    from ..sources.registry import _needs_verify as nv

    return nv(plan)


def dsl_topk_from_index(
    spark: SparkSession,
    index_dir: str,
    queries: dict[str, dict | str | Plan],
    k: int = 10,
    round_to: int | None = 4,
) -> DataFrame:
    """(query_id, rank, doc_id, score_r, score) — BM25 top-k of arbitrary
    registrable DSL queries answered entirely from the persisted index.

    Rank-identical to the in-memory engine (search over Engine docs) on the
    same corpus: same match semantics (plans/eval_py), same weight map
    (positive_term_weights), same deterministic merge (rounded score desc,
    doc_id asc).
    """
    manifest = read_manifest(index_dir)

    compiled = {
        qid: q if isinstance(q, Plan) else compile_query(q)
        for qid, q in queries.items()
    }
    atoms: dict = {}
    for p in compiled.values():
        _collect_multiterm(p, atoms)
    exp = _expand_from_index(spark, index_dir, atoms)

    plans_t: dict[str, Plan] = {}
    gates: dict[str, list[list[str]]] = {}
    weights: dict[str, dict[str, float]] = {}
    verify: dict[str, bool] = {}
    fields: dict[str, tuple[str, ...]] = {}
    vocab: set[str] = set()
    want_pos = False
    for qid, p in compiled.items():
        pt = _transform(p, exp)
        if isinstance(pt, MatchNone):
            continue  # e.g. a wildcard matching nothing in the dictionary
        plans_t[qid] = pt
        gates[qid] = _gate_groups(pt)
        w: dict[str, float] = {}
        for (_f, t), wt in positive_term_weights(pt).items():
            w[t] = w.get(t, 0.0) + wt
        weights[qid] = w
        verify[qid] = _needs_verify(pt)
        fs: set = set()
        _fields_of(pt, fs)
        fields[qid] = tuple(sorted(fs)) or ("content",)
        lits: set = set()
        _literal_terms(pt, lits)
        lits.discard(_NEVER)
        vocab |= lits
        want_pos = want_pos or (verify[qid] and _needs_positions(pt))

    all_terms = sorted(vocab)
    dfs = read_term_stats(spark, index_dir, all_terms)
    idfs = {t: _idf(manifest.n_docs, dfs.get(t, 0)) for t in all_terms}

    postings = read_postings(spark, index_dir, all_terms).select(
        "segment_id", "term", "blocks"
    )
    out_schema = "query_id string, doc_id long, score double"

    def per_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        by_term = {r.term: r.blocks for r in pdf.itertuples()}
        dec: dict[str, tuple[np.ndarray, np.ndarray, list | None]] = {}

        def get(t: str):
            """(sorted doc_ids, norms, positions-per-doc|None), decoded once."""
            if t not in dec:
                if t not in by_term:
                    return None
                docs_l, norms_l, pos_l = [], [], []
                for blk in by_term[t]:
                    doc_ids, tfs, norms = decode_block(blk)
                    docs_l.append(doc_ids)
                    norms_l.append(norms)
                    if want_pos:
                        pb = blk["pos_bytes"]
                        if pb is None:
                            raise ValueError(
                                "positional DSL query but index was built "
                                "without positions=True"
                            )
                        flat = decode_positions(bytes(pb), tfs)
                        bounds = np.concatenate([[0], np.cumsum(tfs)]).astype(np.int64)
                        pos_l.extend(
                            flat[bounds[i] : bounds[i + 1]]
                            for i in range(len(doc_ids))
                        )
                dec[t] = (
                    np.concatenate(docs_l),
                    np.concatenate(norms_l),
                    pos_l if want_pos else None,
                )
            return dec[t]

        def docs_of(t: str) -> np.ndarray:
            d = get(t)
            return d[0] if d is not None else np.empty(0, np.int64)

        rows: list[tuple[str, int, float]] = []
        for qid, groups in gates.items():
            # retrieve: intersect the union-per-group doc sets
            cand: np.ndarray | None = None
            for g in groups:
                u = (
                    np.unique(np.concatenate([docs_of(t) for t in g]))
                    if g
                    else np.empty(0, np.int64)
                )
                cand = u if cand is None else np.intersect1d(cand, u, assume_unique=True)
                if cand.size == 0:
                    break
            if cand is None or cand.size == 0:
                continue
            # verify: exact evaluation against the reconstructed doc view
            if verify[qid]:
                pt = plans_t[qid]
                lits: set = set()
                _literal_terms(pt, lits)
                lits.discard(_NEVER)
                present = [(t, get(t)) for t in sorted(lits)]
                present = [(t, d) for t, d in present if d is not None]
                keep = []
                for d in cand.tolist():
                    if want_pos:
                        slots: list[tuple[int, str]] = []
                        for t, (docs_t, _n, pos_t) in present:
                            i = int(np.searchsorted(docs_t, d))
                            if i < len(docs_t) and docs_t[i] == d:
                                slots.extend((int(p), t) for p in pos_t[i])
                        if not slots:
                            continue
                        toks = [_HOLE] * (max(p for p, _ in slots) + 1)
                        for p, t in slots:
                            toks[p] = t
                    else:
                        toks = [
                            t
                            for t, (docs_t, _n, _p) in present
                            if (
                                (i := int(np.searchsorted(docs_t, d))) < len(docs_t)
                                and docs_t[i] == d
                            )
                        ]
                    doc_view = {f: toks for f in fields[qid]}
                    if eval_plan(pt, doc_view):
                        keep.append(d)
                cand = np.asarray(keep, dtype=np.int64)
                if cand.size == 0:
                    continue
            # score: sum of weight * norm over the query's positive terms
            scores = np.zeros(len(cand), dtype=np.float64)
            for t, w in weights[qid].items():
                d = get(t)
                if d is None:
                    continue
                docs_t, norms_t, _ = d
                idx = np.searchsorted(docs_t, cand)
                ok = (idx < len(docs_t)) & (docs_t[np.minimum(idx, len(docs_t) - 1)] == cand)
                scores[ok] += w * idfs[t] * norms_t[idx[ok]]
            # local k-cut on the same (rounded desc, doc asc) key the merge uses
            pairs = heapq.nsmallest(
                k,
                zip(cand.tolist(), scores.tolist()),
                key=lambda kv: (-_round_half_up(kv[1], round_to), kv[0]),
            )
            rows.extend((qid, d, s) for d, s in pairs)
        return pd.DataFrame(rows, columns=["query_id", "doc_id", "score"])

    local = postings.groupBy("segment_id").applyInPandas(per_segment, out_schema)
    rank_score = F.round("score", round_to) if round_to is not None else F.col("score")
    w = Window.partitionBy("query_id").orderBy(F.desc("score_r"), F.asc("doc_id"))
    return (
        local.withColumn("score_r", rank_score)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score_r", "score")
    )
