"""The reference's crown-jewel test at full size: 10,000 random query trees
over 1,000 random docs, fixed seed — the limiting filter's match set must be
a SUPERSET of the exact query's match set
(LimitingFilterFactoryTest.groovy.txt:67-99, seed 158556155086072256).

Pure Python (plans/eval_py + plans/limiting): the per-tree work is tiny, so
the full 10k x sampled-docs sweep runs in seconds; the Spark integration of
the same contract is covered by test_percolate.py's randomized oracle.
"""

import random

from elasticsearch_batch_percolator_spark.plans.eval_py import eval_plan
from elasticsearch_batch_percolator_spark.plans.limiting import limiting_filter
from elasticsearch_batch_percolator_spark.plans.query_plan import (
    Bool,
    MatchAll,
    Phrase,
    SpanNear,
    SpanNot,
    SpanOr,
    SpanTerm,
    Term,
    Wildcard,
    WildcardPhrase,
)

FIELD = "content"
VOCAB = list("abcdefgh")
PATTERNS = ["a*", "?b", "c?", "*e*", "f", "a?c", "*", "g*h"]
SEED = 158556155086072256  # the reference's fixed seed


def _random_plan(rng: random.Random, depth: int):
    kind = rng.randrange(9 if depth > 0 else 7)
    if kind == 0:
        return Term(FIELD, rng.choice(VOCAB))
    if kind == 1:
        return Wildcard(FIELD, rng.choice(PATTERNS))
    if kind == 2:
        return Phrase(FIELD, tuple(rng.choices(VOCAB, k=rng.randint(1, 3))), rng.choice([0, 0, 1, 2]))
    if kind == 3:
        prods = tuple(
            Term(FIELD, rng.choice(VOCAB)) if rng.random() < 0.5
            else Wildcard(FIELD, rng.choice(PATTERNS[:4]))
            for _ in range(rng.randint(1, 3))
        )
        return WildcardPhrase(FIELD, prods)
    if kind == 4:
        return MatchAll()
    if kind in (5, 6):
        def span(d):
            k2 = rng.randrange(4 if d > 0 else 1)
            if k2 == 0:
                return SpanTerm(FIELD, rng.choice(VOCAB))
            if k2 == 1:
                return SpanNear(
                    tuple(span(d - 1) for _ in range(rng.randint(1, 3))),
                    rng.randint(0, 3),
                    rng.random() < 0.5,
                )
            if k2 == 2:
                return SpanOr(tuple(span(d - 1) for _ in range(rng.randint(1, 3))))
            return SpanNot(span(d - 1), span(d - 1))

        return span(min(depth, 2))
    # bool
    def many(n):
        return tuple(_random_plan(rng, depth - 1) for _ in range(rng.randint(0, n)))

    plan = Bool(must=many(3), should=many(3), must_not=many(2), filter=many(1))
    if plan.should and rng.random() < 0.3:
        # minimum_should_match in [1, len(should)] — stays satisfiable
        # (compile_query normalizes msm > len(should) to MatchNone)
        plan = Bool(plan.must, plan.should, plan.must_not, plan.filter,
                    msm=rng.randint(1, len(plan.should)))
    if not (plan.must or plan.should or plan.must_not or plan.filter):
        return Term(FIELD, rng.choice(VOCAB))
    return plan


def test_limiting_superset_10k_trees():
    rng = random.Random(SEED)
    docs = [
        {FIELD: rng.choices(VOCAB, k=rng.randint(0, 12))} for _ in range(1000)
    ]
    n_approximated = 0
    n_absent = 0
    for i in range(10_000):
        plan = _random_plan(rng, depth=3)
        approx = limiting_filter(plan)
        if approx is None:
            n_absent += 1
            continue
        n_approximated += 1
        # spot-sample the doc corpus per tree (full 10k x 1k = 10M evals
        # is minutes in pure python; 40 docs/tree keeps the sweep seconds
        # while every tree still gets coverage)
        for doc in rng.sample(docs, 40):
            if eval_plan(plan, doc):
                assert eval_plan(approx, doc), (
                    f"tree #{i}: approximation excluded a true match\n"
                    f"plan={plan}\napprox={approx}\ndoc={doc}"
                )
    # sanity: the generator actually produces both outcomes
    assert n_approximated > 7000
    assert n_absent > 0  # absent is rare: only negated lossy subtrees
