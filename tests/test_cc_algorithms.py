"""Both connected-components algorithms (min-label propagation and
large-star/small-star hooking) must produce identical clusters, equal to a
driver-side union-find reference — including on adversarial long-chain
graphs where propagation needs O(diameter) rounds."""

import random

from data_pipeline_spark.operators.dedup import (
    connected_components,
    connected_components_star,
)


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _check(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_a bigint, doc_b bigint")
    want = _union_find(pairs)
    for fn in (connected_components, connected_components_star):
        got = {r.doc_id: r.cluster_id for r in fn(df).collect()}
        assert got == want, fn.__name__
    # cluster_id is the component minimum
    assert all(v <= k for k, v in want.items())


def test_cc_long_chain(spark):
    """Path graph 0-1-...-19: diameter 19. The star algorithm must still
    converge (in far fewer than 19 rounds) to the single component."""
    _check(spark, [(i, i + 1) for i in range(19)])


def test_cc_two_chains_and_singleton_pair(spark):
    pairs = (
        [(i, i + 1) for i in range(0, 8)]        # chain 0..8
        + [(i, i + 1) for i in range(100, 105)]  # chain 100..105
        + [(500, 501)]
    )
    _check(spark, pairs)


def test_cc_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 40
        m = rng.randrange(10, 60)
        pairs = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        if not pairs:
            pairs = [(0, 1)]
        _check(spark, pairs)


def test_cc_star_reversed_input_orientation(spark):
    """Edges given as (big, small) — canonicalization must not matter."""
    _check(spark, [(5, 0), (1, 5), (9, 1), (3, 7)])
