"""Fixed-iteration integer PageRank (operators/pagerank.py): fixed-point
on regular graphs, mass concentration on stars, multigraph edge
semantics, and determinism across repeated runs."""

from pyspark.sql import functions as F

from data_pipeline_spark.operators.pagerank import pagerank


def _ranks(spark, edges, n, iters=3):
    nodes = spark.range(n).select(F.col("id").alias("node"))
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    out = pagerank(nodes, e, iters=iters)
    return {r["node"]: r["pr"] for r in out.collect()}


def test_ring_graph_is_a_fixed_point(spark):
    """On a directed ring (out-degree 1, in-degree 1) uniform ppm mass is
    exact: pr' = 150000 + (85 * 1_000_000) div 100 = 1_000_000."""
    n = 8
    pr = _ranks(spark, [(i, (i + 1) % n) for i in range(n)], n, iters=4)
    assert pr == {i: 1_000_000 for i in range(n)}


def test_star_concentrates_mass_on_hub(spark):
    """Everyone links to node 0; node 0 links to node 1. The hub must
    outrank every spoke, and the hub's sole target outranks other spokes
    (it inherits the hub's mass one tick later)."""
    n = 6
    edges = [(i, 0) for i in range(1, n)] + [(0, 1)]
    pr = _ranks(spark, edges, n)
    assert pr[0] == max(pr.values())
    assert all(pr[0] > pr[i] for i in range(2, n))
    assert all(pr[1] > pr[i] for i in range(2, n))
    # spokes with identical in-links tie exactly (integer determinism)
    assert len({pr[i] for i in range(2, n)}) == 1


def test_parallel_edges_weight_contributions(spark):
    """Multigraph semantics: node 0 links twice to 1 and once to 2 —
    node 1 receives 2/3 of 0's contribution, node 2 one third, and both
    shares are exact floor divisions of pr/out_degree."""
    edges = [(0, 1), (0, 1), (0, 2), (1, 0), (2, 0)]
    pr = _ranks(spark, edges, 3, iters=1)
    third = 1_000_000 // 3
    assert pr[1] == 150_000 + (85 * 2 * third) // 100
    assert pr[2] == 150_000 + (85 * third) // 100


def test_dangling_nodes_keep_base_mass(spark):
    """A node with no out-links contributes nothing but still receives
    the damping base; a node with no in-links floors at exactly the
    base."""
    # 0 -> 1; 1 is dangling; 2 is isolated
    pr = _ranks(spark, [(0, 1)], 3, iters=2)
    assert pr[2] == 150_000          # no in-links: pure base
    assert pr[0] == 150_000          # its only in-link source is dangling
    assert pr[1] > 150_000           # fed by 0


def test_deterministic_across_runs(spark):
    edges = [(i, (i * 3 + 1) % 7) for i in range(7)] + [
        (i, (i * 5 + 2) % 7) for i in range(7)
    ]
    a = _ranks(spark, edges, 7)
    b = _ranks(spark, edges, 7)
    assert a == b
