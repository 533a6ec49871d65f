"""Connected-components contraction (operators/graph.py).

Covers shapes the registry query can't force: long chains (multi-round
propagation), isolated components, early fixpoint termination, and
determinism across repartitionings.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hudi_rs_spark.operators.graph import connected_components


def _components(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    out = connected_components(df, **kw)
    return {r["node"]: r["component"] for r in out.collect()}


class TestConnectedComponents:
    def test_two_triangles(self, spark):
        got = _components(spark, [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12)])
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}

    def test_chain_needs_multiple_rounds(self, spark):
        # 0-1-2-...-9: diameter 9; min label must walk the whole chain.
        got = _components(spark, [(i, i + 1) for i in range(9)])
        assert got == {i: 0 for i in range(10)}

    def test_non_convergence_raises(self, spark):
        # r3 advisory: exhausting max_rounds with labels still moving must
        # RAISE, not silently return non-fixpoint labels.
        import pytest

        with pytest.raises(RuntimeError, match="did not converge"):
            _components(spark, [(i, i + 1) for i in range(9)], max_rounds=1)

    def test_chain_converges_logarithmically(self, spark):
        # pointer doubling: a diameter-30 chain converges well inside 6
        # rounds (plain 1-hop propagation would need ~30).
        got = _components(spark, [(i, i + 1) for i in range(30)], max_rounds=6)
        assert got == {i: 0 for i in range(31)}

    def test_reversed_and_duplicate_edges(self, spark):
        got = _components(spark, [(5, 2), (2, 5), (2, 1), (5, 9), (5, 9)])
        assert got == {1: 1, 2: 1, 5: 1, 9: 1}

    def test_partitioning_invariance(self, spark):
        edges = [(i, i + 1) for i in range(0, 40, 2)] + [(0, 40), (7, 9)]
        df = spark.createDataFrame(edges, ["id_a", "id_b"])
        a = connected_components(df).collect()
        b = connected_components(df.repartition(7, "id_b")).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_star_single_round(self, spark):
        # hub-and-spoke: every node adjacent to the min — one round.
        got = _components(spark, [(0, i) for i in range(1, 30)])
        assert set(got.values()) == {0}


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _union_find_components(edges):
    """Reference model: classic union-find, min id as representative."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=60,
    )
)
def test_components_match_union_find(spark, edges):
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == _union_find_components(edges)
