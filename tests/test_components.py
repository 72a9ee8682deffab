"""Connected components (min-label propagation) vs a Python union-find
reference on chains, cycles, stars and singleton-free random graphs."""

import numpy as np
import pytest


def _uf_components(pairs):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize("pairs", [
    [(1, 2), (2, 3), (3, 4), (10, 11)],          # chain + island
    [(1, 2), (2, 3), (3, 1), (7, 8), (8, 9), (9, 7)],  # cycles
    [(5, 1), (5, 2), (5, 3), (5, 4)],            # star, hub not min
])
def test_components_match_union_find(spark, pairs):
    from cuckoofilter_spark.operators.components import connected_components

    df = spark.createDataFrame(pairs, "d1 long, d2 long")
    got = {r["node"]: r["comp"] for r in connected_components(df).collect()}
    assert got == _uf_components(pairs)


def test_components_random_graph(spark):
    from cuckoofilter_spark.operators.components import (
        cluster_representatives,
        connected_components,
    )

    rng = np.random.default_rng(3)
    pairs = [(int(a), int(b)) for a, b in rng.integers(0, 300, size=(400, 2))
             if a != b]
    df = spark.createDataFrame(pairs, "d1 long, d2 long")
    got = {r["node"]: r["comp"] for r in connected_components(df).collect()}
    assert got == _uf_components(pairs)

    reps = cluster_representatives(df).collect()
    comps = {r["comp"] for r in reps}
    keepers = {r["node"] for r in reps if r["keep"]}
    assert keepers == comps  # exactly one keeper per component: its min


def test_long_chain_converges_via_pointer_jumping(spark):
    """A diameter-63 chain needs ~63 plain-propagation rounds; pointer
    jumping must close it well inside the default budget."""
    from cuckoofilter_spark.operators.components import connected_components

    pairs = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(pairs, "d1 long, d2 long")
    got = {r["node"]: r["comp"]
           for r in connected_components(df, max_iter=10).collect()}
    assert got == {i: 0 for i in range(64)}


def test_nonconvergence_raises_instead_of_mislabeling(spark):
    """Exhausting max_iter before the fixpoint must raise — silently wrong
    component labels would poison every downstream dedup decision."""
    from cuckoofilter_spark.operators.components import connected_components

    pairs = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(pairs, "d1 long, d2 long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=1)
