"""Connected-components unit tests (small-star/large-star)."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dude_spark.operators.components import connected_components


def cc_reference(edges: list[tuple[str, str]]) -> dict[str, str]:
    """Union-find oracle."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress to minimum labels
    comp: dict[str, list[str]] = {}
    for n in list(parent):
        comp.setdefault(find(n), []).append(n)
    return {n: min(min(ns), root) for root, ns in comp.items() for n in ns}


def run_cc(spark, edges: list[tuple[str, str]], **kw) -> dict[str, str]:
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["a", "b"]))
    out = connected_components(df, **kw).toPandas()
    return dict(zip(out.image_id, out.cluster_id))


# driver_cap=0 forces the distributed star rounds; the default routes
# these tiny graphs through driver union-find — both paths must hold
# the same contract
BOTH_PATHS = pytest.mark.parametrize("cap", [0, 2_000_000])


@BOTH_PATHS
def test_simple_chain(spark, cap):
    got = run_cc(spark, [("b", "c"), ("a", "b"), ("c", "d")], driver_cap=cap)
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a"}


@BOTH_PATHS
def test_two_components_and_clique(spark, cap):
    edges = [("x1", "x2"), ("x2", "x3"), ("x1", "x3"), ("y1", "y2")]
    got = run_cc(spark, edges, driver_cap=cap)
    assert got == {"x1": "x1", "x2": "x1", "x3": "x1", "y1": "y1", "y2": "y1"}


@BOTH_PATHS
def test_long_path(spark, cap):
    nodes = [f"n{i:03d}" for i in range(40)]
    edges = list(zip(nodes, nodes[1:]))
    got = run_cc(spark, edges, driver_cap=cap)
    assert set(got.values()) == {"n000"}
    assert len(got) == 40


@BOTH_PATHS
def test_empty_edges(spark, cap):
    df = spark.createDataFrame(pd.DataFrame({"a": ["x"], "b": ["x"]}))
    assert connected_components(df, driver_cap=cap).count() == 0


def test_driver_path_matches_distributed_on_long_keys(spark):
    """Path equivalence on LONG node ids (what the pipeline feeds CC
    after id encoding), including the min-VALUE (not min-factorize-
    index) representative contract: node 5 appears first in the edge
    list but 3 must label the component."""
    edges_pdf = pd.DataFrame(
        {"a": [5, 9, 20, 21], "b": [7, 5, 21, 3]}
    )
    df = spark.createDataFrame(edges_pdf)
    fast = connected_components(df).toPandas()
    star = connected_components(df, driver_cap=0).toPandas()
    key = lambda p: sorted(map(tuple, p.values.tolist()))
    assert key(fast) == key(star)
    got = dict(zip(fast.image_id, fast.cluster_id))
    assert got == {5: 5, 7: 5, 9: 5, 20: 3, 21: 3, 3: 3}


@pytest.mark.slow
@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_random_graphs_match_union_find(spark, raw):
    edges = [(f"v{a:02d}", f"v{b:02d}") for a, b in raw if a != b]
    if not edges:
        return
    want = cc_reference(edges)
    assert run_cc(spark, edges) == want                 # driver path
    assert run_cc(spark, edges, driver_cap=0) == want   # star rounds
