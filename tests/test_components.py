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


def run_cc(spark, edges: list[tuple[str, str]]) -> dict[str, str]:
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["a", "b"]))
    out = connected_components(df).toPandas()
    return dict(zip(out.image_id, out.cluster_id))


def test_simple_chain(spark):
    got = run_cc(spark, [("b", "c"), ("a", "b"), ("c", "d")])
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a"}


def test_two_components_and_clique(spark):
    edges = [("x1", "x2"), ("x2", "x3"), ("x1", "x3"), ("y1", "y2")]
    got = run_cc(spark, edges)
    assert got == {"x1": "x1", "x2": "x1", "x3": "x1", "y1": "y1", "y2": "y1"}


def test_long_path(spark):
    nodes = [f"n{i:03d}" for i in range(40)]
    edges = list(zip(nodes, nodes[1:]))
    got = run_cc(spark, edges)
    assert set(got.values()) == {"n000"}
    assert len(got) == 40


def test_empty_edges(spark):
    df = spark.createDataFrame(pd.DataFrame({"a": ["x"], "b": ["x"]}))
    assert connected_components(df).count() == 0


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
    assert run_cc(spark, edges) == cc_reference(edges)
