"""Iterative graph operators (operators/components.py) vs plain-Python
references: union-find for components, numpy power iteration for PageRank."""

import numpy as np
import pandas as pd
import pytest

from rendler_spark.operators.components import (
    connected_components, dedup_clusters, pagerank,
)


def _uf_components(edges):
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


@pytest.fixture(scope="module")
def graph():
    rng = np.random.default_rng(17)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 120, size=(150, 2)) if a != b]
    return edges


def test_connected_components_match_union_find(spark, graph):
    df = spark.createDataFrame(pd.DataFrame(graph, columns=["src", "dst"]))
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    # union-find gives min-root per node after path compression to min
    want_roots = _uf_components(graph)
    # canonicalize: component label must be the min node id of the group
    groups = {}
    for n, r in want_roots.items():
        groups.setdefault(r, []).append(n)
    want = {n: min(ns) for r, ns in groups.items() for n in ns}
    assert got == want


def test_dedup_clusters_keep_one_per_group(spark):
    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": [1, 2, 10], "id_b": [2, 3, 11]})
    )
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [1, 2, 3, 10, 11, 50]}))
    got = {
        r["doc_id"]: r["canonical"]
        for r in dedup_clusters(pairs, docs, "doc_id").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 50: 50}
    keep = sorted(k for k, v in got.items() if k == v)
    assert keep == [1, 10, 50]  # one survivor per duplicate cluster


def test_pagerank_matches_numpy_power_iteration(spark, graph):
    df = spark.createDataFrame(pd.DataFrame(graph, columns=["src", "dst"]))
    got = {r["node"]: r["rank"] for r in pagerank(df, n_iter=10).collect()}
    nodes = sorted({n for e in graph for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for s, _ in graph:
        deg[idx[s]] += 1
    r = np.ones(n)
    d = 0.85
    for _ in range(10):
        inflow = np.zeros(n)
        for s, t in graph:
            inflow[idx[t]] += r[idx[s]] / deg[idx[s]]
        dangling = r[deg == 0].sum()
        r = (1 - d) + d * dangling / n + d * inflow
    for node in nodes:
        assert got[node] == pytest.approx(r[idx[node]], rel=1e-9), node
    assert sum(got.values()) == pytest.approx(n, rel=1e-6)  # mass conserved


def test_triangle_count_degree_orientation_kills_hub_wedges(spark):
    """Star graph (one hub, n spokes, hub id in the MIDDLE of the id
    range): id-orientation would generate ~(n/2)^2 wedges at the hub;
    degree orientation points every edge INTO the hub (outdegree 0), so
    the wedge frame must be EMPTY and the count 0.  Then a known-count
    sanity: K4 has exactly 4 triangles and linear wedge volume."""
    import pandas as pd

    from rendler_spark.operators.components import (
        orient_edges_by_degree,
        triangle_count,
        triangle_wedges,
    )

    n = 200
    hub = n // 2  # spokes occupy 0..n, skipping the hub id
    spokes = [i for i in range(n + 1) if i != hub]
    star = spark.createDataFrame(
        pd.DataFrame({"src": [hub] * len(spokes), "dst": spokes})
    )
    assert triangle_wedges(orient_edges_by_degree(star)).count() == 0
    assert triangle_count(star).first()["n_triangles"] == 0
    # id-orientation control: the same star yields quadratic wedges
    import pyspark.sql.functions as F

    und = star.select(
        F.least("src", "dst").alias("x"), F.greatest("src", "dst").alias("y")
    ).distinct()
    id_wedges = triangle_wedges(und).count()
    # hub-middle wedges = indegree * outdegree = 100 * 100
    assert id_wedges == hub * (len(spokes) - hub)

    k4 = spark.createDataFrame(
        pd.DataFrame(
            {"src": [0, 0, 0, 1, 1, 2], "dst": [1, 2, 3, 2, 3, 3]}
        )
    )
    assert triangle_count(k4).first()["n_triangles"] == 4
    assert triangle_wedges(orient_edges_by_degree(k4)).count() <= 6
