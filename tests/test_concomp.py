"""connected_components (alternating star) vs union-find ground truth."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from polars_st_spark.operators.concomp import connected_components, near_dup_groups


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # label = min node of component
    comp = {}
    for x in range(n_nodes):
        r = find(x)
        comp.setdefault(r, []).append(x)
    label = {}
    for members in comp.values():
        m = min(members)
        for x in members:
            label[x] = m
    return label


def _check(spark, edges, n_nodes):
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    expected = _union_find(n_nodes, edges)
    touched = {a for a, _ in edges} | {b for _, b in edges}
    assert got == {x: expected[x] for x in touched}


def test_random_graph(spark):
    rng = np.random.default_rng(5)
    n = 200
    edges = [tuple(map(int, e)) for e in rng.integers(0, n, (150, 2))]
    _check(spark, edges, n)


def test_long_chain(spark):
    # worst-case diameter for plain label propagation; alternating star
    # must converge in O(log n) rounds
    n = 300
    edges = [(i, i + 1) for i in range(n - 1)]
    _check(spark, edges, n)


def test_many_small_components(spark):
    edges = [(2 * i, 2 * i + 1) for i in range(80)]
    _check(spark, edges, 160)


def test_self_loops_and_duplicates(spark):
    edges = [(1, 1), (2, 3), (3, 2), (2, 3), (4, 4)]
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == {1: 1, 2: 2, 3: 2, 4: 4}


def test_string_ids(spark):
    edges = [("b", "c"), ("a", "b"), ("x", "y")]
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_near_dup_groups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = [
        (0, base),
        (1, base + " extra"),            # near-dup of 0
        (2, base + " extra more"),       # near-dup of 0/1 (suffix keeps shingles)
        (3, "completely different text about spark clusters and parquet files here"),
        (4, "completely different text about spark clusters and parquet files here"),  # exact dup of 3
        (5, "unrelated singleton document with nothing in common whatsoever friends"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = near_dup_groups(df, threshold=0.3).orderBy("doc_id").collect()
    groups = {r["doc_id"]: r["group_id"] for r in out}
    keeps = {r["doc_id"]: r["keep"] for r in out}
    assert groups[0] == groups[1] == groups[2] == 0
    assert groups[3] == groups[4] == 3
    assert groups[5] == 5
    assert keeps == {0: True, 1: False, 2: False, 3: True, 4: False, 5: True}
