"""Connected components: distributed star rounds vs driver union-find vs a
pure-Python reference, on adversarial shapes (chains, stars, cliques)."""

import random

import pytest
from pyspark.sql import functions as F

from lsh_search_go_spark.operators.cc import (assign_clusters,
                                              connected_components)


def ref_cc(pairs, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def make_graph(seed):
    rng = random.Random(seed)
    pairs = []
    # long chain (worst case for naive label propagation)
    chain = [f"c{i:03d}" for i in range(40)]
    pairs += list(zip(chain, chain[1:]))
    # star
    pairs += [("hub", f"s{i:02d}") for i in range(15)]
    # clique
    clique = [f"k{i}" for i in range(6)]
    pairs += [(a, b) for a in clique for b in clique if a < b]
    # random extra edges
    all_nodes = chain + ["hub"] + [f"s{i:02d}" for i in range(15)] + clique
    for _ in range(20):
        pairs.append((rng.choice(all_nodes), rng.choice(all_nodes)))
    pairs = [(a, b) for a, b in pairs if a != b]
    nodes = sorted({x for p in pairs for x in p})
    return pairs, nodes


@pytest.mark.parametrize("mode", ["distributed", "driver"])
def test_cc_matches_reference(spark, mode):
    pairs, nodes = make_graph(9)
    exp = ref_cc(pairs, nodes)
    edges = spark.createDataFrame(pairs, "src_id string, dst_id string")
    threshold = 0 if mode == "distributed" else 2_000_000
    got = {
        r.doc_id: r.cluster_id
        for r in connected_components(edges, driver_threshold=threshold).collect()
    }
    assert got == exp


def test_assign_clusters_includes_singletons(spark):
    docs = spark.createDataFrame([("a",), ("b",), ("c",), ("z",)], "doc_id string")
    edges = spark.createDataFrame([("b", "c")], "src_id string, dst_id string")
    got = {r.doc_id: r.cluster_id for r in assign_clusters(docs, edges).collect()}
    assert got == {"a": "a", "b": "b", "c": "b", "z": "z"}


def test_cc_empty_edges(spark):
    edges = spark.createDataFrame([], "src_id string, dst_id string")
    assert connected_components(edges).count() == 0


def test_assign_clusters_join_strategy(spark):
    """The label join must never sort the corpus side: driver-path labels
    (bounded by the collect byte budget) broadcast, distributed-path labels
    hash-build (shuffle_hash) — at 10^12 ids a SortMergeJoin's corpus-side
    sort is the single most expensive avoidable operation in the stage."""
    docs = spark.createDataFrame([(str(i),) for i in range(500)],
                                 "doc_id string")
    edges = spark.createDataFrame([("1", "2"), ("7", "8")],
                                  "src_id string, dst_id string")
    expected = {r.doc_id: r.cluster_id
                for r in assign_clusters(docs, edges,
                                         docs_unique=True).collect()}

    driver = assign_clusters(docs, edges, docs_unique=True)
    plan = driver._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan

    dist = assign_clusters(docs, edges, driver_threshold=0, docs_unique=True)
    got = {r.doc_id: r.cluster_id for r in dist.collect()}
    assert got == expected, "join strategy must not change assignments"
    plan = dist._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan and "SortMergeJoin" not in plan
