"""Tests for incremental graph union (G5/G6) and query-side operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from knowledge_graph_spark.operators import merge as M
from knowledge_graph_spark.operators import query as Q


@pytest.fixture(scope="module")
def node_frames(spark):
    old = spark.createDataFrame(
        [("A", "PERSON", "old A", ["u1"]), ("B", "", "old B", ["u2"])],
        "title string, type string, description string, source_id array<string>",
    )
    new = spark.createDataFrame(
        [("B", "GEO", "new B", ["u3"]), ("C", "ORG", "new C", ["u4"])],
        "title string, type string, description string, source_id array<string>",
    )
    return old, new


def test_incremental_union_nodes(node_frames):
    old, new = node_frames
    got = {r.title: r for r in M.incremental_union_nodes(old, new).collect()}
    assert set(got) == {"A", "B", "C"}
    assert got["A"].description == "old A" and got["A"].source_id == ["u1"]
    # collision: framed description (reference utils/graph.py:85-92),
    # source ids concatenated old-first; type keeps the OLD value —
    # graph.py:88-91 updates only source_id/description
    assert got["B"].description == "Old Information---\nold B\nNew Information---\nnew B"
    assert got["B"].source_id == ["u2", "u3"]
    assert got["B"].type == ""
    assert got["C"].description == "new C"


def test_incremental_union_edges(spark):
    old = spark.createDataFrame(
        [("A", "B", 2.0, "ab old", ["u1"])],
        "source string, target string, weight double, description string, text_unit_ids array<string>",
    )
    new = spark.createDataFrame(
        [("A", "B", 5.0, "ab new", ["u2"]), ("B", "C", 1.0, "bc", ["u3"])],
        "source string, target string, weight double, description string, text_unit_ids array<string>",
    )
    got = {(r.source, r.target): r for r in M.incremental_union_edges(old, new).collect()}
    ab = got[("A", "B")]
    assert ab.weight == 2.0  # old value kept (reference graph.py:104-108)
    assert ab.description == "Old---\nab old\nNew---\nab new"
    assert ab.text_unit_ids == ["u1", "u2"]
    assert got[("B", "C")].description == "bc"


def test_cluster_union_deltas(spark):
    old = spark.createDataFrame([("A", 1), ("B", 2)], "title string, v int")
    new = spark.createDataFrame([("B", 9), ("C", 3), ("A", 1)], "title string, v int")
    merged, added, updated = M.cluster_union(old, new, key=["title"])
    assert {(r.title, r.v) for r in merged.collect()} == {("A", 1), ("B", 9), ("C", 3)}
    assert {r.title for r in added.collect()} == {"C"}
    assert {r.title for r in updated.collect()} == {"B"}  # A unchanged → not a delta


@pytest.fixture(scope="module")
def ranked_edges(spark):
    return spark.createDataFrame(
        [
            ("A", "B", 5.0, 4), ("A", "C", 3.0, 5), ("B", "C", 1.0, 3),
            ("C", "D", 2.0, 4),
        ],
        "source string, target string, weight double, rank int",
    )


def test_related_entities(ranked_edges):
    got = [(r.neighbor, r.rk) for r in Q.related_entities(ranked_edges, "C", k=2).collect()]
    assert got == [("A", 1), ("D", 2)]  # by weight desc (3.0, 2.0, 1.0 → top 2)


def test_split_network(spark, ranked_edges):
    sel = spark.createDataFrame([("A",), ("B",)], "title string")
    in_net, out_net = Q.split_network_relationships(ranked_edges, sel)
    assert {(r.source, r.target) for r in in_net.collect()} == {("A", "B")}
    out = out_net.collect()
    # exactly-one-endpoint-selected edges; (C,D) has zero → excluded
    assert {(r.source, r.target) for r in out} == {("A", "C"), ("B", "C")}
    by_pair = {(r.source, r.target): r for r in out}
    assert by_pair[("A", "C")].links == 2 and by_pair[("A", "C")].external == "C"
    assert by_pair[("B", "C")].links == 2 and by_pair[("B", "C")].external == "C"


def test_community_weight(spark):
    nodes = spark.createDataFrame(
        [("A", ["u1", "u2"]), ("B", ["u2"]), ("C", ["u3"])],
        "title string, source_id array<string>",
    )
    comm = spark.createDataFrame(
        [("A", "g1"), ("B", "g1"), ("C", "g2")], "title string, community string"
    )
    got = {r.community: r for r in Q.community_weight(nodes, comm).collect()}
    assert got["g1"].n_text_units == 2  # u2 deduplicated
    assert got["g1"].normalized_weight == 1.0
    assert got["g2"].n_text_units == 1 and got["g2"].normalized_weight == 0.5


def test_rank_text_units(spark):
    tue = spark.createDataFrame(
        [("t1", "A"), ("t1", "B"), ("t2", "B"), ("t3", "A")],
        "text_unit_id string, title string",
    )
    order = spark.createDataFrame([("A", 1), ("B", 2)], "title string, entity_rank int")
    got = {r.text_unit_id: r.order for r in Q.rank_text_units(tue, order).collect()}
    assert got == {"t1": 1, "t3": 2, "t2": 3}  # t1: rank1+2ents; t3: rank1+1; t2: rank2


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_retract_conversations_equals_rebuild(spark):
    """retract(full records, deleted convs) is bit-identical to a
    ground-up rebuild on the retained transcripts — nodes AND edges —
    and retracting the empty set is the identity."""
    from knowledge_graph_spark.pipeline import PipelineConfig, build_graph
    from knowledge_graph_spark.synth import synth_transcripts

    cfg = PipelineConfig(chunk_size=120, chunk_overlap=0, tokenizer="ws")
    t = synth_transcripts(spark, n_convs=30, base_turns=6)
    full = build_graph(t, cfg)
    deleted = t.select("conv_id").distinct().filter(
        F.pmod(F.xxhash64("conv_id"), F.lit(3)) == 0
    )
    assert deleted.count() > 0
    got_nodes, got_edges = M.retract_conversations(full["raw_records"], deleted)

    retained = t.join(deleted, "conv_id", "left_anti")
    want = build_graph(retained, cfg)
    assert _sorted_rows(got_edges) == _sorted_rows(want["edges"])
    # node rows carry array columns — normalize to tuples-of-sorted
    norm = lambda df: sorted(  # noqa: E731
        (r.title, r.type, r.description, tuple(sorted(r.source_id)))
        for r in df.collect()
    )
    assert norm(got_nodes) == norm(want["nodes"])

    # empty delete set: identity
    none_deleted = deleted.limit(0)
    id_nodes, id_edges = M.retract_conversations(full["raw_records"], none_deleted)
    assert _sorted_rows(id_edges) == _sorted_rows(full["edges"])
