"""End-to-end invariants on the synthetic tiny corpus (FIXTURES.md F3) and
full-corpus triple parity vs the sequential oracle (the P/R >= 0.95 gate —
exact equality expected with the deterministic backend)."""

from pyspark.sql import functions as F

from knowledge_graph_spark import oracle as orc
from knowledge_graph_spark.operators.assemble import assemble_conversations
from knowledge_graph_spark.operators.chunk import split_text_units
from knowledge_graph_spark.operators.extract import emit_records
from knowledge_graph_spark.operators.graphops import (
    node_degrees,
    with_edge_rank,
    with_node_ids,
)
from knowledge_graph_spark.operators.parse import parse_and_merge
from knowledge_graph_spark.synth import synth_transcripts


def _run(spark, n_convs=12, base_turns=8, size=60, overlap=10):
    t = synth_transcripts(spark, n_convs=n_convs, base_turns=base_turns)
    docs = assemble_conversations(t)
    units = split_text_units(docs, size=size, overlap=overlap, tokenizer="ws")
    raw = emit_records(units)
    nodes, edges = parse_and_merge(raw)
    return t, units, raw, nodes, edges


def test_pipeline_invariants(spark):
    t, units, raw, nodes, edges = _run(spark)
    e = edges.collect()
    assert len(e) > 0
    # canonical undirected pairs
    assert all(r.source < r.target for r in e)
    # weights are whole counts >= 1 under the unit-weight backend
    assert all(r.weight >= 1.0 and r.weight == int(r.weight) for r in e)
    # degree consistency: sum(degree) == 2 |E|
    deg = node_degrees(edges)
    assert (
        deg.agg(F.sum("degree")).collect()[0][0] == 2 * len(e)
    )
    ranked = with_edge_rank(edges, deg).collect()
    assert all(r.rank == r.source_degree + r.target_degree for r in ranked)
    # every edge endpoint exists as a node
    titles = {r.title for r in nodes.collect()}
    assert all(r.source in titles and r.target in titles for r in e)


def test_full_corpus_triple_parity(spark):
    """Feed the SAME raw records to the sequential oracle; P/R must be 1.0."""
    _, _, raw, nodes, edges = _run(spark)
    recs = [(r.text_unit_id, r.records) for r in raw.collect()]
    o_nodes, o_edges = orc.parse_records_oracle(sorted(recs))

    ours = {
        (r.source, pred, r.target)
        for r in edges.collect()
        for pred in r.description.split("\n")
    }
    p, rcl = orc.precision_recall(ours, orc.triples(o_edges))
    assert (p, rcl) == (1.0, 1.0)
    # node titles match too
    assert {r.title for r in nodes.collect()} == set(o_nodes)


def test_empty_mention_conversations(spark):
    """Conversations with no extractable mentions flow through cleanly."""
    t = synth_transcripts(spark, n_convs=11, base_turns=4)  # conv 10 is empty
    docs = assemble_conversations(t)
    units = split_text_units(docs, size=500, overlap=0, tokenizer="ws")
    raw = emit_records(units)
    nodes, edges = parse_and_merge(raw)
    # pipeline doesn't fail and produces rows for the non-empty convs
    assert nodes.count() > 0


def test_node_ids_deterministic_and_dense(spark):
    _, _, _, nodes, _ = _run(spark, n_convs=5)
    with_ids = with_node_ids(nodes).collect()
    hrids = sorted(r.human_readable_id for r in with_ids)
    assert hrids == list(range(len(with_ids)))
    by_title = sorted(with_ids, key=lambda r: r.title)
    assert [r.human_readable_id for r in by_title] == list(range(len(with_ids)))
