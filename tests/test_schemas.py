"""Schema-registry conformance: pipeline outputs must carry the declared
column names/types (the registry is the de-facto export contract,
mirroring the reference's CSV schemas — knowledge_graph_spark/schemas.py)."""

from __future__ import annotations

from pyspark.sql import types as T

from knowledge_graph_spark import schemas as S
from knowledge_graph_spark.operators.assemble import assemble_conversations
from knowledge_graph_spark.operators.chunk import split_text_units
from knowledge_graph_spark.operators.extract import emit_records
from knowledge_graph_spark.operators.parse import parse_and_merge
from knowledge_graph_spark.synth import synth_transcripts


def _conforms(df, schema: T.StructType, subset: bool = True):
    """Every declared field that the frame carries must have the declared
    type; with subset=False the frame must carry ALL declared fields."""
    declared = {f.name: f.dataType for f in schema.fields}
    actual = {f.name: f.dataType for f in df.schema.fields}
    missing = [n for n in declared if n not in actual]
    if not subset:
        assert not missing, f"missing declared columns: {missing}"
    for name, dtype in actual.items():
        if name in declared:
            # simpleString ignores nullability flags — the contract is
            # about logical types, not containsNull bookkeeping
            assert dtype.simpleString() == declared[name].simpleString(), (
                f"{name}: {dtype.simpleString()} != declared {declared[name].simpleString()}"
            )


def test_pipeline_outputs_match_registry(spark):
    t = synth_transcripts(spark, n_convs=4, base_turns=6)
    assert t.schema == S.TRANSCRIPTS or {
        f.name for f in t.schema.fields
    } == {f.name for f in S.TRANSCRIPTS.fields}
    docs = assemble_conversations(t)
    _conforms(docs, S.CONV_DOCS, subset=False)
    units = split_text_units(docs, size=64, overlap=8, tokenizer="ws")
    _conforms(units, S.TEXT_UNITS, subset=False)
    raw = emit_records(units)
    _conforms(raw, S.RAW_RECORDS, subset=False)
    nodes, edges = parse_and_merge(raw)
    _conforms(nodes, S.NODES)  # pre-id subset: title/type/description/source_id
    _conforms(edges, S.EDGES)


def test_final_tables_match_registry(spark, tmp_path):
    import sys

    sys.path.insert(0, ".")
    import jobs.run_pipeline as job

    out = str(tmp_path / "kg_schema_out")
    job.main([
        "--input", "/root/testdata/sf0.001", "--from-events", "--output", out,
        "--chunk-size", "128", "--chunk-overlap", "16", "--tokenizer", "ws",
        "--master", "local[4]",
    ])
    nodes = spark.read.parquet(f"{out}/nodes_final")
    _conforms(nodes, S.NODES)
    assert {"id", "human_readable_id", "degree", "summary"} <= set(nodes.columns)
    edges = spark.read.parquet(f"{out}/edges_final")
    _conforms(edges, S.EDGES)
    assert {"id", "rank", "source_degree", "target_degree"} <= set(edges.columns)
    reports = spark.read.parquet(f"{out}/community_reports")
    _conforms(reports, S.COMMUNITY_REPORTS)
