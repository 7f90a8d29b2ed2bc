"""spark-submit entry point: full KG construction over a transcripts table.

Cluster usage (north rule: spark-submit --py-files at N / 4N executors):

    zip -r kg.zip knowledge_graph_spark
    spark-submit --py-files kg.zip \
      --conf spark.sql.adaptive.enabled=true \
      --conf spark.sql.adaptive.skewJoin.enabled=true \
      --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions \
      --conf spark.sql.catalog.local=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.local.type=hadoop \
      --conf spark.sql.catalog.local.warehouse=s3a://bucket/warehouse \
      jobs/run_pipeline.py --input local.db.transcripts --iceberg local \
      --output s3a://bucket/kg_out

Sandbox usage (parquet fallback, local master):

    python jobs/run_pipeline.py --input /root/testdata/sf0.01 --from-events \
      --output /tmp/kg_out

Stages are checkpointed (knowledge_graph_spark.checkpoint): re-running
with the same --output resumes after the last completed stage; pass
--force to rebuild everything.  The transcripts scan is repartitioned by
hash(conv_id) before extraction (north rule) sized by shuffle.partitions.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from knowledge_graph_spark.checkpoint import StageRunner  # noqa: E402
from knowledge_graph_spark.io import TableIO  # noqa: E402
from knowledge_graph_spark.operators.agent_trace import (  # noqa: E402
    tool_transitions,
    turn_latency,
)
from knowledge_graph_spark.operators.assemble import assemble_conversations  # noqa: E402
from knowledge_graph_spark.operators.chunk import split_text_units  # noqa: E402
from knowledge_graph_spark.operators.claims import extract_claims  # noqa: E402
from knowledge_graph_spark.operators.community import (  # noqa: E402
    hierarchical_lpa,
    label_propagation,
)
from knowledge_graph_spark.operators.extract import emit_records  # noqa: E402
from knowledge_graph_spark.operators.graphops import (  # noqa: E402
    node_degrees,
    with_edge_ids,
    with_edge_rank,
    with_node_ids,
)
from knowledge_graph_spark.operators.parse import parse_and_merge  # noqa: E402
from knowledge_graph_spark.operators.reports import (  # noqa: E402
    community_hierarchy,
    leveled_reports,
)
from knowledge_graph_spark.operators.summarize import summarize_descriptions  # noqa: E402
from knowledge_graph_spark.session import get_spark  # noqa: E402
from knowledge_graph_spark.synth import transcripts_from_events  # noqa: E402


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="transcripts table/path (or sf dir with --from-events)")
    p.add_argument("--output", required=True, help="output warehouse dir")
    p.add_argument("--from-events", action="store_true", help="derive transcripts from an events parquet dir")
    p.add_argument("--iceberg", default=None, help="Iceberg catalog name (omit for parquet)")
    p.add_argument("--chunk-size", type=int, default=1200)
    p.add_argument("--chunk-overlap", type=int, default=100)
    p.add_argument("--tokenizer", default="auto")
    p.add_argument("--max-cluster-size", type=int, default=10)  # reference leiden.py:13
    p.add_argument("--force", action="store_true", help="ignore existing checkpoints")
    p.add_argument("--master", default=None)
    return p.parse_args(argv)


def main(argv=None) -> dict:
    args = parse_args(argv)
    spark = get_spark(app_name="kg-construct", master=args.master)
    io = TableIO(spark, base=args.output, catalog=args.iceberg)
    if args.force:
        import shutil

        shutil.rmtree(os.path.join(args.output, "_manifests"), ignore_errors=True)
    runner = StageRunner(io)

    if args.from_events:
        transcripts = transcripts_from_events(spark, args.input)
    elif args.iceberg:
        transcripts = spark.read.format("iceberg").load(args.input)
    else:
        transcripts = spark.read.parquet(args.input)

    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    transcripts = transcripts.repartition(n_part, F.hash("conv_id"))

    conv_docs = runner.run(
        "conv_docs", lambda: assemble_conversations(transcripts), inputs=[]
    )
    text_units = runner.run(
        "text_units",
        lambda: split_text_units(
            conv_docs, size=args.chunk_size, overlap=args.chunk_overlap, tokenizer=args.tokenizer
        ),
        inputs=["conv_docs"],
        partition_by=None,
    )
    raw_records = runner.run(
        "raw_records", lambda: emit_records(text_units), inputs=["text_units"]
    )

    # parse once: both outputs branch from one persisted record explode
    # (persist_intermediate), so the nodes and edges stage actions share
    # the parse work instead of re-running it
    _parsed: dict = {}

    def _graph(which: str):
        if not _parsed:
            _parsed["nodes"], _parsed["edges"] = parse_and_merge(
                raw_records, persist_intermediate=True
            )
        return _parsed[which]

    # nodes/edges are bucketed on their join keys: every later title-keyed
    # equi-join (degrees, communities, canonicalization) against another
    # bucketed table — including after a fresh-session resume — skips its
    # Exchange (asserted in tests/test_physical_plans.py)
    nodes = runner.run(
        "nodes", lambda: _graph("nodes"), inputs=["raw_records"], bucket_by=["title"]
    )
    edges = runner.run(
        "edges", lambda: _graph("edges"), inputs=["raw_records"], bucket_by=["source"]
    )
    degrees = runner.run("degrees", lambda: node_degrees(edges), inputs=["edges"])
    nodes_final = runner.run(
        "nodes_final",
        lambda: with_node_ids(
            summarize_descriptions(nodes.join(degrees, "title", "left"))
        ),
        inputs=["nodes", "degrees"],
    )
    edges_final = runner.run(
        "edges_final",
        lambda: with_edge_ids(
            summarize_descriptions(
                with_edge_rank(edges, degrees).withColumn(
                    "pair", F.concat_ws("->", "source", "target")
                ),
                title_col="pair",
            ).drop("pair")
        ),
        inputs=["edges", "degrees"],
    )
    communities = runner.run(
        "communities",
        lambda: label_propagation(nodes, edges),
        inputs=["nodes", "edges"],
    )
    communities_leveled = runner.run(
        "communities_leveled",
        lambda: hierarchical_lpa(nodes, edges, max_cluster_size=args.max_cluster_size),
        inputs=["nodes", "edges"],
    )
    hierarchy = runner.run(
        "community_hierarchy",
        lambda: community_hierarchy(communities_leveled),
        inputs=["communities_leveled"],
    )
    claims = runner.run(
        "claims", lambda: extract_claims(transcripts), inputs=[]
    )
    # agent-trace views: tool-call Markov transitions + per-conversation
    # response-latency profile (exact int64 micros).  Both reuse the
    # conv_id-hash partitioning the transcripts scan already has.
    runner.run(
        "tool_transitions", lambda: tool_transitions(transcripts), inputs=[]
    )
    runner.run("turn_latency", lambda: turn_latency(transcripts), inputs=[])
    # hierarchical reports: level-ordered, deepest first, oversized
    # parents substituting sub-community report summaries (R11/R12) —
    # the reference's headline flow (pre_community_report_context.py)
    reports = runner.run(
        "community_reports",
        lambda: leveled_reports(
            nodes,
            degrees,
            with_edge_rank(edges, degrees),
            communities_leveled,
            claims=claims,
        ),
        inputs=["nodes", "edges", "degrees", "communities_leveled", "claims"],
    )

    summary = {
        "computed": runner.computed,
        "skipped": runner.skipped,
        "rows": {
            "nodes": nodes_final.count(),
            "edges": edges_final.count(),
            "communities": communities.count(),
            "claims": claims.count(),
            "community_reports": reports.count(),
        },
    }
    print(summary)
    return summary


if __name__ == "__main__":
    main()
