"""Corpus-level triple P/R evidence for the north rule (BASELINE.json:
"matching the reference's emitted (subj, pred, obj) triples, P/R >= 0.95").

The distributed pipeline (assemble → chunk → extract → parse_and_merge)
runs over the real testdata; the vendored sequential oracle
(knowledge_graph_spark/oracle.py — a clean-room re-implementation of the
reference parser/merger, reference graph/extractors/
graph_extractor.py:180-292) replays the SAME extracted records
single-process.  Precision/recall of the (subj, pred, obj) sets is
reported per scale factor and written to PARITY.md.

This is the scaled-up version of tests/test_parse_parity.py: the pytest
proves exact parity on the adversarial micro-fixture; this tool proves it
holds corpus-wide, where merge collisions, weight sums, and provenance
unions actually stack up.

Run: ``python tools/triple_pr.py [sf_dir ...]``
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from knowledge_graph_spark import oracle as orc
from knowledge_graph_spark.operators.assemble import assemble_conversations
from knowledge_graph_spark.operators.chunk import split_text_units
from knowledge_graph_spark.operators.extract import emit_records
from knowledge_graph_spark.operators.parse import parse_and_merge
from knowledge_graph_spark.session import get_spark
from knowledge_graph_spark.synth import transcripts_from_events

DEFAULT_SFS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def run_one(spark, sf_dir: str) -> dict:
    t = transcripts_from_events(spark, sf_dir)
    units = split_text_units(assemble_conversations(t))
    recs = emit_records(units).persist()

    t0 = time.time()
    nodes, edges = parse_and_merge(recs)
    spark_triples = {
        (r["source"], pred, r["target"])
        for r in edges.collect()
        for pred in r["description"].split("\n")
    }
    spark_nodes = {
        r["title"]: (r["type"], r["description"], tuple(r["source_id"]))
        for r in nodes.collect()
    }
    spark_s = time.time() - t0

    t0 = time.time()
    by_unit = sorted(
        (r["text_unit_id"], r["records"]) for r in recs.select("text_unit_id", "records").collect()
    )
    o_nodes, o_edges = orc.parse_records_oracle(by_unit)
    ref_triples = orc.triples(o_edges)
    ref_nodes = {
        row["title"]: (row["type"], row["description"], tuple(row["source_id"]))
        for row in orc.oracle_node_rows(o_nodes)
    }
    oracle_s = time.time() - t0
    recs.unpersist()

    p, r = orc.precision_recall(spark_triples, ref_triples)
    return {
        "sf_dir": sf_dir,
        "n_units": len(by_unit),
        "n_triples": len(spark_triples),
        "n_ref_triples": len(ref_triples),
        "precision": p,
        "recall": r,
        "nodes_equal": spark_nodes == ref_nodes,
        "n_nodes": len(spark_nodes),
        "spark_s": round(spark_s, 2),
        "oracle_s": round(oracle_s, 2),
    }


def main() -> None:
    sf_dirs = sys.argv[1:] or DEFAULT_SFS
    spark = get_spark(app_name="triple-pr", master="local[32]")
    rows = [run_one(spark, sf) for sf in sf_dirs]

    lines = [
        "# Triple-extraction parity vs reference semantics (north rule: P/R >= 0.95)",
        "",
        "Protocol: the distributed pipeline and the vendored sequential oracle",
        "(`knowledge_graph_spark/oracle.py`, clean-room mirror of the reference",
        "parser/merger — reference `graph/extractors/graph_extractor.py:180-292`)",
        "consume the SAME extracted records; (subj, pred, obj) sets are compared",
        "exactly.  Node merge parity (title → type/description/provenance) is",
        "checked as full-dict equality.  Reproduce: `python tools/triple_pr.py`.",
        "",
        "| corpus | text units | triples (ours) | triples (ref) | precision | recall | node merge |",
        "|---|---|---|---|---|---|---|",
    ]
    for w in rows:
        lines.append(
            f"| {w['sf_dir']} | {w['n_units']} | {w['n_triples']} | {w['n_ref_triples']} "
            f"| {w['precision']:.4f} | {w['recall']:.4f} "
            f"| {'EQUAL (' + str(w['n_nodes']) + ' nodes)' if w['nodes_equal'] else 'MISMATCH'} |"
        )
    lines += [
        "",
        "The adversarial micro-fixture parity (HTML escapes, control chars,",
        "reversed duplicate edges, non-numeric weights, too-few-field records,",
        "gleaning rounds) lives in `tests/test_parse_parity.py`.",
        "",
    ]
    with open("PARITY.md", "w") as f:
        f.write("\n".join(lines))
    for w in rows:
        print(w)
    print("wrote PARITY.md")


if __name__ == "__main__":
    main()
