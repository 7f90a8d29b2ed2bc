"""End-to-end pipeline composition: transcripts → knowledge graph tables.

Mirrors the reference's 8-stage indexing workflow
(reference workflow/build_workflow.py:20-83, SURVEY.md §3.1) as one
declarative DataFrame dataflow:

    transcripts
      →(Window/groupBy over conv_id, turn_idx)→ conv_docs        (assemble)
      →(chunk UDF + explode)→                    text_units       (chunk)
      →(vectorized backend)→                     raw_records      (extract)
      →(parse + salted merge)→                   nodes, edges     (parse)
      →(broadcast alias join + MinHash-LSH + CC)→ canonical graph (linking)
      →(explode + count, broadcast joins)→       degrees, ranks   (graphops)
      →(iterative LPA)→                          communities      (community)

Every stage is a pure DataFrame→DataFrame function; `build_graph` wires
them and returns the named intermediate tables so callers (entry point,
bench, tests, checkpointed jobs) can materialize any prefix.

Scale: the only wide operations are the conv_id groupBy (assembly), the
salted name groupBy (merge), the LSH band join, and the iterative CC/LPA
joins — each keyed and documented in its operator module.  `repartition`
by hash(conv_id) happens once, before extraction (north rule), sized by
``spark.sql.shuffle.partitions``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.assemble import assemble_conversations
from .operators.chunk import split_text_units
from .operators.community import label_propagation
from .operators.extract import ExtractionBackend, emit_records
from .operators.graphops import node_degrees, with_edge_rank
from .operators.linking import (
    apply_canonicalization,
    canonical_map,
    jaccard_verify,
    minhash_candidate_pairs,
)
from .operators.parse import parse_and_merge


@dataclass
class PipelineConfig:
    chunk_size: int = 1200  # reference config.py:17
    chunk_overlap: int = 100  # reference config.py:18
    tokenizer: str = "auto"
    canonicalize: bool = False
    jaccard_threshold: float = 0.5
    run_communities: bool = False
    lpa_max_iter: int = 10
    # explicit repartition width before the Python-UDF stages; None →
    # spark.sql.shuffle.partitions.  MEASURED NECESSITY, not ritual: AQE
    # coalesces the post-assembly shuffle by BYTE size, and conversation
    # text is small in bytes but expensive per row in the chunk/extract
    # UDFs — without this the 4M-turn scaling run collapsed to ~3 tasks
    # and showed ZERO speedup from 8→32 cores.  An explicit repartition
    # is exempt from AQE coalescing, so UDF parallelism tracks cores.
    extract_partitions: int | None = None


def build_graph(
    transcripts: DataFrame,
    config: PipelineConfig | None = None,
    alias_dict: DataFrame | None = None,
    backend: ExtractionBackend | None = None,
    persist_intermediate: bool = False,
) -> dict[str, DataFrame]:
    """Run the construction pipeline; returns every named stage output.

    ``persist_intermediate`` caches the exploded record table inside
    parse_and_merge: the node/edge merge branches scan it ~19 times
    (entity parse, relationship parse, endpoint auto-create, ordinal
    joins), so long-lived callers that materialize several stages (the
    gate stage hub, bench) should pass True — measured ~4.5s → ~1s for
    the nodes materialization at sf0.1.  Default False: per-micro-batch
    callers (the CDC folds) must not accumulate cache entries they
    cannot unpersist."""
    cfg = config or PipelineConfig()
    out: dict[str, DataFrame] = {}

    n_part = cfg.extract_partitions or int(
        transcripts.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    out["conv_docs"] = assemble_conversations(transcripts).repartition(
        n_part, F.hash("conv_id")
    )
    out["text_units"] = split_text_units(
        out["conv_docs"], size=cfg.chunk_size, overlap=cfg.chunk_overlap, tokenizer=cfg.tokenizer
    )
    out["raw_records"] = emit_records(out["text_units"], backend=backend)
    nodes, edges = parse_and_merge(
        out["raw_records"],
        persist_intermediate=persist_intermediate,
        records_out=out if persist_intermediate else None,
    )

    if cfg.canonicalize:
        pairs = minhash_candidate_pairs(nodes, name_col="title")
        verified = jaccard_verify(pairs, threshold=cfg.jaccard_threshold)
        mapping = canonical_map(nodes, verified, alias_dict=alias_dict)
        out["canonical_map"] = mapping
        nodes, edges = apply_canonicalization(nodes, edges, mapping)

    out["nodes"] = nodes
    out["edges"] = edges
    out["degrees"] = node_degrees(edges)
    out["edges_ranked"] = with_edge_rank(edges, out["degrees"])

    if cfg.run_communities:
        out["communities"] = label_propagation(
            nodes, edges, node_col="title", max_iter=cfg.lpa_max_iter
        )

    return out


def graph_summary(stages: dict[str, DataFrame]) -> DataFrame:
    """Flagship result: ranked edge list joined with node degrees — the
    'top related entity pairs' view a reference user gets from
    relationship.csv (rank = source_degree + target_degree,
    reference compute_edge_degree.py:47-52)."""
    return stages["edges_ranked"].select(
        "source",
        "target",
        F.col("weight").cast("double").alias("weight"),
        "source_degree",
        "target_degree",
        "rank",
    )
