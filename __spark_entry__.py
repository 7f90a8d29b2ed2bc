"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 as a
(spark, sf_dir) → DataFrame callable; ``oracle_sql()`` gives the ANSI-SQL
equivalent DuckDB runs on the same parquet views.  The KG-construction
queries derive a transcripts table of the BASELINE.json input_hint shape
from the driver's ``events`` table via one shared SQL statement
(knowledge_graph_spark.synth.TRANSCRIPTS_SQL) executed verbatim by BOTH
engines, so every pipeline stage is value-hash comparable end-to-end.

Non-SQL-expressible ops (iterative LPA, MinHash-LSH canonicalization,
SimHash/MinHash dedup) have queries() entries only — the driver records
the weaker rows-only check; their semantics are pytest-verified against
vendored sequential oracles instead (tests/).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knowledge_graph_spark.operators.community import (
    connected_components,
    label_propagation,
)
from knowledge_graph_spark.operators.extract import MENTION_PATTERN, extract_mentions
from knowledge_graph_spark.operators.graphops import node_degrees, with_edge_rank
from knowledge_graph_spark.operators.linking import (
    canonical_map,
    jaccard_verify,
    link_aliases,
    minhash_candidate_pairs,
)
from knowledge_graph_spark.pipeline import PipelineConfig, build_graph
from knowledge_graph_spark.synth import TRANSCRIPTS_SQL, transcripts_from_events

# ---------------------------------------------------------------------------
# Shared configuration — identical constants on the Spark and DuckDB sides.
# ---------------------------------------------------------------------------

CHUNK_SIZE = 128
CHUNK_OVERLAP = 16
_STEP = CHUNK_SIZE - CHUNK_OVERLAP

ENTRY_CFG = PipelineConfig(chunk_size=CHUNK_SIZE, chunk_overlap=CHUNK_OVERLAP, tokenizer="ws")

# Alias dictionary for entity-link scoring (broadcast side of V3); embedded
# as VALUES in the oracle so both engines see the identical dictionary.
ALIAS_ROWS = [
    ("EVT_CLICK", "INTERACTION", 0.9),
    ("EVT_VIEW", "INTERACTION", 0.85),
    ("AGENT_0", "ASSISTANT_BOT", 0.95),
    ("AGENT_1", "ASSISTANT_BOT", 0.95),
]


def _alias_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        ALIAS_ROWS, schema="alias string, canonical_name string, score double"
    )


_STAGE_CACHE: dict[str, dict[str, DataFrame]] = {}


def _stages(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Pipeline stages for sf_dir, memoized per process with the hub tables
    persisted — the driver runs many queries() over the same stages, and
    recomputing extraction per query would dominate the gate's wall clock."""
    if sf_dir not in _STAGE_CACHE:
        t = transcripts_from_events(spark, sf_dir)
        stages = build_graph(t, ENTRY_CFG)
        for key in ("text_units", "nodes", "edges"):
            stages[key] = stages[key].persist()
        _STAGE_CACHE[sf_dir] = stages
    return _STAGE_CACHE[sf_dir]


# ---------------------------------------------------------------------------
# DuckDB oracle prelude: the full KG pipeline as chained CTEs.  Stage
# semantics are documented in the matching operator modules; the SQL is an
# independent sequential re-derivation, not a translation of the Spark plan.
# ---------------------------------------------------------------------------

_ALIAS_VALUES = ", ".join(f"('{a}', '{c}', {s})" for a, c, s in ALIAS_ROWS)

ORACLE_PRELUDE = f"""
transcripts AS ({TRANSCRIPTS_SQL}),
conv_docs AS (
  SELECT sha256(conv_id) AS doc_id, conv_id,
         string_agg(role || ': ' || text, chr(10) ORDER BY turn_idx) AS text,
         CAST(count(*) AS INT) AS n_turns
  FROM transcripts GROUP BY conv_id
),
toks AS (
  SELECT doc_id, conv_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
  FROM conv_docs
),
text_units AS (
  SELECT sha256(doc_id || ':' || CAST(ci AS VARCHAR)) AS id,
         doc_id, conv_id, CAST(ci AS INT) AS chunk_idx,
         array_to_string(t[ci*{_STEP}+1 : ci*{_STEP}+{CHUNK_SIZE}], ' ') AS chunk,
         CAST(len(t[ci*{_STEP}+1 : ci*{_STEP}+{CHUNK_SIZE}]) AS INT) AS n_tokens
  FROM toks,
       LATERAL unnest(range(0, CASE WHEN len(t) = 0 THEN 0
                                    ELSE (len(t)-1)//{_STEP} + 1 END)) AS u(ci)
),
ment_occ AS (
  SELECT id AS text_unit_id, conv_id,
         unnest(regexp_extract_all(chunk, '{MENTION_PATTERN}')) AS mention,
         generate_subscripts(regexp_extract_all(chunk, '{MENTION_PATTERN}'), 1) AS occ
  FROM text_units
),
first_ment AS (
  SELECT text_unit_id, conv_id, mention, min(occ) AS ord
  FROM ment_occ GROUP BY text_unit_id, conv_id, mention
),
ent_records AS (
  SELECT text_unit_id, conv_id, mention AS name,
         CASE WHEN starts_with(mention, 'USER_')   THEN 'PERSON'
              WHEN starts_with(mention, 'PERSON_') THEN 'PERSON'
              WHEN starts_with(mention, 'AGENT_')  THEN 'PERSON'
              WHEN starts_with(mention, 'CITY_')   THEN 'GEO'
              WHEN starts_with(mention, 'EVT_')    THEN 'EVENT'
              ELSE 'ORGANIZATION' END AS type,
         'MENTION OF ' || mention AS description
  FROM first_ment
),
rel_records AS (
  SELECT a.text_unit_id, a.conv_id,
         a.mention AS source, b.mention AS target,
         a.mention || ' -> ' || b.mention AS description,
         1.0 AS weight
  FROM first_ment a JOIN first_ment b
    ON a.text_unit_id = b.text_unit_id AND a.ord < b.ord
),
kg_nodes AS (
  SELECT name AS title,
         min(type) AS type,
         string_agg(DISTINCT description, chr(10) ORDER BY description) AS description,
         string_agg(DISTINCT text_unit_id, ',' ORDER BY text_unit_id) AS source_ids
  FROM ent_records GROUP BY name
),
kg_edges AS (
  SELECT least(source, target) AS source, greatest(source, target) AS target,
         CAST(sum(weight) AS DOUBLE) AS weight,
         string_agg(DISTINCT description, chr(10) ORDER BY description) AS description,
         string_agg(DISTINCT text_unit_id, ',' ORDER BY text_unit_id) AS text_unit_ids
  FROM rel_records GROUP BY least(source, target), greatest(source, target)
),
degrees AS (
  SELECT title, CAST(count(*) AS INT) AS degree FROM (
    SELECT source AS title FROM kg_edges
    UNION ALL SELECT target AS title FROM kg_edges
  ) GROUP BY title
),
alias_dict(alias, canonical_name, score) AS (VALUES {_ALIAS_VALUES})
"""


def _oracle(body: str) -> str:
    return f"WITH RECURSIVE {ORACLE_PRELUDE} {body}"


# ---------------------------------------------------------------------------
# Spark-side query callables.
# ---------------------------------------------------------------------------


def q_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transcripts_from_events(spark, sf_dir)
    return t.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        F.unix_timestamp("ts").cast("bigint").alias("ts_epoch"),
    )


def q_conv_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _stages(spark, sf_dir)["conv_docs"].select("doc_id", "conv_id", "text", "n_turns")


def q_text_units(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _stages(spark, sf_dir)["text_units"].select(
        "id", "doc_id", "conv_id", "chunk_idx", "chunk", "n_tokens"
    )


def q_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    units = _stages(spark, sf_dir)["text_units"]
    return extract_mentions(units).select("text_unit_id", "conv_id", "mention")


def q_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes = _stages(spark, sf_dir)["nodes"]
    return nodes.select(
        "title",
        "type",
        "description",
        F.concat_ws(",", "source_id").alias("source_ids"),
    )


def q_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _stages(spark, sf_dir)["edges"]
    return edges.select(
        "source",
        "target",
        F.col("weight").cast("double").alias("weight"),
        "description",
        F.concat_ws(",", "text_unit_ids").alias("text_unit_ids"),
    )


def q_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _stages(spark, sf_dir)["degrees"].select("title", "degree")


def q_edge_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _stages(spark, sf_dir)
    ranked = with_edge_rank(s["edges"], s["degrees"])
    return ranked.select(
        "source",
        "target",
        F.col("weight").cast("double").alias("weight"),
        "source_degree",
        "target_degree",
        "rank",
    )


def q_linked_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes = _stages(spark, sf_dir)["nodes"]
    linked = link_aliases(nodes, _alias_df(spark))
    return linked.select("title", "canonical_name", "link_score")


def q_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _stages(spark, sf_dir)
    return connected_components(s["nodes"], s["edges"]).select("title", "component")


def q_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _stages(spark, sf_dir)
    return label_propagation(s["nodes"], s["edges"]).select("title", "community")


def q_canonicalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _stages(spark, sf_dir)
    pairs = minhash_candidate_pairs(s["nodes"], name_col="title")
    verified = jaccard_verify(pairs, threshold=0.5)
    return canonical_map(s["nodes"], verified, alias_dict=_alias_df(spark)).select(
        "title", "canonical"
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full construction pipeline,
    returning the ranked canonical edge list (relationship.csv analogue)."""
    s = _stages(spark, "/root/testdata/sf0.001")
    ranked = with_edge_rank(s["edges"], s["degrees"])
    return ranked.select(
        "source",
        "target",
        F.col("weight").cast("double").alias("weight"),
        "source_degree",
        "target_degree",
        "rank",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "transcripts": q_transcripts,
        "conv_docs": q_conv_docs,
        "text_units": q_text_units,
        "mentions": q_mentions,
        "kg_nodes": q_nodes,
        "kg_edges": q_edges,
        "node_degrees": q_degrees,
        "edge_rank": q_edge_rank,
        "linked_nodes": q_linked_nodes,
        "connected_components": q_components,
        "communities_lpa": q_communities,  # rows-only: iterative LPA
        "canonicalization": q_canonicalization,  # rows-only: MinHash-LSH + CC
    }


def oracle_sql() -> dict[str, str]:
    return {
        "transcripts": _oracle(
            """
            SELECT conv_id, turn_idx, role, text, tool,
                   CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
            FROM transcripts
            """
        ),
        "conv_docs": _oracle("SELECT doc_id, conv_id, text, n_turns FROM conv_docs"),
        "text_units": _oracle(
            "SELECT id, doc_id, conv_id, chunk_idx, chunk, n_tokens FROM text_units"
        ),
        "mentions": _oracle("SELECT text_unit_id, conv_id, mention FROM ment_occ"),
        "kg_nodes": _oracle(
            "SELECT title, type, description, source_ids FROM kg_nodes"
        ),
        "kg_edges": _oracle(
            "SELECT source, target, weight, description, text_unit_ids FROM kg_edges"
        ),
        "node_degrees": _oracle("SELECT title, degree FROM degrees"),
        "edge_rank": _oracle(
            """
            SELECT e.source, e.target, e.weight,
                   CAST(coalesce(ds.degree, 0) AS INT) AS source_degree,
                   CAST(coalesce(dt.degree, 0) AS INT) AS target_degree,
                   CAST(coalesce(ds.degree, 0) + coalesce(dt.degree, 0) AS INT) AS rank
            FROM kg_edges e
            LEFT JOIN degrees ds ON e.source = ds.title
            LEFT JOIN degrees dt ON e.target = dt.title
            """
        ),
        "linked_nodes": _oracle(
            """
            SELECT n.title,
                   coalesce(a.canonical_name, n.title) AS canonical_name,
                   CAST(coalesce(a.score, 1.0) AS DOUBLE) AS link_score
            FROM kg_nodes n LEFT JOIN alias_dict a ON upper(n.title) = upper(a.alias)
            """
        ),
        "connected_components": _oracle(
            """
            , sym AS (
                SELECT source AS a, target AS b FROM kg_edges
                UNION SELECT target AS a, source AS b FROM kg_edges
            ),
            reach(node, r) AS (
                SELECT title, title FROM kg_nodes
                UNION
                SELECT s.a, reach.r FROM sym s JOIN reach ON s.b = reach.node
            )
            SELECT node AS title, min(r) AS component FROM reach GROUP BY node
            """
        ),
    }
