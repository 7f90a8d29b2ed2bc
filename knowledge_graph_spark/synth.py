"""Deterministic transcript synthesis and the events→transcripts derivation.

Two sources of transcript data, both fully deterministic:

1. ``transcripts_from_events`` — derives a transcripts table of the exact
   input_hint shape ``(conv_id, turn_idx, role, text, tool, ts)`` from the
   driver-provided ``events`` parquet.  The derivation is a single ANSI-SQL
   statement (``TRANSCRIPTS_SQL``) run verbatim by BOTH Spark and the DuckDB
   oracle, so every downstream pipeline stage can be value-hash-checked.
   Planted entity mentions (USER_k / ITEM_k / AGENT_k / upper(event_type))
   make expected triples computable in closed form.

2. ``synth_transcripts`` — a seeded, executor-side generator (spark.range +
   deterministic column arithmetic, no Python row loop) used by unit tests
   and the bench harness; supports heavy-tailed turn counts, hot entities
   (skew tests) and alias groups (linking tests) per FIXTURES.md F1/F2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver parquet table as a temp view (idempotent)."""
    for name in TABLES:
        spark.read.parquet(f"{sf_dir}/{name}.parquet").createOrReplaceTempView(name)


# Single source of truth for the events→transcripts derivation.  Runs
# unchanged under Spark SQL and DuckDB (ANSI subset: ||, CASE, %, CAST,
# row_number).  Roles cycle deterministically on event_id; text plants
# single-token uppercase entity mentions so the extraction stage has a
# closed-form expected output.
TRANSCRIPTS_SQL = """
SELECT
  'conv_' || CAST(user_id AS STRING)                 AS conv_id,
  CAST(row_number() OVER (
         PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
  CASE CAST(event_id % 4 AS INT)
    WHEN 0 THEN 'system' WHEN 1 THEN 'user'
    WHEN 2 THEN 'assistant' ELSE 'tool' END          AS role,
  'USER_' || CAST(user_id % 5 AS STRING)
    || ' saw EVT_' || upper(event_type)
    || ' on ITEM_' || CAST(event_id % 7 AS STRING)
    || CASE WHEN event_id % 3 = 0
         THEN ' with AGENT_' || CAST(event_id % 2 AS STRING)
         ELSE '' END                                 AS text,
  CASE WHEN event_id % 4 = 3 THEN event_type ELSE '' END AS tool,
  ts
FROM events
"""


def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcripts table (input_hint shape) derived from the events table."""
    load_views(spark, sf_dir)
    return spark.sql(TRANSCRIPTS_SQL)


# ---------------------------------------------------------------------------
# Seeded synthetic generator (tests + bench).  Entirely executor-side: the
# only driver-side value is the range bound, so 100k+ conversations
# materialize in parallel with no Python row loop.
# ---------------------------------------------------------------------------

# Alias groups for linking/canonicalization tests (FIXTURES.md F2); ACME is
# the deliberately hot entity (appears in >30% of turns — skew handling).
ALIAS_GROUPS = {
    "ACME": ["ACME", "ACME_CORP", "ACME_CORPORATION"],
    "GLOBEX": ["GLOBEX", "GLOBEX_INC"],
    "NORTHWIND": ["NORTHWIND", "NORTHWIND_TRADERS"],
}
ROLES = ["system", "user", "assistant", "tool"]


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 8,
    base_turns: int = 8,
    seed: int = 42,
    n_person: int = 20,
    n_city: int = 6,
) -> DataFrame:
    """Deterministic transcripts: heavy-tailed turn counts, hot entities,
    alias-group mentions, and a few conversations with no extractable
    mentions (empty-result path).  ts order == turn_idx order except every
    5th turn shares the previous ts (proves ordering uses turn_idx).

    ``n_person`` / ``n_city`` size the planted entity vocabulary.  The
    defaults reproduce the original fixed ~30-name pool bit-for-bit; the
    graph-scale bench passes sf-proportional values (e.g.
    ``n_person = n_convs // 10``) so the extracted KG grows with the
    input instead of saturating at a toy graph — the round-2 verdict's
    headline gap (every iterative graph operator had only ever been
    measured below the driver-local cutover)."""
    convs = spark.range(n_convs).select(
        F.concat(F.lit("c"), F.format_string("%06d", F.col("id"))).alias("conv_id"),
        F.col("id").alias("conv_no"),
        # heavy tail: every 8th conversation gets 4x the turns
        F.when(F.col("id") % 8 == 0, base_turns * 4)
        .otherwise(base_turns)
        .cast("int")
        .alias("n_turns"),
    )
    turns = convs.select(
        "conv_id",
        "conv_no",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )
    h = F.abs(F.xxhash64(F.lit(seed), F.col("conv_no"), F.col("turn_idx")))
    role = F.element_at(F.array(*[F.lit(r) for r in ROLES]), (F.col("turn_idx") % 4 + 1).cast("int"))

    # mention slots — slot1 is ACME-family 40% of the time (hot entity)
    alias_pool = [a for g in ALIAS_GROUPS.values() for a in g]
    acme = ALIAS_GROUPS["ACME"]
    slot1 = F.when(
        h % 10 < 4, F.element_at(F.array(*[F.lit(a) for a in acme]), (h % 3 + 1).cast("int"))
    ).otherwise(F.concat(F.lit("PERSON_"), (h % n_person).cast("string")))
    slot2 = F.element_at(
        F.array(*[F.lit(a) for a in alias_pool]), (h % len(alias_pool) + 1).cast("int")
    )
    slot3 = F.concat(F.lit("CITY_"), (F.floor(h / 7) % n_city).cast("string"))

    # every 11th conversation has zero extractable mentions
    text = F.when(
        F.col("conv_no") % 11 == 10,
        F.concat(F.lit("nothing to see in turn "), F.col("turn_idx").cast("string")),
    ).otherwise(
        F.concat(
            role,
            F.lit(" reports that "),
            slot1,
            F.lit(" met "),
            slot2,
            F.lit(" in "),
            slot3,
            F.lit(" at step "),
            F.col("turn_idx").cast("string"),
        )
    )
    # ts: monotone in turn_idx, but every 5th turn duplicates the previous
    # second so only turn_idx disambiguates (FIXTURES.md F1).
    ts_sec = F.col("conv_no") * 100000 + F.col("turn_idx") * 60 - F.when(
        F.col("turn_idx") % 5 == 4, 60
    ).otherwise(0)
    return turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        F.when(role == "tool", F.lit("search")).otherwise(F.lit("")).alias("tool"),
        F.timestamp_seconds(F.lit(1700000000) + ts_sec).alias("ts"),
    )


def synth_alias_dict(spark: SparkSession) -> DataFrame:
    """Broadcastable alias→canonical dictionary matching ALIAS_GROUPS."""
    rows = [
        (alias, canon, 1.0 if alias == canon else 0.9)
        for canon, aliases in ALIAS_GROUPS.items()
        for alias in aliases
    ]
    return spark.createDataFrame(rows, schema="alias string, canonical_name string, score double")


def synth_graph(
    spark: SparkSession,
    n_nodes: int,
    n_edges: int,
    seed: int = 7,
    hub_pct: int = 0,
) -> DataFrame:
    """Deterministic random graph in the KG edge schema
    (source, target, weight) — executor-side only (spark.range +
    xxhash64 endpoint draws, no Python row loop), so a 10M-edge graph
    materializes in parallel.

    Used by the graph-scale bench (tools/bench_graph.py) to measure the
    distributed iterative kernels (CC / LPA / PageRank / SCC / HyperBall)
    past the 200k-edge driver-local cutover — the round-2 verdict's
    headline evidence gap.  ``hub_pct`` re-points that percentage of all
    edge sources at node 0, planting a super-hub whose degree is
    ~hub_pct% of |E| (the verdict's graph-skew scenario).

    Self-loops are dropped and duplicate (source, target) draws collapse
    via distinct, so the realized edge count is slightly below
    ``n_edges`` when the pair space is tight; callers wanting an exact
    count should oversample.  Node ids are zero-padded strings (the
    node_col convention of the KG tables)."""
    e = spark.range(n_edges)
    h1 = F.abs(F.xxhash64(F.lit(seed), F.col("id")))
    h2 = F.abs(F.xxhash64(F.lit(seed + 1), F.col("id")))
    src_no = h1 % n_nodes
    if hub_pct:
        src_no = F.when(h1 % 100 < hub_pct, F.lit(0)).otherwise(src_no)
    dst_no = h2 % n_nodes
    # weight is a function of the ENDPOINT PAIR (not the draw id) so the
    # trailing distinct truly collapses duplicate (source, target) draws
    # — with a draw-keyed weight, parallel edges would survive distinct
    # and the hub runs would time a multigraph
    weight = F.abs(F.xxhash64(F.lit(seed + 2), src_no, dst_no)) % 5 + 1
    return (
        e.select(
            F.format_string("N%09d", src_no).alias("source"),
            F.format_string("N%09d", dst_no).alias("target"),
            weight.cast("double").alias("weight"),
        )
        .filter(F.col("source") != F.col("target"))
        .distinct()
    )
