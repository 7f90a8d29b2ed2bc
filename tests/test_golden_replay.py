"""Golden-artifact replay parity (VERDICT r3 next-round #1).

The reference ships a complete frozen run: ``graph_save/`` (the GraphML
working-graph checkpoints + claims.json) and ``outputs/*.csv`` (the
exported tables).  These tests parse the *reference's own published
artifacts* and assert that this pipeline's deterministic tail reproduces
the deterministic columns of node.csv / relationship.csv / entity.csv /
claims.csv row-for-row:

- degree (G7 node_degrees ← reference stores nx degree per node)
- source_degree / target_degree / rank
  (R3 with_edge_rank ← reference compute_edge_degree.py:47-52)
- community/level passthrough + defaults
  (← reference community_nodes.py entities_to_dataframe: cluster→None,
  level→0)
- entity.csv derivation (← reference community_entities.py:14-27)
- node_details / edge_details record contents
  (← reference community_nodes.py:29-36 / community_edges.py:36-44)
- community hierarchy subset-containment
  (R10 community_hierarchy ← reference community_hierachy.py:13-74)
- claims.json → claims.csv field mapping
  (← reference community_claims.py:17-42)

This upgrades parity evidence from "matches a vendored clean-room
oracle" to "matches the reference's own run".  Documented exclusions —
columns that are NOT deterministic given only the checkpoint, and are
therefore not asserted value-wise:
- node/edge/claim UUIDs and human_readable_ids are *carried* from the
  checkpoint (insertion-order artifacts of the reference's LLM run; we
  assert they are dense 0-based permutations and internally consistent,
  not that we re-derive them)
- community *ids* come from the reference's Leiden run (we use LPA);
  membership-derived structure (hierarchy containment) is asserted
  instead
- community_report.csv rank/summary/findings are LLM-generated
"""

from __future__ import annotations

import ast
import json
import os

import pandas as pd
import pytest

from pyspark.sql import functions as F

GOLD = "/root/reference"
GRAPH_SAVE = f"{GOLD}/graph_save"
OUTPUTS = f"{GOLD}/outputs"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GRAPH_SAVE), reason="reference golden artifacts not present"
)


@pytest.fixture(scope="module")
def gold_graph(spark):
    from knowledge_graph_spark.graphml import read_graphml

    nodes, edges = read_graphml(spark, f"{GRAPH_SAVE}/cluster_graph.graphml")
    return nodes.localCheckpoint(eager=True), edges.localCheckpoint(eager=True)


@pytest.fixture(scope="module")
def node_csv():
    return pd.read_csv(f"{OUTPUTS}/node.csv")


@pytest.fixture(scope="module")
def rel_csv():
    return pd.read_csv(f"{OUTPUTS}/relationship.csv")


def test_graphml_reader_shapes_and_types(gold_graph):
    nodes, edges = gold_graph
    assert nodes.count() == 209
    assert edges.count() == 270
    ntypes = dict(nodes.dtypes)
    etypes = dict(edges.dtypes)
    # typed from the <key> declarations, not stringly
    assert ntypes["degree"] == "bigint"
    assert ntypes["level"] == "bigint"
    assert etypes["weight"] == "double"
    assert {"title", "type", "description", "source_id", "cluster", "id"} <= set(
        ntypes
    )
    assert {"source", "target", "id", "description", "source_id"} <= set(etypes)


def test_degree_replay_exact(gold_graph, node_csv):
    """G7: recomputed degree == the degree the reference stored in its
    checkpoint == the degree column it exported, for every node
    (isolated nodes → 0)."""
    from knowledge_graph_spark.operators.graphops import node_degrees

    nodes, edges = gold_graph
    ours = (
        nodes.select("title", F.col("degree").alias("gold_degree"))
        .join(node_degrees(edges), "title", "left")
        .withColumn("degree", F.coalesce("degree", F.lit(0)))
    )
    mism = ours.filter(F.col("degree") != F.col("gold_degree")).count()
    assert mism == 0

    got = {r["title"]: r["degree"] for r in ours.collect()}
    csv_deg = dict(zip(node_csv.title, node_csv.degree))
    assert got == csv_deg


def test_edge_rank_replay_exact(gold_graph, rel_csv):
    """R3: with_edge_rank over recomputed degrees reproduces
    relationship.csv's source_degree / target_degree / rank row-for-row
    (joined on the reference's own edge UUID)."""
    from knowledge_graph_spark.operators.graphops import node_degrees, with_edge_rank

    _nodes, edges = gold_graph
    ranked = with_edge_rank(edges, node_degrees(edges))
    ours = {
        r["id"]: (r["source_degree"], r["target_degree"], r["rank"])
        for r in ranked.select("id", "source_degree", "target_degree", "rank").collect()
    }
    assert len(ours) == len(rel_csv)
    for _, row in rel_csv.iterrows():
        assert ours[row["id"]] == (
            row["source_degree"],
            row["target_degree"],
            row["rank"],
        ), f"edge {row['source']}→{row['target']}"


def test_node_csv_passthrough_and_defaults(gold_graph, node_csv):
    """node.csv community/level mirror the checkpoint's cluster/level
    attrs with the reference's defaults (no cluster → NaN community,
    no level → 0; community_nodes.py:50-51), and title/type/description/
    source_id are carried unchanged (joined on node UUID)."""
    nodes, _edges = gold_graph
    gn = {r["id"]: r.asDict() for r in nodes.collect()}
    assert len(gn) == len(node_csv)
    def same(csv_v, g_v):
        return (pd.isna(csv_v) and g_v in (None, "")) or csv_v == g_v

    for _, row in node_csv.iterrows():
        g = gn[row["id"]]
        assert row["title"] == g["title"]
        assert same(row["type"], g["type"])
        assert same(row["description"], g["description"])
        assert same(row["source_id"], g["source_id"])
        if g["cluster"] is None:
            assert pd.isna(row["community"])
        else:
            assert str(int(row["community"])) == g["cluster"]
        assert row["level"] == (g["level"] if g["level"] is not None else 0)
    # hrids: dense 0-based permutation, consistent between checkpoint+CSV
    assert sorted(node_csv.human_readable_id) == list(range(len(node_csv)))
    for _, row in node_csv.iterrows():
        assert row["human_readable_id"] == gn[row["id"]]["human_readable_id"]


def test_entity_csv_derivation(node_csv):
    """entity.csv is a projection of the node table
    (community_entities.py:14-27): name←title, text_unit_ids←source_id,
    graph_embedding left null; row-for-row on id."""
    ent = pd.read_csv(f"{OUTPUTS}/entity.csv")
    assert list(ent.columns) == [
        "id",
        "name",
        "type",
        "description",
        "human_readable_id",
        "graph_embedding",
        "text_unit_ids",
    ]
    m = ent.merge(node_csv, on="id", suffixes=("_e", "_n"))
    assert len(m) == len(node_csv) == len(ent)

    def eq(a, b):  # NaN-tolerant column equality
        return ((a == b) | (a.isna() & b.isna())).all()

    assert (m.name == m.title).all()
    assert eq(m.type_e, m.type_n)
    assert eq(m.description_e, m.description_n)
    assert (m.human_readable_id_e == m.human_readable_id_n).all()
    assert eq(m.text_unit_ids, m.source_id)
    assert m.graph_embedding.isna().all()


def test_details_records_match_recomputed(gold_graph, node_csv, rel_csv):
    """node_details / edge_details (the per-row context records the
    report builder consumes) contain exactly the recomputed degree /
    rank plus the carried identity fields (community_nodes.py:29-36,
    community_edges.py:36-44)."""
    from knowledge_graph_spark.operators.graphops import node_degrees, with_edge_rank

    nodes, edges = gold_graph
    deg = {
        r["title"]: r["degree"]
        for r in node_degrees(edges).collect()
    }
    for _, row in node_csv.iterrows():
        d = ast.literal_eval(row["node_details"])
        assert set(d) == {"human_readable_id", "title", "description", "degree"}
        assert d["degree"] == deg.get(row["title"], 0)
        assert d["title"] == row["title"]
        assert d["human_readable_id"] == row["human_readable_id"]
    ranked = {
        r["id"]: r["rank"]
        for r in with_edge_rank(edges, node_degrees(edges)).collect()
    }
    for _, row in rel_csv.iterrows():
        d = ast.literal_eval(row["edge_details"])
        assert set(d) == {
            "human_readable_id",
            "source",
            "target",
            "description",
            "rank",
        }
        assert d["rank"] == ranked[row["id"]]
        assert (d["source"], d["target"]) == (row["source"], row["target"])


def _reference_hierarchy(members: pd.DataFrame) -> list[dict]:
    """The reference's restore_community_hierarchy loop
    (community_hierachy.py:21-74), run in-test as the oracle over a
    (title, community, level) membership table: a next-level community
    is a sub-community iff its member set is a subset of the parent's."""
    levels = sorted(members.level.unique())
    by_level = {
        lv: {
            c: set(g.title)
            for c, g in members[members.level == lv].groupby("community")
        }
        for lv in levels
    }
    out = []
    for i in range(len(levels) - 1):
        cur, nxt = by_level[levels[i]], by_level[levels[i + 1]]
        for parent, pmem in cur.items():
            found = 0
            for sub, smem in nxt.items():
                if smem <= pmem:
                    out.append(
                        {
                            "community": parent,
                            "level": levels[i],
                            "sub_community": sub,
                            "sub_community_size": len(smem),
                        }
                    )
                    found += len(smem)
                    if found == len(pmem):
                        break
    return out


def test_hierarchy_replay_single_level_empty(spark, gold_graph):
    """The frozen run clustered at ONE level, so the reference hierarchy
    is empty — and so is ours on the same membership table."""
    from knowledge_graph_spark.operators.reports import community_hierarchy

    nodes, _ = gold_graph
    members = nodes.filter(F.col("cluster").isNotNull()).select(
        "title",
        F.col("cluster").alias("community"),
        F.coalesce(F.col("level"), F.lit(0)).cast("int").alias("level"),
    )
    assert community_hierarchy(members).count() == 0
    pdf = members.toPandas()
    assert _reference_hierarchy(pdf) == []


def test_hierarchy_replay_synthetic_refinement(spark, gold_graph):
    """Non-trivial hierarchy check on golden memberships: refine each
    golden level-0 community into two level-1 halves (by name hash
    parity) and assert our distributed community_hierarchy returns
    exactly what the reference's subset-containment loop returns."""
    from knowledge_graph_spark.operators.reports import community_hierarchy

    nodes, _ = gold_graph
    l0 = nodes.filter(F.col("cluster").isNotNull()).select(
        "title",
        F.col("cluster").alias("community"),
        F.lit(0).alias("level"),
    )
    l1 = l0.select(
        "title",
        F.concat(
            F.col("community"), F.lit("_"), (F.crc32("title") % 2).cast("string")
        ).alias("community"),
        F.lit(1).alias("level"),
    )
    members = l0.unionByName(l1)
    ours = sorted(
        (r["community"], r["level"], r["sub_community"], r["sub_community_size"])
        for r in community_hierarchy(members).collect()
    )
    ref = sorted(
        (d["community"], d["level"], d["sub_community"], d["sub_community_size"])
        for d in _reference_hierarchy(members.toPandas())
    )
    assert ours == ref and len(ours) > 0


def test_stage_order_invariance(spark):
    """cluster_graph is summarize_graph + clustering attrs: identical
    node/edge sets and identical summarized descriptions — i.e. the
    clustering stage mutates no graph content, only annotates.  (Our
    pipeline relies on the same staging: communities are computed FROM
    the merged graph, never mutate it.)"""
    from knowledge_graph_spark.graphml import read_graphml

    n1, e1 = read_graphml(spark, f"{GRAPH_SAVE}/summarize_graph.graphml")
    n2, e2 = read_graphml(spark, f"{GRAPH_SAVE}/cluster_graph.graphml")
    assert (
        n1.select("title", "description").exceptAll(
            n2.select("title", "description")
        ).count()
        == 0
    )
    assert (
        e1.select("source", "target", "weight")
        .exceptAll(e2.select("source", "target", "weight"))
        .count()
        == 0
    )
    assert n1.count() == n2.count() and e1.count() == e2.count()


def test_claims_csv_replay():
    """claims.csv rows are claims.json records in order, with the
    deterministic added columns (hrid = row index; claim_details =
    the id/subject/type/status/description record —
    community_claims.py:33-41); source_text renders as str(list)."""
    cl = pd.read_csv(f"{OUTPUTS}/claims.csv")
    js = json.load(open(f"{GRAPH_SAVE}/claims.json"))
    assert len(cl) == len(js)
    assert list(cl.human_readable_id) == list(range(len(cl)))
    for i, rec in enumerate(js):
        row = cl.iloc[i]
        for col in ("type", "status", "object_id"):
            assert (pd.isna(row[col]) and rec[col] is None) or row[col] == rec[col]
        # export fillna: a null description becomes "No Description"
        # (community_claims.py:15,31)
        assert row["description"] == (
            rec["description"] if rec["description"] is not None else "No Description"
        )
        # empty-string subjects round-trip to NaN through csv
        assert (
            pd.isna(row["subject_id"]) and rec["subject_id"] in (None, "")
        ) or row["subject_id"] == rec["subject_id"]
        if rec["source_text"] is None:
            assert pd.isna(row["source_text"])
        else:
            assert ast.literal_eval(row["source_text"]) == rec["source_text"]
        d = ast.literal_eval(row["claim_details"])
        assert set(d) == {
            "human_readable_id",
            "subject_id",
            "type",
            "status",
            "description",
        }
        assert d["human_readable_id"] == i


def test_export_headers_match_schema_contract():
    """S4: the CSV export headers this repo's schemas.py mirrors are
    exactly what the reference's frozen run wrote (export.py:38-60).
    details/record columns are render-time additions; node.csv adds the
    clustering columns to the NODES base."""
    import knowledge_graph_spark.schemas as S

    node_cols = list(pd.read_csv(f"{OUTPUTS}/node.csv", nrows=0).columns)
    rel_cols = list(pd.read_csv(f"{OUTPUTS}/relationship.csv", nrows=0).columns)
    claim_cols = list(pd.read_csv(f"{OUTPUTS}/claims.csv", nrows=0).columns)
    tu_cols = list(pd.read_csv(f"{OUTPUTS}/text_unit.csv", nrows=0).columns)

    assert set(node_cols) == set(S.NODES.fieldNames()) | {"node_details"}
    assert set(rel_cols) == set(S.EDGES.fieldNames()) | {"edge_details"}
    # CLAIMS drops the reference's always-null record_id; render adds details
    assert set(claim_cols) - {"record_id", "claim_details"} == set(
        S.CLAIMS.fieldNames()
    )
    assert {"id", "chunk", "n_tokens"} <= set(tu_cols)


def test_graphml_round_trip_lossless(spark, gold_graph, tmp_path):
    """write_graphml(read_graphml(x)) re-reads to identical frames —
    attribute typing, null attrs, and id escaping all survive the
    round trip on the reference's own checkpoint."""
    from knowledge_graph_spark.graphml import read_graphml, write_graphml

    nodes, edges = gold_graph
    out = str(tmp_path / "rt.graphml")
    write_graphml(nodes, edges, out)
    n2, e2 = read_graphml(spark, out)
    assert n2.schema == nodes.schema
    assert e2.schema == edges.schema
    assert nodes.exceptAll(n2).count() == 0 and n2.exceptAll(nodes).count() == 0
    assert edges.exceptAll(e2).count() == 0 and e2.exceptAll(edges).count() == 0


def test_graphml_round_trip_hostile_attribute_values(spark, tmp_path):
    """Writer escaping survives XML-hostile content: quotes, angle
    brackets, ampersands, unicode, whitespace-heavy ids, null attrs,
    and every declared attribute type round-trip exactly."""
    from pyspark.sql import types as T

    from knowledge_graph_spark.graphml import read_graphml, write_graphml

    nodes = spark.createDataFrame(
        [
            ('A "quoted" <name> & more', "d<&>c", 3, 1.5, True),
            ("ünïcode — em-dash", None, -7, 0.25, False),
            ("  spaced  id  ", "desc with\ttab", 0, 8.0, None),
        ],
        T.StructType(
            [
                T.StructField("title", T.StringType(), False),
                T.StructField("description", T.StringType(), True),
                T.StructField("level", T.LongType(), True),
                T.StructField("weight", T.DoubleType(), True),
                T.StructField("flag", T.BooleanType(), True),
            ]
        ),
    )
    edges = spark.createDataFrame(
        [
            ('A "quoted" <name> & more', "ünïcode — em-dash", 2.0, "s<id>&"),
            ("ünïcode — em-dash", "  spaced  id  ", 16.0, None),
        ],
        T.StructType(
            [
                T.StructField("source", T.StringType(), False),
                T.StructField("target", T.StringType(), False),
                T.StructField("weight", T.DoubleType(), False),
                T.StructField("source_id", T.StringType(), True),
            ]
        ),
    )
    out = str(tmp_path / "hostile.graphml")
    write_graphml(nodes, edges, out)
    n2, e2 = read_graphml(spark, out)
    # names + types must survive (the reader declares attrs nullable —
    # GraphML semantics: any <data> may be absent — so compare dtypes)
    assert n2.dtypes == nodes.dtypes and e2.dtypes == edges.dtypes
    assert sorted(map(tuple, nodes.collect())) == sorted(map(tuple, n2.collect()))
    assert sorted(map(tuple, edges.collect())) == sorted(map(tuple, e2.collect()))


def test_lpa_vs_leiden_agreement_on_frozen_run(spark, gold_graph):
    """Scores this engine's weighted LPA against the reference's OWN
    frozen Leiden partition (round-4 VERDICT #1) — converting the last
    excluded parity quantity (community ids) into a measured number.

    ``graph_save/cluster_graph.graphml`` carries the reference's Leiden
    ``cluster`` label on each level-0 LCC node (181 nodes, 12 clusters;
    reference verbs/community_detection/clustering/leiden.py:45-61 —
    this frozen run has a single hierarchy level, so "per level" is one
    row).  We run label_propagation on the SAME weighted edges and
    pair-count agreement with partition_agreement (Rand / P / R / F1,
    exact integer micros).  LPA is not Leiden, so exact id parity is
    out of scope by design; the asserted floors pin that the LPA
    partition (a) agrees far above the connectivity-only baseline
    (CC = one cluster: Rand 0.156, F1 0.269) and (b) recovers the bulk
    of Leiden's co-membership pairs.  Measured on this frozen run:
    24 LPA communities vs 12 Leiden clusters, Rand 0.828, precision
    0.460, recall 0.630, F1 0.532 (recorded in PARITY.md)."""
    from knowledge_graph_spark.operators.community import (
        connected_components,
        label_propagation,
    )
    from knowledge_graph_spark.operators.graphops import partition_agreement

    nodes, edges = gold_graph
    leiden = nodes.filter(F.col("cluster").isNotNull()).select("title", "cluster")
    assert leiden.count() == 181
    lt = leiden.select("title")
    e = (
        edges.join(lt.withColumnRenamed("title", "source"), "source")
        .join(lt.withColumnRenamed("title", "target"), "target")
        .select("source", "target", "weight")
    )
    ref = leiden.withColumnRenamed("cluster", "component")

    lpa = label_propagation(lt, e, max_iter=10)
    (agr,) = partition_agreement(lpa, ref).collect()
    assert agr["n_nodes"] == 181
    # floors: well above the CC baseline, bulk of Leiden pairs recovered
    assert agr["rand_micro"] >= 750_000, agr
    assert agr["recall_micro"] >= 550_000, agr
    assert agr["f1_micro"] >= 450_000, agr

    cc = connected_components(lt, e).withColumnRenamed("component", "community")
    (base,) = partition_agreement(cc, ref).collect()
    # the graph is one component, so CC carries no cluster information;
    # LPA must beat it decisively on every score
    assert agr["f1_micro"] > base["f1_micro"] + 200_000, (agr, base)
    assert agr["rand_micro"] > base["rand_micro"] + 200_000, (agr, base)


def test_graphml_write_nonfinite_and_invalid_chars(spark, tmp_path):
    """Round-4 ADVICE lows: (a) non-finite float attributes (nan/±inf)
    export as nan/inf/-inf instead of crashing _fmt; (b) XML-1.0-invalid
    control characters are stripped at write time so the emitted file is
    re-readable by any XML parser — lossless over the representable
    subset, same constraint nx's writer has."""
    import math

    from pyspark.sql import types as T

    from knowledge_graph_spark.graphml import read_graphml, write_graphml

    nodes = spark.createDataFrame(
        [
            ("nan-node", float("nan"), "clean"),
            ("inf-node", float("inf"), "bell\x07desc\x00null"),
            ("ninf-node", float("-inf"), "esc\x1b[0m"),
            ("ctl\x01id", 2.5, "tab\tand\nnewline kept"),
        ],
        T.StructType(
            [
                T.StructField("title", T.StringType(), False),
                T.StructField("weight", T.DoubleType(), True),
                T.StructField("description", T.StringType(), True),
            ]
        ),
    )
    edges = spark.createDataFrame(
        [("nan-node", "ctl\x01id", float("nan"))],
        T.StructType(
            [
                T.StructField("source", T.StringType(), False),
                T.StructField("target", T.StringType(), False),
                T.StructField("weight", T.DoubleType(), True),
            ]
        ),
    )
    out = str(tmp_path / "nonfinite.graphml")
    write_graphml(nodes, edges, out)  # must not raise
    n2, e2 = read_graphml(spark, out)  # must re-parse
    got = {r["title"]: r for r in n2.collect()}
    assert math.isnan(got["nan-node"]["weight"])
    assert got["inf-node"]["weight"] == float("inf")
    assert got["ninf-node"]["weight"] == float("-inf")
    # invalid chars stripped; XML-legal whitespace survives
    assert got["inf-node"]["description"] == "belldescnull"
    assert got["ninf-node"]["description"] == "esc[0m"
    assert got["ctlid"]["description"] == "tab\tand\nnewline kept"
    (erow,) = e2.collect()
    assert (erow["source"], erow["target"]) == ("nan-node", "ctlid")
    assert math.isnan(erow["weight"])


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_hierarchy_matches_reference_on_random_partitions(spark, data):
    """Property extension of the golden hierarchy replay: on RANDOM
    multi-level node partitions (refining or not), the distributed
    community_hierarchy emits exactly the subset-containment pairs the
    reference's restore_community_hierarchy loop emits.  Partition
    inputs make the reference's early ``break`` order-independent, so
    the comparison is well-defined."""
    from knowledge_graph_spark.operators.reports import community_hierarchy

    n = data.draw(st.integers(3, 14))
    nodes = [f"n{i}" for i in range(n)]
    rows = []
    for level in range(data.draw(st.integers(2, 3))):
        k = data.draw(st.integers(1, max(1, n // 2)))
        assignment = data.draw(
            st.lists(st.integers(0, k - 1), min_size=n, max_size=n)
        )
        for node, c in zip(nodes, assignment):
            rows.append((node, f"L{level}c{c}", level))
    members = spark.createDataFrame(
        rows, "title string, community string, level int"
    )
    ours = sorted(
        (r["community"], r["level"], r["sub_community"], r["sub_community_size"])
        for r in community_hierarchy(members).collect()
    )
    ref = sorted(
        (d["community"], d["level"], d["sub_community"], d["sub_community_size"])
        for d in _reference_hierarchy(members.toPandas())
    )
    assert ours == ref
