"""Parity of the distributed parser/merger vs the vendored sequential oracle
on the F4 micro-fixture (FIXTURES.md): exact triple-set equality (P/R = 1.0)
plus node merge equality, including every edge case the reference parser
handles (reference graph/extractors/graph_extractor.py:180-292)."""

import pandas as pd

from knowledge_graph_spark import oracle as orc
from knowledge_graph_spark.operators.extract import GleaningBackend, RuleBackend
from knowledge_graph_spark.operators.parse import parse_and_merge

# F4 fixture: delimiter-format records with deliberate edge cases.
F4 = [
    # duplicate entity w/ differing descriptions; type only on 2nd record
    (
        "u01",
        '("entity"<|>Acme<|>ORGANIZATION<|>first desc)##'
        '("entity"<|>ACME<|><|>second desc)##'
        '("relationship"<|>ACME<|>BOB<|>acme employs bob<|>2)##<|COMPLETE|>',
    ),
    # reversed duplicate edge (weight must SUM); endpoint never declared
    (
        "u02",
        '("relationship"<|>BOB<|>ACME<|>acme employs bob<|>3.5)##'
        '("entity"<|>bob<|>PERSON<|>bob is a person)##<|COMPLETE|>',
    ),
    # non-numeric weight → 1.0; HTML escape + control char in name/desc
    (
        "u03",
        '("relationship"<|>ACME &amp; CO<|>BOB<|>works\x07 with<|>seven)##'
        '("entity"<|> acme &amp; co <|>ORGANIZATION<|>amp desc)##<|COMPLETE|>',
    ),
    # too-few-field records are skipped entirely
    (
        "u04",
        '("entity"<|>ONLYNAME)##("relationship"<|>A<|>B<|>no weight here)##'
        '("entity"<|>CHARLIE<|>PERSON<|>charlie desc)##<|COMPLETE|>',
    ),
    # stray parens inside fields survive one-layer outer strip
    (
        "u05",
        '("entity"<|>DELTA (CORP)<|>ORGANIZATION<|>paren desc (x))##<|COMPLETE|>',
    ),
]


def _spark_result(spark):
    raw = spark.createDataFrame(
        [("conv0", uid, rec) for uid, rec in F4],
        schema="conv_id string, text_unit_id string, records string",
    )
    nodes, edges = parse_and_merge(raw)
    node_rows = {
        r.title: (r.type, r.description, tuple(r.source_id))
        for r in nodes.collect()
    }
    edge_rows = {
        (r.source, r.target): (r.weight, r.description, tuple(r.text_unit_ids))
        for r in edges.collect()
    }
    return node_rows, edge_rows


def _oracle_result():
    nodes, edges = orc.parse_records_oracle(sorted(F4))
    node_rows = {
        row["title"]: (row["type"], row["description"], tuple(row["source_id"]))
        for row in orc.oracle_node_rows(nodes)
    }
    edge_rows = {
        (row["source"], row["target"]): (
            row["weight"],
            row["description"],
            tuple(row["text_unit_ids"]),
        )
        for row in orc.oracle_edge_rows(edges)
    }
    return node_rows, edge_rows, edges


def test_triple_parity_exact(spark):
    s_nodes, s_edges = _spark_result(spark)
    o_nodes, o_edges, raw_edges = _oracle_result()

    ours = {
        (src, pred, tgt)
        for (src, tgt), (_, desc, _) in s_edges.items()
        for pred in desc.split("\n")
    }
    ref = orc.triples(raw_edges)
    p, r = orc.precision_recall(ours, ref)
    assert (p, r) == (1.0, 1.0)


def test_node_merge_parity(spark):
    s_nodes, _ = _spark_result(spark)
    o_nodes, _, _ = _oracle_result()
    assert s_nodes == o_nodes
    # spot-check reference semantics survived:
    #  - name normalized (upper + unescape), descriptions set-unioned sorted
    assert s_nodes["ACME"][1] == "first desc\nsecond desc"
    #  - type = last non-empty (u01 first record) / from sole record
    assert s_nodes["ACME"][0] == "ORGANIZATION"
    assert s_nodes["BOB"][0] == "PERSON"
    #  - html unescape applied
    assert "ACME & CO" in s_nodes
    #  - too-few-field records (entity < 4, relationship < 5 fields) are
    #    skipped and create no nodes
    assert "ONLYNAME" not in s_nodes
    assert "A" not in s_nodes and "B" not in s_nodes
    #  - endpoint provenance is reference-exact: the FIRST touching record
    #    (edge in u01, before BOB's declaration in u02) creates the node
    #    with its source id; the u03 edge touches an existing node and
    #    adds nothing (reference graph_extractor.py:253-266)
    assert s_nodes["BOB"][2] == ("u01", "u02")
    #  - inner parens preserved
    assert "DELTA (CORP)" in s_nodes


def test_edge_merge_parity(spark):
    _, s_edges = _spark_result(spark)
    _, o_edges, _ = _oracle_result()
    assert s_edges == o_edges
    # weight summed across reversed duplicates; canonical order
    assert s_edges[("ACME", "BOB")][0] == 5.5
    # non-numeric weight fell back to 1.0; control char stripped from desc
    assert s_edges[("ACME & CO", "BOB")][0] == 1.0
    assert s_edges[("ACME & CO", "BOB")][1] == "works with"


# ---------------------------------------------------------------------------
# Gleaning rounds (E2 round structure, reference graph_extractor.py:140-176)
# ---------------------------------------------------------------------------

GLEAN_TEXT = "AB met USER_1 and CD near CITY_2"


def test_gleaning_round0_is_rule_backend():
    s = pd.Series([GLEAN_TEXT, "", None, "nothing lower case"])
    r0 = GleaningBackend(max_gleanings=0).extract(s)
    rb = RuleBackend().extract(s)
    assert list(r0.fillna("∅")) == list(rb.fillna("∅"))


def test_gleaning_appends_missed_entities(spark):
    """Round 1 (CONTINUE) recovers the 2-char mentions the primary
    pattern misses and connects them to everything known; parse+merge of
    the combined stream matches the sequential oracle (gleaning-closed),
    and the round-1 graph strictly extends the round-0 graph."""
    recs1 = GleaningBackend(max_gleanings=1).extract(pd.Series([GLEAN_TEXT]))[0]
    recs0 = RuleBackend().extract(pd.Series([GLEAN_TEXT]))[0]
    assert recs1.startswith(recs0.replace("##<|COMPLETE|>", ""))  # append-only

    def graph(recs):
        raw = spark.createDataFrame(
            [("c0", "u0", recs)], "conv_id string, text_unit_id string, records string"
        )
        nodes, edges = parse_and_merge(raw)
        return (
            {r.title for r in nodes.collect()},
            {(r.source, r.target): r.weight for r in edges.collect()},
        )

    n0, e0 = graph(recs0)
    n1, e1 = graph(recs1)
    assert n0 == {"USER_1", "CITY_2"}
    assert n1 == {"USER_1", "CITY_2", "AB", "CD"}
    assert set(e0) < set(e1)  # strict extension
    # every old+new mention pair exists exactly once (weight 1)
    assert e1[("AB", "USER_1")] == 1.0 and e1[("AB", "CD")] == 1.0

    # gleaning-closed: the distributed merge of the 2-round stream equals
    # the vendored sequential oracle on the same records
    o_nodes, o_edges = orc.parse_records_oracle([("u0", recs1)])
    assert {row["title"] for row in orc.oracle_node_rows(o_nodes)} == n1
    assert {
        (row["source"], row["target"]): row["weight"]
        for row in orc.oracle_edge_rows(o_edges)
    } == e1
