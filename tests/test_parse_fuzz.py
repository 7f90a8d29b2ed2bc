"""Differential fuzz: distributed record parser vs the sequential oracle.

The corpus-level parity tests (test_parse_parity.py) check the real
extraction output; this file drives RANDOM record streams — hostile
names, html entities, control characters, parens, stray delimiters,
malformed/truncated tuples, junk weights — through BOTH
``parse_and_merge`` (distributed DataFrame algebra) and
``oracle.parse_records_oracle`` (the clean-room sequential
re-implementation of reference graph_extractor.py:180-292) and asserts
identical merged graphs.  Any divergence is a real semantic bug in one
of the two parsers.

Documented generation exclusions (places where CPython's ``float`` and
Spark's ``try_cast(double)`` legitimately differ, both standing in for
the reference's ``float()``): underscored numeric literals ("1_0"),
inf/nan spellings, and unicode digits.  Weights are multiples of 0.25
so distributed float summation is exact in binary (no ulp flakes).
Strings that contain an html entity OUTSIDE the native subset (e.g. the
accidental ``&ll;`` → ``≪``) are filtered out of generation: that
divergence is the documented _native_clean design limit (full-fidelity
unescaping lives in the ``unescape_clean`` pandas UDF), pinned
explicitly by ``test_exotic_entity_is_the_documented_native_gap``.
"""

from __future__ import annotations

import html

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import knowledge_graph_spark.oracle as orc
from knowledge_graph_spark.functions.text import _HTML_ENTITIES
from knowledge_graph_spark.operators.parse import parse_and_merge

NAME_ALPHABET = "ABc d&;()#x\t\x01é<>|"  # incl. control char + delim fragments
DESC_ALPHABET = "ab C&amp;&lt;()#y .\x02"


def _subset_unescape(s: str) -> str:
    for entity, char in _HTML_ENTITIES:
        s = s.replace(entity, char)
    return s


def _within_native_entity_subset(s: str) -> bool:
    """True when Python's full html.unescape and the native entity
    subset agree on this string — the parser's supported domain."""
    return html.unescape(s) == _subset_unescape(s)


names = st.text(alphabet=NAME_ALPHABET, min_size=1, max_size=10).filter(
    _within_native_entity_subset
)
descs = st.text(alphabet=DESC_ALPHABET, max_size=14).filter(
    _within_native_entity_subset
)
types = st.sampled_from(["", "PERSON", "org", "&amp;T", "  geo  ", "E<|>X"])
weights = st.one_of(
    st.integers(0, 200).map(lambda i: str(i / 4)),
    st.integers(0, 50).map(str),
    st.sampled_from(["", "junk", "1e2", "  7  ", "\t8\t", "+3", "-2.25"]),
)


@st.composite
def record(draw):
    kind = draw(st.integers(0, 5))
    if kind <= 1:
        return (
            f'("entity"<|>{draw(names)}<|>{draw(types)}<|>{draw(descs)})'
        )
    if kind <= 3:
        return (
            f'("relationship"<|>{draw(names)}<|>{draw(names)}'
            f"<|>{draw(descs)}<|>{draw(weights)})"
        )
    if kind == 4:  # malformed: wrong arity / missing parens / junk head
        return draw(
            st.sampled_from(
                [
                    '("entity"<|>ONLYNAME)',
                    '"relationship"<|>A<|>B',
                    "random ## junk",
                    '("entity")',
                    "",
                    "(<|><|>)",
                ]
            )
        )
    return draw(
        st.text(alphabet=NAME_ALPHABET + "#", max_size=12).filter(
            _within_native_entity_subset
        )
    )


units = st.lists(
    st.lists(record(), min_size=0, max_size=6),
    min_size=1,
    max_size=5,
)


def _spark_graph(spark, unit_records):
    rows = [
        ("conv0", f"u{idx:02d}", "##".join([*recs, "<|COMPLETE|>"]))
        for idx, recs in enumerate(unit_records)
    ]
    raw = spark.createDataFrame(
        rows, "conv_id string, text_unit_id string, records string"
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


def _oracle_graph(unit_records):
    pairs = sorted(
        (f"u{idx:02d}", "##".join([*recs, "<|COMPLETE|>"]))
        for idx, recs in enumerate(unit_records)
    )
    nodes, edges = orc.parse_records_oracle(pairs)
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
    return node_rows, edge_rows


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(unit_records=units)
def test_random_record_streams_parse_identically(spark, unit_records):
    s_nodes, s_edges = _spark_graph(spark, unit_records)
    o_nodes, o_edges = _oracle_graph(unit_records)
    assert s_nodes == o_nodes
    assert s_edges == o_edges


def test_exotic_entity_is_the_documented_native_gap(spark):
    """Pin the ONE known parser divergence as a documented design
    limit, not a silent one: an exotic html entity (``&ll;`` → ``≪``)
    is untouched by the native subset but unescaped by Python — and the
    full-fidelity ``unescape_clean`` pandas UDF matches Python exactly,
    so callers needing total fidelity have a supported path."""
    from pyspark.sql import functions as F

    from knowledge_graph_spark.functions.text import unescape_clean
    from knowledge_graph_spark.oracle import clean_str

    s = "y&ll;"
    assert not _within_native_entity_subset(s)
    [[full]] = (
        spark.createDataFrame([(s,)], "v string")
        .select(unescape_clean(F.col("v")))
        .collect()
    )
    assert full == clean_str(s) == "y≪"
