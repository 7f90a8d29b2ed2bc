"""Entity name-embedding + vector entity-mapping tests (Q1 vector path)."""

from __future__ import annotations

import numpy as np

from knowledge_graph_spark.operators.embedding import (
    _trigram_vec,
    map_query_to_entities,
    with_name_embedding,
)


def test_trigram_vec_properties():
    a = _trigram_vec("ACME CORP", 64)
    b = _trigram_vec("ACME CORP", 64)
    assert np.allclose(a, b) and abs(np.linalg.norm(a) - 1.0) < 1e-9
    near = _trigram_vec("ACME CORPORATION", 64)
    far = _trigram_vec("ZEBRA HOLDINGS", 64)
    assert a @ near > a @ far  # shared trigram mass ranks aliases closer
    assert np.linalg.norm(_trigram_vec("", 64)) == 0.0


def test_with_name_embedding_column(spark):
    df = spark.createDataFrame([("ACME",), ("GLOBEX",)], "title string")
    out = with_name_embedding(df, dim=32).collect()
    assert all(len(r.name_embedding) == 32 for r in out)
    assert all(abs(sum(x * x for x in r.name_embedding) - 1.0) < 1e-5 for r in out)


def test_map_query_to_entities_ranks_alias_first(spark):
    nodes = spark.createDataFrame(
        [("ACME_CORPORATION",), ("GLOBEX_INC",), ("NORTHWIND_TRADERS",), ("CITY_3",)],
        "title string",
    )
    hits = map_query_to_entities(nodes, "acme corp", k=2).collect()
    assert hits[0].title == "ACME_CORPORATION" and hits[0].rk == 1
    assert len(hits) == 2
