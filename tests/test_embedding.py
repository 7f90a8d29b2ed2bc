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


def test_vector_store_roundtrip_and_ann(spark, tmp_path):
    """S10 sink: embeddings round-trip through the store layout and feed
    the ANN operators unchanged."""
    from knowledge_graph_spark.io import TableIO
    from knowledge_graph_spark.operators import similarity
    from knowledge_graph_spark.operators.embedding import (
        read_vector_store,
        with_name_embedding,
        write_vector_store,
    )

    io = TableIO(spark, base=str(tmp_path / "vs"))
    nodes = spark.createDataFrame(
        [("ACME", "ORG"), ("ACME CO", "ORG"), ("ZEBRA", "ANIMAL")],
        "title string, type string",
    )
    emb = with_name_embedding(nodes)
    write_vector_store(emb, io, "entity_vectors", metadata_cols=["type"])
    back = read_vector_store(io, "entity_vectors")
    assert set(back.columns) == {"vec_id", "embedding", "metadata"}
    rows = {r.vec_id: r for r in back.collect()}
    assert rows["ACME"].metadata["type"] == "ORG" and len(rows["ACME"].embedding) == 64
    # ANN over the store: similar names rank closest
    q = back.filter(back.vec_id == "ACME")
    top = similarity.cosine_topk(back, q, k=1, id_col="vec_id").collect()
    assert top[0].neighbor_id == "ACME CO"
