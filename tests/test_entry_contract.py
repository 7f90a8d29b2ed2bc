"""Driver-contract test: __spark_entry__ queries vs their DuckDB oracles.

This automates the driver's correctness gate locally (sf0.001 subset — the
full sweep is tools/check_entry.py): row count, column set, and
order-insensitive value equality per query.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry_mod
from knowledge_graph_spark.synth import TABLES

SF_DIR = "/root/testdata/sf0.001"
# Fast representative subset — every stage family: SQL derivation, window
# assembly, chunk UDF, parse/merge, degree joins, recursive-CTE CC,
# claims chain, alias canonicalization, dedup resolution, embeddings.
CHECK = [
    "conv_docs",
    "text_units",
    "sentence_units",
    "qa_turns",
    "last_user_turns",
    "conv_context",
    "cc_dist",
    "lpa_dist",
    "cc_warm",
    "lpa_warm",
    "pr_warm",
    "cluster_drift",
    "partition_agreement",
    "kg_diff",
    "copurchase_core",
    "copurchase_rank",
    "entity_lifecycle",
    "temporal_salience",
    "kg_nodes",
    "kg_edges",
    "edge_rank",
    "connected_components",
    "claims",
    "canonical_nodes",
    "canonicalization",
    "community_reports",
    "communities_lpa",
    "community_hierarchy",
    "community_hierarchy3",
    "text_unit_links",
    "text_profile",
    "sessions",
    "dedup_clusters",
    "minhash_dedup",
    "emb_topk",
    "emb_neardup_lsh",
    "fuzzy_aliases",
    "k_core",
    "hash_split",
    "dsir_select",
    "filter_audit",
    "bpe_merges",
    "bpe_tokenize",
    "tool_scc",
    "leakfree_split",
    "hyperball",
    "neighborhood_fn",
    "harmonic_centrality",
    "eff_diameter",
    "conductance",
    "neighbor_sample",
    "pagerank_w",
    "contrastive_pairs",
    "ccnet_buckets",
    "kmv_overlap",
    "diverse_keep",
    "length_stats",
    "bfs_hops",
    "kmeans_cells",
    "top_terms",
    "vocab",
    "cooccur",
    "node_diff",
    "hll_tokens",
    "cms_counts",
    "bloom_words",
    "decontam_bloom",
    "stratum_cap",
    "hybrid_entities",
    "length_hist",
    "length_quantiles",
    "hll_lang",
    "degree_hist",
    # fifth-session families: agent-trace, graph additions, ANN audits,
    # PQ, temporal windows
    "tool_transitions",
    "turn_latency",
    "tool_latency",
    "conv_shapes",
    "tool_ngrams",
    "widest_paths",
    "link_pred",
    "bpe_pairs",
    "hits",
    "assortativity",
    "ann_recall_mp",
    "emb_pq_topk",
    "emb_ivfpq_topk",
    "event_sliding",
    "sessions_native",
    # round-3 additions
    "winnow_fp",
    "winnow_dedup",
    "katz",
    "betweenness",
    "metapaths",
    "kg_asof",
    "kg_growth",
    "type_mixing",
    # late round-3 waves: every remaining gate family
    "span_dedup",
    "k_truss",
    "typed_lpa",
    "max_matching",
    "blocking_audit",
    "comention_bursts",
    "topic_segments",
    "edge_pmi",
    "negative_samples",
    "jp_coloring",
    "kg_retract",
    # wave 11: language-ID model + multilevel coarsening
    "langid",
    "coarsen",
    "coarsen_l2",
    "partition_audit",
    # wave 12/13: Borůvka MSF family, peeling, ranking eval, telemetry
    "msf",
    "single_linkage",
    "densest",
    "knn_graph",
    "lp_ranking",
    "lp_mrr",
    "edge_decay",
    "heaps_law",
    "bpe_fertility",
    # wave 14: SSSP, C4 census, trained-LM filter, phrase search,
    # Matryoshka prefix recall
    "sssp",
    "four_cycles",
    "lm_bits",
    "phrase_search",
    "ann_recall_prefix",
    # wave 15: reciprocity, double-sweep diameter, 1-WL colors, lateness
    # audit, hourly KG churn, distinct-n diversity, tf-idf cosine pairs
    "reciprocity",
    "diameter_lb",
    "wl_colors",
    "lateness",
    "kg_churn",
    "ngram_diversity",
    "tfidf_pairs",
    # wave 16: TextRank turn salience, weak supervision, source rollup
    "textrank",
    "weak_votes",
    "weak_lf_stats",
    "source_profile",
    "best_of_cluster",
    "langid_confusion",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", CHECK)
def test_query_matches_oracle(spark, duck, name):
    sdf = entry_mod.queries()[name](spark, SF_DIR).toPandas()
    odf = duck.execute(entry_mod.oracle_sql()[name]).fetchdf()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    a, b = _norm(sdf), _norm(odf)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert {"source", "target", "weight", "rank"} <= set(df.columns)


def test_every_query_has_oracle_or_is_declared_iterative():
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    # every gate is hash-checked — the LPA ops use the unrolled-round oracle
    assert set(qs) == set(os_)


def test_kg_asof_is_strict_subset(spark):
    """The as-of snapshot must be built from a STRICT subset of turns
    (the midpoint cutoff keeps roughly half) and its total edge weight
    must be strictly below the full KG's — guards against the filter
    silently keeping everything."""
    from pyspark.sql import functions as F

    full = entry_mod.queries()["kg_edges"](spark, SF_DIR)
    asof = entry_mod.queries()["kg_asof"](spark, SF_DIR)
    w_full = full.agg(F.sum("weight")).first()[0]
    w_asof = asof.agg(F.sum("weight")).first()[0]
    assert 0 < w_asof < w_full


def test_kg_retract_is_strict_subset(spark):
    """Retraction must actually remove contributions (the fingerprint
    selects a non-empty conversation set) while keeping a non-empty
    graph — guards against a vacuous delete set."""
    from pyspark.sql import functions as F

    full = entry_mod.queries()["kg_edges"](spark, SF_DIR)
    ret = entry_mod.queries()["kg_retract"](spark, SF_DIR)
    w_full = full.agg(F.sum("weight")).first()[0]
    w_ret = ret.agg(F.sum("weight")).first()[0]
    assert 0 < w_ret < w_full


def test_namespaced_prelude_covers_every_cte():
    """_namespaced_prelude renames by the explicit _PRELUDE_CTE_NAMES
    list; a CTE added to ORACLE_PRELUDE but not the list would silently
    collide with the un-prefixed prelude inside the kg_diff oracle.
    Parse the prelude's actual CTE heads and require exact agreement."""
    import re

    import __spark_entry__ as entry

    names = set(
        re.findall(
            r"(?m)^\s*,?\s*([A-Za-z_][A-Za-z0-9_]*)\s*(?:\([A-Za-z0-9_,\s]*\))?"
            r"\s+AS\s+(?:MATERIALIZED\s+)?\(",
            entry.ORACLE_PRELUDE,
        )
    )
    assert names == set(entry._PRELUDE_CTE_NAMES)
