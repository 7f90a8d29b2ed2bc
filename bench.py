"""Per-round benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline set = one query per engine subsystem: the full KG construction
pipeline (assembly → chunk → extract → parse → merge → rank), community
LPA, text QC profile, exact + n-gram + MinHash dedup, cosine top-k and
exact near-dup over embeddings, and the multimodal metadata scan.

``value`` is the end-to-end wall-clock sum; ``turns_per_sec`` (the north
rule's throughput unit — transcript turns through the full KG pipeline)
is included alongside.  Scaling-efficiency evidence (same job at local[8]
vs local[32]) lives in tools/bench_scaling.py → BENCH_SCALING.md.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from knowledge_graph_spark.session import get_spark
from knowledge_graph_spark.synth import load_views, transcripts_from_events


def _run_pass(spark, entry, sf_dir: str, graph_edges: int) -> tuple[dict, int, int, float]:
    timings: dict[str, float] = {}

    def timed(name, make_df):
        t0 = time.time()
        n = make_df().count()
        timings[name] = round(time.time() - t0, 3)
        return n

    # Full KG construction (flagship): measure turns/sec through the
    # whole extract→merge→rank dataflow.  Uses the entry's stage cache so
    # the downstream queries reuse the persisted hub tables instead of
    # recomputing extraction per query (matches the driver-gate shape).
    n_turns = transcripts_from_events(spark, sf_dir).count()
    t0 = time.time()
    stages = entry._stages(spark, sf_dir)
    n_edges = stages["edges_ranked"].count()
    # the nodes hub table is a pipeline PRODUCT — materialize it inside
    # the kg_pipeline timing (it was previously lazily paid by whichever
    # downstream query touched it first, inflating communities_lpa ~5s)
    stages["nodes"].count()
    kg_secs = time.time() - t0
    timings["kg_pipeline"] = round(kg_secs, 3)

    timed("communities_lpa", lambda: entry.q_communities(spark, sf_dir))
    timed("text_profile", lambda: entry.q_text_profile(spark, sf_dir))
    timed("exact_dedup", lambda: entry.q_exact_dedup(spark, sf_dir))
    timed("ngram_dedup", lambda: entry.q_ngram_dedup(spark, sf_dir))
    timed("minhash_dedup", lambda: entry.q_minhash_dedup(spark, sf_dir))
    timed("emb_topk", lambda: entry.q_emb_topk(spark, sf_dir))
    # exact pairwise-fold variant is the gate's oracle query; the bench
    # measures the production BLAS path (operators/similarity.py fast ops)
    from knowledge_graph_spark.operators import similarity

    timed(
        "emb_neardup_fast",
        lambda: similarity.neardup_pairs_fast(spark.table("embeddings"), threshold=0.35),
    )
    timed("media_meta", lambda: entry.q_media_meta(spark, sf_dir))
    # round-2 additions: batch sessionization + tumbling-window rollup
    # (new subsystems; documented in BASELINE.md — round-1 comparable
    # subtotal = value minus these two entries)
    timed("sessions", lambda: entry.q_sessions(spark, sf_dir))
    timed("event_hourly", lambda: entry.q_event_hourly(spark, sf_dir))
    # round-2 second-wave additions: benchmark decontamination (broadcast
    # eval-gram probe) + SemDeDup semantic dedup (IVF-cell-blocked cosine)
    timed("decontam", lambda: entry.q_decontam(spark, sf_dir))
    timed("semantic_dedup", lambda: entry.q_semantic_dedup(spark, sf_dir))
    # round-2 sixth-session additions: DSIR importance ranking (hashed-
    # bigram LLR + top-K) and the BPE tokenizer-training loop (3 merge
    # rounds over the word-frequency table) — subtract for comparability
    timed("dsir_select", lambda: entry.q_dsir_select(spark, sf_dir))
    timed("bpe_merges", lambda: entry.q_bpe_merges(spark, sf_dir))
    # session-16 addition: per-conversation TextRank (grouped integer
    # PageRank over the turn-similarity graph — the iterative text
    # kernel, conv-parallel rounds) — subtract for round-2 comparability
    timed("textrank", lambda: entry.q_textrank(spark, sf_dir))
    # round-3 additions: the distributed iterative graph family on an
    # sf-proportional synthetic graph (3M·sf edges — PAST the 200k
    # driver-local cutover at sf0.1), so regressions in the iterative
    # kernels are visible round-over-round.  Graph build/materialize is
    # excluded from the timings; subtract these four entries for
    # round-1/2 comparability.  Full per-round/shuffle study:
    # tools/bench_graph.py → BENCH_SCALING.md.
    from knowledge_graph_spark.operators.community import (
        label_propagation as lpa_op,
    )
    from knowledge_graph_spark.operators.graphops import pagerank_int, scc_fixed_rounds
    from knowledge_graph_spark.operators.sketches import hyperball
    from knowledge_graph_spark.synth import synth_graph

    g_edges = synth_graph(
        spark, n_nodes=max(graph_edges // 8, 8), n_edges=graph_edges
    ).persist()
    g_edges.count()
    g_nodes = (
        g_edges.selectExpr("source AS title")
        .union(g_edges.selectExpr("target AS title"))
        .distinct()
        .persist()
    )
    g_nodes.count()
    timed("pagerank_graph", lambda: pagerank_int(g_edges, iterations=5))
    timed("scc_graph", lambda: scc_fixed_rounds(g_edges))
    timed(
        "lpa_graph",
        lambda: lpa_op(g_nodes, g_edges, local_threshold=0, max_iter=5),
    )
    timed("hyperball_graph", lambda: hyperball(g_edges, rounds=2, p=6))
    # round-3 late addition: sampled Brandes betweenness (4 pivots,
    # 4 fwd + 4 bwd rounds) — subtract for round-2 comparability too
    from knowledge_graph_spark.operators.graphops import betweenness_sampled

    timed("betweenness_graph", lambda: betweenness_sampled(g_edges))
    # session-13 addition: Borůvka MSF (3 rounds for the bench line —
    # the selection+contraction cost profile, not forest completeness);
    # subtract for round-2 comparability too
    from pyspark.sql import functions as _F

    from knowledge_graph_spark.operators.graphops import min_spanning_forest

    g_w = g_edges.withColumn(
        "weight",
        (_F.pmod(_F.xxhash64("source", "target"), _F.lit(97)) + 1).cast("double"),
    )
    timed("msf_graph", lambda: min_spanning_forest(g_w, rounds=3))
    g_edges.unpersist()
    g_nodes.unpersist()
    # round-4 addition (VERDICT r3 #4): one representative kernel timed
    # on the KG actually EXTRACTED by the pipeline from sf-proportional-
    # vocabulary transcripts — the skew-REALISTIC graph (natural hub from
    # vocabulary frequency), not the uniform synthetic one.  Graph build
    # (a second full extraction at a bigger vocabulary) is excluded from
    # the timing, like the synthetic family above.  Subtract this line
    # for round-1/2/3 comparability.
    from knowledge_graph_spark.pipeline import PipelineConfig, build_graph
    from knowledge_graph_spark.synth import synth_transcripts

    kg_convs = max(int(graph_edges // 30), 200)  # ~10k convs at sf0.1
    kg_tr = synth_transcripts(
        spark,
        n_convs=kg_convs,
        base_turns=8,
        n_person=kg_convs,
        n_city=max(kg_convs // 3, 1),
    )
    kg_edges = (
        build_graph(
            kg_tr, PipelineConfig(chunk_size=160, chunk_overlap=0, tokenizer="ws")
        )["edges"]
        .select("source", "target")
        .persist()
    )
    n_kg_edges = kg_edges.count()
    timed("pagerank_kg", lambda: pagerank_int(kg_edges, iterations=5))
    timings["_n_kg_edges"] = n_kg_edges  # context, not a timing (stripped below)
    kg_edges.unpersist()
    return timings, n_turns, n_edges, kg_secs


def run_bench(sf_dir: str, cpus: str, passes: int = 2) -> dict:
    """Interleaved best-of-``passes``: the host carries bursty external
    load (samples in BENCH_SCALING.md swing 2-8x), so each query's wall
    time is the MIN across full passes — the same protocol the scaling
    harness uses.  The entry's persisted stage cache is dropped between
    passes so the kg_pipeline extraction is genuinely re-measured, not
    replayed from cache."""
    spark = get_spark(app_name="kg-bench", master=f"local[{cpus}]")
    load_views(spark, sf_dir)

    import __spark_entry__ as entry

    m_sf = re.search(r"sf([0-9.]+)", sf_dir)
    sf_val = float(m_sf.group(1).rstrip(".")) if m_sf else 0.1
    graph_edges = int(3_000_000 * sf_val)

    best: dict[str, float] = {}
    best_kg = float("inf")
    n_turns = n_edges = 0
    for p in range(max(1, passes)):
        if p:
            key = (spark.sparkContext.applicationId, sf_dir)
            for df in entry._STAGE_CACHE.pop(key, {}).values():
                df.unpersist()
        timings, n_turns, n_edges, kg_secs = _run_pass(spark, entry, sf_dir, graph_edges)
        best_kg = min(best_kg, kg_secs)
        best = {k: min(best.get(k, v), v) for k, v in timings.items()}

    n_kg_edges = int(best.pop("_n_kg_edges", 0))
    total = round(sum(best.values()), 3)
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": best,
        "sf": float(m.group(1).rstrip(".")) if m else None,
        "turns_per_sec": round(n_turns / best_kg, 1),
        "n_turns": n_turns,
        "n_edges": n_edges,
        "n_kg_edges": n_kg_edges,
        "cpus": int(cpus),
        "passes": max(1, passes),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))
    result = run_bench(sf_dir, cpus, passes)
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
