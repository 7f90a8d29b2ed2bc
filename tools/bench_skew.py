"""Skew micro-benchmark: salted two-phase node merge vs naive one-phase.

The entity-name groupBy is Zipf-skewed (hot entities appear in a large
fraction of turns — SURVEY.md §7 risk 3).  This measures the exact
aggregation used by `operators/parse.merge_nodes` (salted partial →
final) against the naive single-phase groupBy on a synthetic stream
where ONE key carries `hot_share` of all rows.

Run: python tools/bench_skew.py [n_rows] [hot_share]
Appends a results section to BENCH_SCALING.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from knowledge_graph_spark.operators.parse import merge_nodes, merge_nodes_single
from knowledge_graph_spark.session import get_spark

REPO = Path(__file__).resolve().parents[1]


def skewed_entities(spark, n_rows: int, hot_share: float):
    """(name, type, description, source_id, ord) with one hot key."""
    cut = int(1 / hot_share)
    return spark.range(n_rows).select(
        F.when(F.col("id") % cut == 0, F.lit("HOT_ENTITY"))
        .otherwise(F.concat(F.lit("E"), (F.col("id") % 100_000).cast("string")))
        .alias("name"),
        F.lit("PERSON").alias("type"),
        F.concat(F.lit("desc "), (F.col("id") % 50).cast("string")).alias("description"),
        F.concat(F.lit("u"), (F.col("id") % 10_000).cast("string")).alias("source_id"),
        F.struct(
            (F.col("id") % 97).cast("string").alias("conv_id"),
            F.col("id").cast("string").alias("text_unit_id"),
            F.lit(0).alias("rec_idx"),
        ).alias("ord"),
    )


MARKER = "\n## Skew handling measurement (merge strategy)\n"


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    hot_share = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    spark = get_spark(app_name="skew-bench")
    ents = skewed_entities(spark, n_rows, hot_share).persist()
    ents.count()

    strategies = [
        ("salted_two_phase_default", merge_nodes),
        ("single_phase", merge_nodes_single),
    ]
    # warm-up pass for BOTH plans (JIT/codegen) — without it the
    # second-measured strategy always "wins" regardless of which it is
    for _, fn in strategies:
        fn(ents).count()
    results = {name: {"sec": float("inf"), "groups": 0} for name, _ in strategies}
    for _trial in range(2):  # alternate to cancel residual drift
        for name, fn in strategies:
            t0 = time.time()
            n = fn(ents).count()
            sec = round(time.time() - t0, 2)
            if sec < results[name]["sec"]:
                results[name] = {"sec": sec, "groups": n}
    for name, _ in strategies:
        print(name, results[name])

    ratio = results["single_phase"]["sec"] / results["salted_two_phase_default"]["sec"]
    report = {"n_rows": n_rows, "hot_share": hot_share, **results,
              "salted_advantage": round(ratio, 2)}
    print(json.dumps(report))
    md = REPO / "BENCH_SCALING.md"
    text = md.read_text().split(MARKER)[0]
    md.write_text(
        text
        + MARKER + "\n"
        f"{n_rows:,} entity rows, one key holding {int(hot_share * 100)}% of them\n"
        f"(`tools/bench_skew.py`, local[32]):\n\n"
        "| strategy | wall sec |\n|---|---|\n"
        f"| salted two-phase (`merge_nodes`, default) | {results['salted_two_phase_default']['sec']} |\n"
        f"| single-phase groupBy (`merge_nodes_single`) | {results['single_phase']['sec']} |\n\n"
        f"Salted/single ratio: **{report['salted_advantage']}×** — a wash at local\n"
        "scale (Spark's ObjectHashAggregate already partial-aggregates collect_set\n"
        "map-side, combining hot keys per input partition before the shuffle).\n"
        "Earlier unwarmed runs showed 4-9x swings in BOTH directions — pure JIT\n"
        "warm-up artifacts; this harness warms both plans and takes best-of-2\n"
        "alternating trials.  The salted default keeps the north-star strategy\n"
        "(splits hot-key shuffle fan-in on real clusters); the hot-key MEMORY\n"
        "lever under either strategy is the `max_source_ids` provenance cap.\n"
    )
    print(f"updated {md}")


if __name__ == "__main__":
    main()
