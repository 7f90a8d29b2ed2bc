"""Scaling-efficiency evidence (north rule: throughput efficiency ≥ 0.8
from N to 4N executors).

This sandbox has no multi-node cluster, so — per the driver's guidance —
the same job runs at two parallelism levels (local[8] vs local[32]) over
the SAME materialized input, and we report throughput at both plus
efficiency = (T_8 / T_32) / 4.

Input: the deterministic executor-side synthesizer (synth_transcripts —
seeded, no external data) materialized ONCE to parquet so both runs scan
identical bytes.  The measured job is the full KG construction pipeline
(assembly → chunk → extract → parse → merge → degree/rank), the same
dataflow `spark-submit jobs/run_pipeline.py` executes on a real cluster.

Usage:
    python tools/bench_scaling.py            # both runs + report
    python tools/bench_scaling.py --one 8    # single measurement (subprocess mode)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
DATA = REPO / ".bench_scaling_data"
N_CONVS = int(os.environ.get("SCALING_CONVS", "8000"))
BASE_TURNS = int(os.environ.get("SCALING_TURNS", "50"))
CPU_LEVELS = (8, 32)


def materialize() -> None:
    sys.path.insert(0, str(REPO))
    from knowledge_graph_spark.session import get_spark
    from knowledge_graph_spark.synth import synth_transcripts

    spark = get_spark(app_name="scaling-gen", master="local[32]")
    df = synth_transcripts(spark, n_convs=N_CONVS, base_turns=BASE_TURNS)
    df.repartition(64, "conv_id").write.mode("overwrite").parquet(str(DATA))
    spark.stop()


def run_one(cpus: int) -> dict:
    sys.path.insert(0, str(REPO))
    from knowledge_graph_spark.pipeline import PipelineConfig, build_graph
    from knowledge_graph_spark.session import get_spark

    spark = get_spark(
        app_name=f"scaling-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    transcripts = spark.read.parquet(str(DATA))
    n_turns = transcripts.count()
    # warm the JVM/Python workers with one small pass so the measured run
    # reflects steady-state throughput, not first-job startup
    build_graph(transcripts.limit(1000), PipelineConfig(chunk_size=128, chunk_overlap=16, tokenizer="ws"))[
        "edges"
    ].count()
    t0 = time.time()
    stages = build_graph(
        transcripts, PipelineConfig(chunk_size=128, chunk_overlap=16, tokenizer="ws")
    )
    n_edges = stages["edges_ranked"].count()
    secs = time.time() - t0
    spark.stop()
    return {
        "cpus": cpus,
        "n_turns": n_turns,
        "n_edges": n_edges,
        "sec": round(secs, 2),
        "turns_per_sec": round(n_turns / secs, 1),
    }


def main() -> None:
    if "--one" in sys.argv:
        print(json.dumps(run_one(int(sys.argv[sys.argv.index("--one") + 1]))))
        return
    if not DATA.exists():
        materialize()
    results = {}
    for cpus in CPU_LEVELS:
        out = subprocess.run(
            [sys.executable, __file__, "--one", str(cpus)],
            capture_output=True,
            text=True,
            cwd=REPO,
            check=True,
        )
        results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
        print(results[cpus])
    lo, hi = CPU_LEVELS
    speedup = results[lo]["sec"] / results[hi]["sec"]
    eff = speedup / (hi / lo)
    report = {
        "job": "kg_construction_pipeline",
        "input_turns": results[hi]["n_turns"],
        "runs": list(results.values()),
        "speedup": round(speedup, 2),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(report))
    md = REPO / "BENCH_SCALING.md"
    md.write_text(
        "# Scaling evidence (north rule: efficiency >= 0.8 from N to 4N)\n\n"
        "No real cluster in this sandbox; per the driver guidance the same\n"
        "job (full KG construction pipeline) runs at two parallelism levels\n"
        "over the same materialized parquet input (deterministic seeded\n"
        f"synthesizer, {results[hi]['n_turns']} turns).\n\n"
        "| cores | wall sec | turns/sec |\n|---|---|---|\n"
        + "".join(
            f"| local[{r['cpus']}] | {r['sec']} | {r['turns_per_sec']} |\n"
            for r in results.values()
        )
        + f"\nSpeedup {lo}->{hi} cores: **{report['speedup']}x** "
        f"(ideal {hi // lo}x) — scaling efficiency **{report['scaling_efficiency']}**.\n\n"
        "Reproduce: `python tools/bench_scaling.py`.\n"
    )
    print(f"wrote {md}")


if __name__ == "__main__":
    main()
