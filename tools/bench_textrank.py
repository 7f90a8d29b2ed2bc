"""Scale probe for the grouped iterative kernel family (wave 16).

textrank_turns is the first GROUPED fixed-round kernel (one independent
PageRank per conversation, all conversations advanced by the same
relational loop) — its scaling story is different from the global graph
kernels in tools/bench_graph.py: the work is embarrassingly
conversation-parallel and the probe checks that the chosen kernel
actually realizes that — same materialized input at two parallelism
levels (default local[2] vs local[8]; TEXTRANK_LEVELS overrides),
efficiency = T_lo / ((hi/lo) · T_hi).  TEXTRANK_KERNEL picks the
physical plan ("arrow" dense per-conv cogroup, default, or
"relational" grouped_pagerank rounds); measured results for both are
in BENCH_SCALING.md.

Input: the deterministic synthesizer at probe size (default 30k convs ×
20/80 heavy-tailed turns ≈ 825k turns; the similarity join expands to
~10^8 intermediate rows — a real shuffle workload, not a toy).  Levels
run INTERLEAVED (8, 32, 8, 32 …) and the report takes the best per
level, same protocol as tools/bench_scaling.py.  Run on a QUIET box.

Usage:
    python tools/bench_textrank.py            # interleaved probe + report
    python tools/bench_textrank.py --one 8    # single level (subprocess mode)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
N_CONVS = int(os.environ.get("TEXTRANK_CONVS", "30000"))
BASE_TURNS = int(os.environ.get("TEXTRANK_TURNS", "20"))
# data dir is size-keyed so changing TEXTRANK_CONVS can't silently reuse
# a stale materialization (the bench_scaling mixed-size lesson)
DATA = REPO / f".bench_textrank_data_{N_CONVS}x{BASE_TURNS}"
CYCLES = int(os.environ.get("TEXTRANK_CYCLES", "2"))
LEVELS = tuple(
    int(x) for x in os.environ.get("TEXTRANK_LEVELS", "2,8").split(",")
)
# Shuffle partition count is FIXED across levels: for a shuffle-heavy
# kernel the shard count is a property of the DATA (size partitions to
# bytes so sorts don't spill), not of the core count — scaling 2×cores
# like tools/bench_scaling.py does for the CPU-bound pipeline would give
# local[2] four ~20M-row sort partitions (deep spill) and change the
# PLAN between levels instead of just the parallelism.
SHUFFLE = int(os.environ.get("TEXTRANK_SHUFFLE", "64"))
# "arrow" (default; 1 shuffle, dense per-conv kernel) or "relational"
# (grouped_pagerank loop — the shape the SQL oracle mirrors)
KERNEL = os.environ.get("TEXTRANK_KERNEL", "arrow")


def materialize() -> None:
    sys.path.insert(0, str(REPO))
    from knowledge_graph_spark.session import get_spark
    from knowledge_graph_spark.synth import synth_transcripts

    spark = get_spark(app_name="textrank-gen", master="local[32]")
    df = synth_transcripts(spark, n_convs=N_CONVS, base_turns=BASE_TURNS)
    df.write.mode("overwrite").parquet(str(DATA / "transcripts"))
    spark.stop()


def run_one(cpus: int) -> dict:
    sys.path.insert(0, str(REPO))
    from knowledge_graph_spark.operators.assemble import textrank_turns
    from knowledge_graph_spark.session import get_spark

    spark = get_spark(
        app_name=f"textrank-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=SHUFFLE,
    )
    t = spark.read.parquet(str(DATA / "transcripts"))
    n_turns = t.count()
    # warm the JVM + Python workers on a small prefix, then time the run
    textrank_turns(t.filter("conv_id < 'c000200'"), kernel=KERNEL).count()
    t0 = time.time()
    n_rows = textrank_turns(t, kernel=KERNEL).count()
    wall = time.time() - t0
    spark.stop()
    return {"cpus": cpus, "n_turns": n_turns, "rows": n_rows, "wall_s": round(wall, 1)}


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--one":
        print(json.dumps(run_one(int(sys.argv[2]))))
        return
    if not (DATA / "transcripts").exists():
        materialize()
    best: dict[int, dict] = {}
    for c in range(CYCLES):
        for cpus in LEVELS:
            out = subprocess.run(
                [sys.executable, __file__, "--one", str(cpus)],
                capture_output=True,
                text=True,
                check=True,
            )
            r = json.loads(out.stdout.strip().splitlines()[-1])
            if cpus not in best or r["wall_s"] < best[cpus]["wall_s"]:
                best[cpus] = r
            print(f"cycle {c} local[{cpus}]: {r['wall_s']}s")
    lo, hi = min(LEVELS), max(LEVELS)
    t_lo, t_hi = best[lo]["wall_s"], best[hi]["wall_s"]
    eff = t_lo / ((hi / lo) * t_hi)
    report = {
        "kernel": f"textrank_turns[{KERNEL}] (grouped integer PageRank, 5 rounds)",
        "n_turns": best[lo]["n_turns"],
        "shuffle_partitions": SHUFFLE,
        "best": {str(k): v["wall_s"] for k, v in best.items()},
        f"turns_per_sec_{hi}": round(best[hi]["n_turns"] / t_hi, 1),
        f"efficiency_{lo}_to_{hi}": round(eff, 3),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
