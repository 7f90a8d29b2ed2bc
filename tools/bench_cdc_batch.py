"""CDC micro-batch amortization curve (VERDICT r3 #6).

The streaming insert-fold rates were documented as batch-size-bound
(fixed versioned-commit cost per micro-batch), but the floor was
asserted, not measured.  This harness runs the SAME kg_cdc insert fold
over the SAME materialized input at several ``maxFilesPerTrigger``
levels (fresh warehouse + checkpoint per level — identical total work,
only the batch partitioning changes), then least-squares fits

    wall = fixed_per_batch · n_batches + marginal_per_row · n_rows

so the per-fold commit overhead and the true row-marginal rate fall out
of the data.  The recommended production micro-batch size is where the
fixed cost drops under ~10% of the batch wall.

Usage: python tools/bench_cdc_batch.py
Output: one JSON line per level + the fit + a markdown table for
BENCH_SCALING.md.  Work lands under .bench_cdc/ (gitignored).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

WORK = REPO / ".bench_cdc"
N_CONVS = int(os.environ.get("CDC_CONVS", "30000"))
N_FILES = 256
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
# files per trigger → micro-batch count over 256 files: 32, 8, 4, 1
LEVELS = [int(x) for x in os.environ.get("CDC_LEVELS", "8,32,64,256").split(",")]


def main() -> None:
    from knowledge_graph_spark.io import TableIO
    from knowledge_graph_spark.session import get_spark
    from knowledge_graph_spark.streaming.retract_stream import run_kg_cdc

    from knowledge_graph_spark.synth import synth_transcripts

    if WORK.exists():
        shutil.rmtree(WORK)
    WORK.mkdir()
    spark = get_spark(app_name="bench-cdc-batch", master=f"local[{CPUS}]")

    turns_dir = str(WORK / "turns")
    transcripts = synth_transcripts(spark, n_convs=N_CONVS, base_turns=8)
    n_turns = transcripts.count()
    transcripts.repartition(N_FILES).write.parquet(turns_dir)

    rows = []
    for fpt in LEVELS:
        tag = f"fpt{fpt}"
        t0 = time.perf_counter()
        run_kg_cdc(
            spark,
            turns_dir,
            None,
            TableIO(spark, base=str(WORK / f"wh_{tag}")),
            checkpoint_dir=str(WORK / f"ckpt_{tag}"),
            max_files_per_trigger=fpt,
        )
        wall = time.perf_counter() - t0
        n_batches = (N_FILES + fpt - 1) // fpt
        rec = {
            "files_per_trigger": fpt,
            "n_batches": n_batches,
            "rows_per_batch": round(n_turns / n_batches),
            "wall_sec": round(wall, 2),
            "rows_per_sec": round(n_turns / wall, 1),
        }
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    # least-squares fit wall = a·n_batches + b·n_rows (n_rows constant
    # across levels, so fold it into a per-level intercept): with x =
    # n_batches, wall = a·x + c  →  a = fixed cost per micro-batch,
    # c = the batch-size-independent work for the whole input.
    xs = [r["n_batches"] for r in rows]
    ys = [r["wall_sec"] for r in rows]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    a = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / max(
        sum((x - mx) ** 2 for x in xs), 1e-9
    )
    c = my - a * mx
    marginal_rate = n_turns / c if c > 0 else float("inf")
    # batch size where fixed cost = 10% of batch wall:
    # a = 0.1 · (a + rows_b / marginal_rate)  →  rows_b = 9·a·marginal_rate
    rec_rows = 9 * a * marginal_rate if c > 0 else float("nan")
    fit = {
        "metric": "cdc_batch_fit",
        "cpus": int(CPUS),
        "n_turns": n_turns,
        "fixed_sec_per_batch": round(a, 2),
        "input_independent_sec": round(c, 2),
        "marginal_rows_per_sec": round(marginal_rate, 1),
        "recommended_rows_per_batch_10pct": round(rec_rows),
        "levels": rows,
    }
    print(json.dumps(fit), flush=True)

    print("\n| files/trigger | batches | rows/batch | wall s | rows/s |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['files_per_trigger']} | {r['n_batches']} | "
            f"{r['rows_per_batch']:,} | {r['wall_sec']} | {r['rows_per_sec']:,} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
