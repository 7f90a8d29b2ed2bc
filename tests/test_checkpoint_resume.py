"""Checkpoint/lineage/resume tests (M6): idempotent stage re-runs,
manifest contents, and the spark-submit job driver end-to-end."""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from knowledge_graph_spark.checkpoint import StageRunner, content_fingerprint
from knowledge_graph_spark.io import TableIO


@pytest.fixture()
def io(spark, tmp_path):
    return TableIO(spark, base=str(tmp_path / "wh"))


def test_stage_runner_computes_then_skips(spark, io):
    calls = {"n": 0}

    def make():
        calls["n"] += 1
        return spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("v"))

    r1 = StageRunner(io)
    df1 = r1.run("double", make, inputs=[])
    assert df1.count() == 10 and calls["n"] == 1 and r1.computed == ["double"]

    r2 = StageRunner(io)
    df2 = r2.run("double", make, inputs=[])
    assert calls["n"] == 1  # resume: make() not called again
    assert r2.skipped == ["double"]
    assert sorted(t["v"] for t in df2.collect()) == sorted(t["v"] for t in df1.collect())


def test_manifest_records_lineage_and_fingerprint(spark, io):
    r = StageRunner(io)
    a = r.run("a", lambda: spark.range(5).select(F.col("id")), inputs=[])
    r.run("b", lambda: a.select((F.col("id") + 1).alias("id")), inputs=["a"])
    mb = json.loads((Path(io.base) / "_manifests" / "b.json").read_text())
    assert mb["rows"] == 5
    assert mb["inputs"]["a"] == json.loads(
        (Path(io.base) / "_manifests" / "a.json").read_text()
    )["fingerprint"]
    assert sum(mb["partition_rows"]) == 5
    assert mb["schema"].startswith("struct<id")
    # stage metrics: wall clock and materialized footprint
    assert mb["wall_s"] > 0
    assert mb["bytes"] > 0 and mb["files"] >= 1


def test_fingerprint_is_order_insensitive(spark):
    df = spark.range(100).select(F.col("id"))
    shuffled = df.repartition(7)
    assert content_fingerprint(df) == content_fingerprint(shuffled)
    assert content_fingerprint(df) != content_fingerprint(df.filter(F.col("id") < 99))


def test_crash_between_write_and_manifest_reruns(spark, io):
    calls = {"n": 0}

    def make():
        calls["n"] += 1
        return spark.range(3).toDF("id")

    r = StageRunner(io)
    r.run("s", make, inputs=[])
    # simulate crash AFTER table write but BEFORE commit: delete manifest
    (Path(io.base) / "_manifests" / "s.json").unlink()
    StageRunner(io).run("s", make, inputs=[])
    assert calls["n"] == 2  # stage re-ran (manifest is the commit marker)


def test_job_driver_end_to_end_and_resume(spark, tmp_path):
    import jobs.run_pipeline as job

    out = str(tmp_path / "kg_out")
    argv = [
        "--input", "/root/testdata/sf0.001", "--from-events",
        "--output", out, "--chunk-size", "128", "--chunk-overlap", "16",
        "--tokenizer", "ws", "--master", "local[4]",
    ]
    s1 = job.main(argv)
    assert s1["rows"]["nodes"] == 19 and s1["rows"]["edges"] == 161
    assert s1["rows"]["claims"] > 0 and s1["rows"]["community_reports"] >= 1
    assert not s1["skipped"]

    # leveled reports carry the full reference record shape (typing.py:8-18)
    # plus the mixed-context diagnostics
    rep = spark.read.parquet(f"{out}/community_reports")
    assert {
        "id", "community", "title", "summary", "full_content",
        "full_content_json", "rank", "rank_explanation", "findings", "level",
        "human_readable_id", "context_tokens", "exceeds_budget", "n_substituted",
    } <= set(rep.columns)
    assert rep.filter(F.col("level") == 0).count() >= 1
    one = rep.filter(F.col("level") == 0).orderBy("community").first()
    assert json.loads(one.full_content_json)["title"] == one.title
    assert len(one.findings) >= 1 and one.findings[0].summary

    s2 = job.main(argv)  # resume: everything checkpointed
    assert not s2["computed"]
    assert set(s2["skipped"]) == set(s1["computed"])
    assert s2["rows"] == s1["rows"]

    # post-resume bucketed join: nodes came back through the bucket-aware
    # read path, so a merge join against a co-bucketed table needs no
    # Exchange on the nodes side
    io2 = TableIO(spark, base=out)
    nodes_resumed = io2.read_bucketed("nodes")
    probe = nodes_resumed.select("title", "type")
    io2.write_bucketed(probe, "probe_nodes", ["title"], n_buckets=64)
    j = nodes_resumed.hint("merge").join(io2.read_bucketed("probe_nodes"), "title")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan and "Exchange hashpartitioning" not in plan
    spark.sql("DROP TABLE IF EXISTS probe_nodes")


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Both sides bucketed by the join key → the equi-join plan contains
    no Exchange (the co-located-join strategy for node/edge tables)."""
    io = TableIO(spark, base=str(tmp_path / "bwh"))
    nodes = spark.range(1000).select(
        F.concat(F.lit("E"), F.col("id")).alias("title"), (F.col("id") % 7).alias("v")
    )
    degrees = spark.range(1000).select(
        F.concat(F.lit("E"), F.col("id")).alias("title"), (F.col("id") % 5).alias("degree")
    )
    io.write_bucketed(nodes, "bt_nodes", ["title"], n_buckets=8, sort_cols=["title"])
    io.write_bucketed(degrees, "bt_degrees", ["title"], n_buckets=8, sort_cols=["title"])
    try:
        # force sort-merge (the at-scale strategy; broadcast would hide
        # the shuffle question entirely) and assert no shuffle Exchange
        joined = (
            io.read_bucketed("bt_nodes")
            .hint("merge")
            .join(io.read_bucketed("bt_degrees"), "title")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan
        assert joined.count() == 1000
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_nodes")
        spark.sql("DROP TABLE IF EXISTS bt_degrees")


def test_compact_repacks_small_files(spark, tmp_path):
    """A many-file table (streaming-commit shape) compacts to the
    byte-targeted file count with identical contents."""
    from knowledge_graph_spark.io import TableIO

    io = TableIO(spark, base=str(tmp_path / "wh"))
    df = spark.range(10_000).selectExpr("id", "id * 2 AS v").repartition(32)
    io.write(df, "t")
    before = {(r.id, r.v) for r in io.read("t").collect()}
    stats = io.compact("t", target_file_bytes=1 << 30)
    assert stats["files_before"] >= 32
    assert stats["files_after"] == 1
    assert {(r.id, r.v) for r in io.read("t").collect()} == before
