"""Corpus training-data job driver e2e + resume (jobs/run_corpus_pipeline.py)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_corpus_job_end_to_end_and_resume(spark, tmp_path):
    import jobs.run_corpus_pipeline as job

    out = str(tmp_path / "corpus_out")
    argv = [
        "--input", "/root/testdata/sf0.001",
        "--output", out, "--master", "local[4]",
        "--compact-target-mb", "64",
        "--dsir-target-mod", "13", "--dsir-keep-k", "50",
    ]
    s1 = job.main(argv)
    assert s1["rows"]["documents"] == 500
    assert not s1["skipped"]
    # export compacted to the byte-targeted file count; content-based
    # manifest fingerprints mean the rewrite cannot invalidate resume
    assert s1["compaction"]["files_after"] == 1
    # dedup resolution must have dropped the near-duplicate cluster members
    assert 0 < s1["rows"]["kept"] < 500

    corpus = spark.read.parquet(f"{out}/corpus_filtered")
    assert {"doc_id", "text", "n_pii", "n_tokens", "lang", "quality"} <= set(corpus.columns)
    # every kept doc passes the filters
    assert corpus.filter(F.col("quality") < 0.3).count() == 0
    assert corpus.filter(F.col("n_tokens") < 10).count() == 0
    # no kept doc is a duplicate cluster member
    res = spark.read.parquet(f"{out}/dedup_resolution")
    dupes = {r.doc_id for r in res.filter(F.col("is_duplicate")).collect()}
    kept = {r.doc_id for r in corpus.select("doc_id").collect()}
    assert not (kept & dupes)

    # split assignment covers exactly the kept corpus; every doc labeled
    assert sum(s1["rows"]["split"].values()) == s1["rows"]["kept"]
    assert set(s1["rows"]["split"]) <= {"train", "val", "test"}
    split = spark.read.parquet(f"{out}/corpus_split")
    assert {r.doc_id for r in split.select("doc_id").collect()} == kept
    # length stats: one row per language present in the kept corpus
    stats = spark.read.parquet(f"{out}/length_stats")
    langs = {r.lang for r in corpus.select("lang").distinct().collect()}
    assert {r.lang for r in stats.collect()} == langs
    assert stats.filter(F.col("p50") > F.col("max_tokens")).count() == 0

    # audit provenance: kept flag is IDENTICAL to export membership, and
    # every dropped doc carries at least one reason
    audit = spark.read.parquet(f"{out}/corpus_audit")
    assert audit.count() == 500
    assert {r.doc_id for r in audit.filter(F.col("kept")).collect()} == kept
    assert audit.filter(~F.col("kept") & (F.col("reasons") == "")).count() == 0
    # DSIR side table: scores for every doc, exactly keep_k selected
    dsir = spark.read.parquet(f"{out}/dsir_scores")
    assert dsir.count() == 500
    assert dsir.filter(F.col("selected")).count() == 50

    # mergeable corpus-accounting sketches over the kept text
    sk = spark.read.parquet(f"{out}/token_sketch")
    assert sk.count() == 1 and s1["rows"]["distinct_tokens_est"] > 0
    cms = spark.read.parquet(f"{out}/token_cms")
    assert cms.count() > 0
    assert cms.filter(F.col("est_cnt") < F.col("true_cnt")).count() == 0

    s2 = job.main(argv)  # resume: everything checkpointed
    assert not s2["computed"]
    assert set(s2["skipped"]) == set(s1["computed"])
    assert s2["rows"] == s1["rows"]
    assert "compaction" not in s2  # nothing recomputed -> nothing to repack


def test_corpus_job_decontamination_drops_flagged_docs(spark, tmp_path):
    import jobs.run_corpus_pipeline as job

    # benchmark set = verbatim prefixes of a few corpus docs
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    evalset = (
        docs.filter(F.col("doc_id") % 50 == 0)
        .select(
            F.col("doc_id").alias("eval_id"),
            F.concat_ws(
                " ", F.slice(F.split(F.trim("text"), r"\s+"), 1, 30)
            ).alias("text"),
        )
    )
    eval_path = str(tmp_path / "evalset.parquet")
    evalset.write.parquet(eval_path)

    out = str(tmp_path / "corpus_decontam")
    s = job.main(
        [
            "--input", "/root/testdata/sf0.001",
            "--output", out, "--master", "local[4]",
            "--eval-set", eval_path,
            "--max-span-rep-frac", "0.99",
        ]
    )
    assert s["rows"]["contaminated"] > 0
    contam = spark.read.parquet(f"{out}/decontam")
    flagged = {r.doc_id for r in contam.filter(F.col("is_contaminated")).collect()}
    kept = {
        r.doc_id
        for r in spark.read.parquet(f"{out}/corpus_filtered").select("doc_id").collect()
    }
    assert flagged and not (kept & flagged)
    # the seed docs themselves are flagged (their prefix is in the eval set)
    seeds = {r.doc_id for r in docs.filter(F.col("doc_id") % 50 == 0).collect()}
    assert seeds & flagged

    # --decontam-bloom (big-evalset regime) must produce the IDENTICAL
    # decontam table (no false negatives + exact verify), and
    # --max-per-stratum must cap each language at k before the split
    out_b = str(tmp_path / "corpus_bloom")
    sb = job.main(
        [
            "--input", "/root/testdata/sf0.001",
            "--output", out_b, "--master", "local[4]",
            "--eval-set", eval_path,
            "--max-span-rep-frac", "0.99",
            "--decontam-bloom",
            "--max-per-stratum", "5",
        ]
    )
    exact_rows = sorted(map(tuple, spark.read.parquet(f"{out}/decontam").collect()))
    bloom_rows = sorted(map(tuple, spark.read.parquet(f"{out_b}/decontam").collect()))
    assert exact_rows == bloom_rows
    capped = spark.read.parquet(f"{out_b}/corpus_capped")
    per_lang = capped.groupBy("lang").agg(F.count("*").alias("n")).collect()
    assert all(r["n"] <= 5 for r in per_lang)
    # downstream split covers exactly the capped corpus
    assert sum(sb["rows"]["split"].values()) == capped.count()
