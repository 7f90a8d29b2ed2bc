"""Benchmark decontamination: flag corpus documents whose token n-grams
collide with a held-out evaluation set.

Training corpora must be scrubbed of benchmark text before a model is
trained on them (the reference repo has no such stage — this is one of
the training-data operators the engine adds as first class).  The
standard recipe (GPT-3 appendix C / PaLM / Llama style) is n-gram
collision: a document is contaminated when enough of its n-grams appear
verbatim in any benchmark prompt/answer.

Scale shape (the part that matters at 100 TB):

- The corpus side is the big side: explode DISTINCT n-grams per doc
  (same inverted-index primitive as ngram dedup — `dedup.token_ngrams`).
- The eval side is tiny by construction (benchmarks are MBs, corpora are
  TBs): its distinct-gram index is built once and **broadcast**, so the
  probe is a map-side hash join fused into the corpus scan — no shuffle
  of the corpus gram table at all.  The only shuffle is the final
  per-doc groupBy, whose partial aggregation collapses each doc's hits
  map-side.  Set ``broadcast_index=False`` to fall back to a shuffled
  join if an unusually large eval set exceeds the broadcast budget.
- Output is integers plus a floor'd micro-fraction, so the DuckDB oracle
  matches bit-for-bit (IEEE division of small exact ints is identical on
  both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..partitioning import widen
from .dedup import token_ngrams

MICRO = 1_000_000


def eval_ngram_index(
    evalset: DataFrame, text_col: str = "text", n: int = 8
) -> DataFrame:
    """Distinct n-gram index of the evaluation set: one column ``gram``."""
    return (
        evalset.select(F.explode(token_ngrams(F.col(text_col), n)).alias("gram"))
        .distinct()
    )


def contamination_profile(
    docs: DataFrame,
    evalset: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
    n: int = 8,
    threshold: float = 0.1,
    broadcast_index: bool = True,
) -> DataFrame:
    """Per-document contamination: (doc_id, n_grams, n_hit, contam_micro,
    is_contaminated).

    ``n_grams`` counts the doc's DISTINCT n-grams, ``n_hit`` how many of
    those occur anywhere in the eval set, ``contam_micro`` =
    floor(1e6 * n_hit / n_grams).  Docs with fewer than ``n`` tokens have
    zero grams and are reported clean (nothing to collide)."""
    index = eval_ngram_index(evalset, text_col=eval_text_col, n=n)
    if broadcast_index:
        index = F.broadcast(index)
    grams = widen(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(F.array_distinct(token_ngrams(F.col(text_col), n))).alias(
            "gram"
        ),
    )
    hits = grams.join(
        index.withColumn("_hit", F.lit(1)), "gram", "left"
    )
    prof = hits.groupBy("doc_id").agg(
        F.count("gram").cast("bigint").alias("n_grams"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("bigint").alias("n_hit"),
    )
    frac = F.when(F.col("n_grams") == 0, F.lit(0.0)).otherwise(
        F.col("n_hit").cast("double") * MICRO / F.col("n_grams").cast("double")
    )
    return prof.select(
        "doc_id",
        "n_grams",
        "n_hit",
        F.floor(frac).cast("bigint").alias("contam_micro"),
        (F.floor(frac) >= int(threshold * MICRO)).alias("is_contaminated"),
    )


def contamination_profile_bloom(
    docs: DataFrame,
    evalset: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
    n: int = 8,
    threshold: float = 0.1,
    bits: int | None = None,
    k: int | None = None,
) -> DataFrame:
    """``contamination_profile`` for the BIG-evalset regime: identical
    output, different physical plan.

    When the reference key set is itself too large to broadcast exactly
    (a billion-gram blocklist, a prior snapshot's fingerprints), its
    exact index must sit on the shuffled side of the verify join — so the
    win is pruning the corpus grams BEFORE that shuffle.  The eval side's
    Bloom bitmap (bits/8 bytes regardless of key count) broadcasts in
    place of the index; the probe is map-side (operators/bloom.py) and
    only bloom-positive grams — true hits plus the ~(1+k·n/bits)^-k FPR
    sliver — enter the shuffle.  Bloom has no false negatives, so the
    exact verify join restores the precise hit set: output is
    bit-identical to ``contamination_profile`` (the gate reuses that
    oracle verbatim).

    Two passes over the gram explode (n_grams needs ALL grams, hits only
    survivors) — both map-side until their final partial-agg shuffles,
    cheaper at scale than shuffling every gram to the verify join."""
    from .bloom import BLOOM_BITS, BLOOM_K, bloom_build, bloom_probe

    bits = bits or BLOOM_BITS
    k = k or BLOOM_K
    index = eval_ngram_index(evalset, text_col=eval_text_col, n=n)
    bloom = bloom_build(index, "gram", bits=bits, k=k)
    grams = widen(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(F.array_distinct(token_ngrams(F.col(text_col), n))).alias(
            "gram"
        ),
    )
    base = grams.groupBy("doc_id").agg(
        F.count("gram").cast("bigint").alias("n_grams")
    )
    survivors = (
        bloom_probe(grams.filter(F.col("gram").isNotNull()), "gram", bloom, bits, k)
        .filter(F.col("bloom_maybe"))
        .drop("bloom_maybe")
    )
    hits = (
        survivors.join(index, "gram")
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_hit"))
    )
    prof = base.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        F.coalesce(F.col("n_hit"), F.lit(0)).cast("bigint").alias("n_hit"),
    )
    frac = F.when(F.col("n_grams") == 0, F.lit(0.0)).otherwise(
        F.col("n_hit").cast("double") * MICRO / F.col("n_grams").cast("double")
    )
    return prof.select(
        "doc_id",
        "n_grams",
        "n_hit",
        F.floor(frac).cast("bigint").alias("contam_micro"),
        (F.floor(frac) >= int(threshold * MICRO)).alias("is_contaminated"),
    )


def contamination_pairs(
    docs: DataFrame,
    evalset: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "eval_id",
    eval_text_col: str = "text",
    n: int = 8,
    min_hits: int = 1,
    broadcast_index: bool = True,
) -> DataFrame:
    """Traceability view: (doc_id, eval_id, n_hit) — which benchmark item
    each contaminated document collides with, for audit trails.  Same
    broadcast-probe shape; the eval index here keeps its item id."""
    index = evalset.select(
        F.col(eval_id_col).alias("eval_id"),
        F.explode(F.array_distinct(token_ngrams(F.col(eval_text_col), n))).alias(
            "gram"
        ),
    )
    if broadcast_index:
        index = F.broadcast(index)
    grams = widen(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(token_ngrams(F.col(text_col), n))).alias("gram"),
    )
    return (
        grams.join(index, "gram")
        .groupBy("doc_id", "eval_id")
        .agg(F.count("*").cast("bigint").alias("n_hit"))
        .filter(F.col("n_hit") >= min_hits)
    )
