"""Trained character-n-gram language identification (Cavnar-Trenkle).

``functions.textqc.lang_id`` is the zero-shot stopword heuristic; this
module is the TRAINED variant of the classic text-categorization scheme
(Cavnar & Trenkle 1994, "N-Gram-Based Text Categorization"): build a
per-language character-trigram frequency profile from labelled
documents, then classify unseen text by rank-weighted profile overlap.
The reference repo has no language stage at all; a multilingual
training-data pipeline needs one before every per-language operator here
(``corpus.weighted_sample`` rates, ``ccnet_buckets``, ``stratum_cap``),
and the train/apply split also exercises the model-table pattern
(small trained artifact, broadcast at apply time) end to end.

Everything is integer-exact so the DuckDB oracle matches bit-for-bit:
trigram extraction is position-enumerated ``substring`` over the
lowercased text (no regex, no locale), profile weight is the integer
rank complement ``top_p + 1 - rk``, and the prediction is an argmax
with (score DESC, lang ASC) total order.

Scale shape: profile training is one (lang, gram) groupBy — map-side
combinable, output bounded by |langs| x |distinct trigrams| — followed
by a per-language top-p window (WindowGroupLimit pre-prunes map-side).
The trained profile is |langs| x top_p rows — broadcast at apply time,
so classification is scan -> explode -> broadcast-join -> (doc, lang)
groupBy; the final argmax window is partitioned by doc_id with at most
|langs| rows per partition.  No step concentrates on a single task at
any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

PROFILE_TOP = 64


def char_trigrams(text: Column) -> Column:
    """All character trigrams of lower(text), in position order
    (empty array when the text is shorter than 3 chars)."""
    t = F.lower(text)
    return F.when(
        F.length(t) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - 2),
            lambda i: F.substring(t, i, F.lit(3)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def train_language_profiles(
    docs: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    top_p: int = PROFILE_TOP,
) -> DataFrame:
    """Per-language trigram profile -> (lang, gram, cnt, rk, w).

    ``cnt`` counts every occurrence (not per-document presence) across
    the training corpus; the profile keeps each language's ``top_p``
    most frequent trigrams, ranked (cnt DESC, gram ASC), with integer
    weight ``w = top_p + 1 - rk`` (Cavnar-Trenkle's rank profile with a
    linear out-of-place kernel)."""
    g = docs.select(
        F.col(lang_col).alias("lang"),
        F.explode(char_trigrams(F.col(text_col))).alias("gram"),
    )
    prof = g.groupBy("lang", "gram").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), "gram")
    return (
        prof.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= top_p)
        .withColumn("w", (F.lit(top_p + 1) - F.col("rk")).cast("bigint"))
    )


def langid_predict(
    docs: DataFrame,
    profiles: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Classify each document against the trained profiles ->
    (doc_id, lang, pred_lang, score, n_hits, correct).

    Score per candidate language = sum of profile weights over the
    document's DISTINCT trigrams that hit that language's profile;
    prediction = argmax (score DESC, lang ASC).  Documents with zero
    profile overlap are kept with pred_lang='' / score 0 so the output
    covers every input row (accuracy is read straight off ``correct``).
    """
    dg = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(lang_col).alias("lang"),
        F.explode(char_trigrams(F.col(text_col))).alias("gram"),
    ).distinct()
    hits = dg.join(
        F.broadcast(
            profiles.select(F.col("lang").alias("cand_lang"), "gram", "w")
        ),
        "gram",
    )
    sc = hits.groupBy("doc_id", "cand_lang").agg(
        F.sum("w").alias("score"), F.count("*").alias("n_hits")
    )
    win = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "cand_lang")
    best = (
        sc.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("cand_lang").alias("pred_lang"),
            "score",
            "n_hits",
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.col(lang_col).alias("lang"))
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce("pred_lang", F.lit("")).alias("pred_lang"),
            F.coalesce("score", F.lit(0)).cast("bigint").alias("score"),
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            (F.coalesce("pred_lang", F.lit("")) == F.col("lang"))
            .cast("int")
            .alias("correct"),
        )
    )
