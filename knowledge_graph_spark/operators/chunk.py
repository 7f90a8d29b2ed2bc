"""Stage 2 — token-window chunking (document → text units).

Reference analogue: the token splitter C1/C2 (reference
verbs/text_units/split_texts/run.py:12-33 and
text/chunk/strategies/tokens.py:28-62): a token stream per document, windows
of ``size`` tokens stepping ``size - overlap``; the final window may be
short; defaults 1200/100 (reference config.py:17-19).

Implementation: one Arrow-vectorized pandas UDF producing
``array<struct<chunk_idx,chunk,n_tokens>>`` followed by ``explode`` —
the UDTF pattern.  Chunk text is the space-join of its tokens, which under
the whitespace tokenizer makes the stage reproducible in ANSI SQL
(list slicing over ``regexp_split_to_array``) for the DuckDB oracle.

Chunk ids are content-addressed: sha2(doc_id || ':' || chunk_idx) — the
reference's uuid4-per-chunk (utils/uuid.py:11-15) is nondeterministic and
breaks resume/idempotency at scale, so ids must be derivable.

Scale: narrow transformation — no shuffle.  Each conversation-document maps
independently; Arrow batch size bounds peak memory per task.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokens import get_tokenizer

DEFAULT_CHUNK_SIZE = 1200  # reference config.py:17
DEFAULT_OVERLAP = 100  # reference config.py:18


def chunk_windows(tokens: list[str], size: int, overlap: int) -> list[tuple[int, str, int]]:
    """Pure window kernel shared by the UDF and unit tests."""
    step = size - overlap
    if step <= 0:
        raise ValueError("chunk size must exceed overlap")
    out = []
    n = len(tokens)
    start = 0
    idx = 0
    while start < n:
        window = tokens[start : start + size]
        out.append((idx, " ".join(window), len(window)))
        start += step
        idx += 1
    return out


def make_chunk_udf(size: int, overlap: int, tokenizer: str = "auto"):
    tok = get_tokenizer(tokenizer)

    @F.pandas_udf("array<struct<chunk_idx:int,chunk:string,n_tokens:int>>")
    def chunk_udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: chunk_windows(tok(t), size, overlap) if t else [])

    return chunk_udf


def split_text_units(
    conv_docs: DataFrame,
    size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_OVERLAP,
    tokenizer: str = "auto",
) -> DataFrame:
    """CONV_DOCS → TEXT_UNITS (id, doc_id, conv_id, chunk_idx, chunk, n_tokens)."""
    chunk_udf = make_chunk_udf(size, overlap, tokenizer)
    return (
        conv_docs.select(
            "doc_id", "conv_id", F.explode(chunk_udf(F.col("text"))).alias("c")
        )
        .select(
            F.sha2(F.concat_ws(":", F.col("doc_id"), F.col("c.chunk_idx")), 256).alias("id"),
            "doc_id",
            "conv_id",
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.col("c.chunk").alias("chunk"),
            F.col("c.n_tokens").alias("n_tokens"),
        )
    )


# Sentence segmentation: maximal runs of non-terminators plus their
# trailing terminators.  Deliberately lookaround-free so the IDENTICAL
# pattern runs under Java regex (Spark) and RE2 (DuckDB oracle).
SENTENCE_RE = r"[^.!?]+[.!?]*"


def split_sentence_units(conv_docs: DataFrame) -> DataFrame:
    """C3 sentence chunker (reference text/chunk/strategies/sentence.py:
    10-20 — one TextChunk per nltk.sent_tokenize sentence).  nltk is
    absent in this environment, so segmentation is a deterministic
    punctuation-run regex behind the same output shape as
    ``split_text_units``; a model-based segmenter would plug into the
    tokenizer seam (functions/tokens.py) instead.

    Pure Column algebra — regexp_extract_all + posexplode, no UDF, no
    shuffle."""
    sentences = F.regexp_extract_all(F.col("text"), F.lit(SENTENCE_RE), F.lit(0))
    ws_tokens = F.filter(F.split(F.col("chunk"), r"\s+"), lambda x: x != "")
    return (
        conv_docs.select(
            "doc_id", "conv_id", F.posexplode(sentences).alias("chunk_idx", "s")
        )
        .withColumn("chunk", F.trim("s"))
        .filter(F.col("chunk") != "")
        .select(
            F.sha2(F.concat_ws(":", F.col("doc_id"), F.col("chunk_idx")), 256).alias("id"),
            "doc_id",
            "conv_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            "chunk",
            F.size(ws_tokens).cast("int").alias("n_tokens"),
        )
    )
