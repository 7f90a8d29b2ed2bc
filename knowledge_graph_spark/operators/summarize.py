"""Description summarization (reference D1-D2, SURVEY.md §2.5).

Reference analogues:
- D1 per-item summarize (reference verbs/entities/summarization/
  description_summarize.py:22-60): for every node/edge, sort+dedup the
  newline-joined descriptions; 0 → "", 1 → itself, else summarize.
- D2 token-budget fold (reference graph/summarization/
  graph_summarization.py:68-98, max_input_tokens=4000): greedily pack
  sorted descriptions into the budget before summarizing.

The summarizer is a swappable backend.  The deterministic default renders
``{title}: {desc1}; {desc2}; ...`` over the packed prefix — closed-form,
so the whole stage is native Column algebra and ANSI-SQL mirrorable.  An
LLM backend would replace ``_render`` with a batched mapInPandas call
(the reference's asyncio.gather+Semaphore(4) concurrency is subsumed by
partition parallelism).

Scale: narrow projection over the (already merged) node/edge tables — no
shuffle; the greedy prefix scan is O(n²) in descriptions-per-item, which
the merge stage has already bounded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_INPUT_TOKENS = 4000  # reference graph_summarization.py:13-15


def _ws_count(col: Column) -> Column:
    return F.size(F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != F.lit("")))


def packed_descriptions(descs: Column, max_tokens: int) -> Column:
    """D2: longest prefix of the sorted description array whose joined
    whitespace-token count stays within budget (always ≥ 1 element so a
    single oversized description still summarizes, like the reference's
    first-iteration behavior)."""
    fits = F.filter(
        F.sequence(F.lit(1), F.size(descs)),
        lambda i: _ws_count(F.concat_ws(" ", F.slice(descs, 1, i))) <= F.lit(max_tokens),
    )
    cut = F.greatest(F.size(fits), F.lit(1))
    return F.slice(descs, 1, cut)


def summarize_descriptions(
    df: DataFrame,
    title_col: str = "title",
    desc_col: str = "description",
    max_input_tokens: int = MAX_INPUT_TOKENS,
) -> DataFrame:
    """Adds ``summary``: D1 dispatch over the newline-joined description
    column produced by the merge stages (already sorted-distinct)."""
    descs = F.filter(F.split(F.col(desc_col), "\n"), lambda d: d != F.lit(""))
    packed = packed_descriptions(descs, max_input_tokens)
    summary = (
        F.when(F.size(descs) == 0, F.lit(""))
        .when(F.size(descs) == 1, F.element_at(descs, 1))
        .otherwise(F.concat(F.col(title_col), F.lit(": "), F.concat_ws("; ", packed)))
    )
    return df.withColumn("summary", summary)
