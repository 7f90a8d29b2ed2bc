"""Stage 1 — stable-ordered per-conversation text assembly.

Reference analogue: document loading + the conversation-history fold
(reference verbs/documents/load_documents/run.py:24-60 and
query/system_prompt_builder/history/conversation_history.py:16-66).  A
conversation IS the document; its text is the role-prefixed concatenation of
turns in (turn_idx) order — the per-row invariant the driver verifies
("per-turn text equality under stable turn ordering").

Determinism note: ``collect_list`` observes shuffle order, which Spark does
not guarantee — so we collect ``struct(turn_idx, line)`` and ``array_sort``
before joining.  ``turn_idx`` is unique within a conversation (FIXTURES.md
F1), making the result bit-stable regardless of physical row order (the F5
ordering-invariance fixture).

Scale: one shuffle, keyed on conv_id (the table's natural bucket key — with
an Iceberg table bucketed by conv_id this aggregation is shuffle-free via
storage-partitioned join/agg).  Output rows are ~conversation-sized; callers
repartition by hash(conv_id) before the (wider) extraction stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TURN_SEP = "\n"


def turn_line(role_col, text_col):
    """One rendered turn: ``role: text`` (reference conversation_history
    renders turns as ``{role}: {content}``)."""
    return F.concat(role_col, F.lit(": "), text_col)


def assemble_conversations(transcripts: DataFrame) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, ...) → CONV_DOCS
    (doc_id, conv_id, text, n_turns), one row per conversation."""
    lines = transcripts.select(
        "conv_id",
        F.struct(F.col("turn_idx"), turn_line(F.col("role"), F.col("text")).alias("line")).alias(
            "t"
        ),
    )
    return (
        lines.groupBy("conv_id")
        .agg(
            F.concat_ws(
                TURN_SEP, F.transform(F.array_sort(F.collect_list("t")), lambda s: s["line"])
            ).alias("text"),
            F.count("*").cast("int").alias("n_turns"),
        )
        .select(
            F.sha2(F.col("conv_id"), 256).alias("doc_id"),
            "conv_id",
            "text",
            "n_turns",
        )
    )


def qa_turns(transcripts: DataFrame) -> DataFrame:
    """QA-pair folding of a conversation → (conv_id, qa_idx, user_query,
    answer_text, n_answers), one row per QA turn.

    Reference semantics (conversation_history.py:42-56 ``to_qa_turns``):
    every USER turn opens a QA turn; every subsequent NON-user turn
    (assistant / system / tool — the reference's ``else`` branch takes
    them all) is appended to the open QA turn's answers; turns arriving
    before the first user turn belong to no QA turn and are dropped;
    ``answer_text`` is the '\\n'-join of the answers in turn order
    (QATurn.get_answer_text, typing.py:52-57) and is NULL when a QA turn
    has no answers — exactly the reference's ``None``.

    Spark shape: the fold is a running count of user turns over a
    (conv_id, turn_idx) window — qa_idx — which turns the reference's
    sequential loop into one partitioned window pass plus one conv-keyed
    groupBy; both shuffles key on conv_id, so an input bucketed by
    conv_id takes this stage shuffle-free."""
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_user = F.col("role") == "user"
    t = transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        F.sum(is_user.cast("int")).over(w).cast("int").alias("qa_idx"),
    ).filter(F.col("qa_idx") > 0)
    answers = F.array_sort(
        F.collect_list(F.when(~is_user, F.struct(F.col("turn_idx"), F.col("text"))))
    )
    return t.groupBy("conv_id", "qa_idx").agg(
        F.max(F.when(is_user, F.col("text"))).alias("user_query"),
        F.when(
            F.size(answers) > 0,
            F.array_join(F.transform(answers, lambda s: s["text"]), TURN_SEP),
        ).alias("answer_text"),
        F.count(F.when(~is_user, F.lit(1))).cast("int").alias("n_answers"),
    )


def conversation_context(
    transcripts: DataFrame,
    max_qa_turns: int = 5,
    max_tokens: int = 8000,
) -> DataFrame:
    """Recency-biased, token-budgeted conversation-history context rows →
    (conv_id, rk, content, n_tokens, cum_tokens), rk 1 = most recent.

    Reference semantics (conversation_history.py:67-128 ``build_context``
    with its defaults): fold to QA turns, keep USER queries only
    (include_user_turns_only=True), reverse for recency bias, cap at
    ``max_qa_turns``, then accumulate rows while the running context
    stays within ``max_tokens``.  The reference's budget counts the
    rendered CSV; per the north rule the rendering is replaced by the
    table itself, so the budget here is the running whitespace-token sum
    of the kept contents — the same simplification the local/global
    search context builders use (operators/search.py), and expressible
    verbatim in the SQL oracle.

    Shape: one conv-keyed window for recency rank + one running-sum
    window over at most ``max_qa_turns`` rows per conversation — both
    shuffles on conv_id."""
    qa = qa_turns(transcripts)
    w = Window.partitionBy("conv_id").orderBy(F.desc("qa_idx"))
    recent = (
        qa.select(
            "conv_id",
            "qa_idx",
            F.col("user_query").alias("content"),
            F.row_number().over(w).cast("int").alias("rk"),
        )
        .filter(F.col("rk") <= max_qa_turns)
        .withColumn(
            "n_tokens",
            F.size(F.filter(F.split("content", r"\s+"), lambda t: t != F.lit(""))).cast(
                "int"
            ),
        )
    )
    wc = (
        Window.partitionBy("conv_id")
        .orderBy("rk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        recent.withColumn("cum_tokens", F.sum("n_tokens").over(wc).cast("int"))
        .filter(F.col("cum_tokens") <= max_tokens)
        .select("conv_id", "rk", "content", "n_tokens", "cum_tokens")
    )


def last_user_turns(transcripts: DataFrame, k: int = 1) -> DataFrame:
    """Last ``k`` user turns per conversation, most recent first →
    (conv_id, recency, text) with recency 1 = latest.

    Reference semantics (conversation_history.py:58-66
    ``get_user_turns(max_user_turns)``): walk the history backwards,
    keep user-role contents only, stop after ``k``.  One filtered
    conv-keyed window (WindowGroupLimit pushes the rank filter into the
    sort, so no full per-conversation materialization)."""
    w = Window.partitionBy("conv_id").orderBy(F.desc("turn_idx"))
    return (
        transcripts.filter(F.col("role") == "user")
        .select(
            "conv_id",
            F.row_number().over(w).cast("int").alias("recency"),
            "text",
        )
        .filter(F.col("recency") <= k)
    )


def topic_segments(
    transcripts: DataFrame, jac_num: int = 1, jac_den: int = 4
) -> DataFrame:
    """Lexical topic segmentation of each conversation → (conv_id,
    turn_idx, is_boundary, seg_id): a turn opens a new segment when its
    distinct-token set overlaps the PREVIOUS turn's below jac_num/jac_den
    Jaccard — TextTiling's boundary rule (Hearst 1997) at turn
    granularity, with the threshold compared as exact integers
    (inter * jac_den < union * jac_num; no float Jaccard anywhere).

    Read-model use: long agent sessions drift across topics; retrieval
    and summarization want segment-scoped context, not whole-
    conversation context (the reference's conversation_history folds the
    WHOLE history — qa_turns/conversation_context mirror that; this is
    the finer unit).  A conversation's first turn is always a boundary;
    an empty turn adjacent to a non-empty one is a boundary (overlap 0),
    while two consecutive empty turns share a segment (union 0 → the
    strict inequality fails).

    Scale shape: token sets are row-local native arrays (array_distinct
    over the whitespace split — bounded by turn length); the lag and the
    running boundary count are both conv-keyed windows, so no global
    exchange; output cardinality == input turns.
    """
    from ..functions.textqc import normalized_text, ws_tokens_col

    toks = F.array_distinct(ws_tokens_col(normalized_text(F.col("text"))))
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = transcripts.select("conv_id", "turn_idx", toks.alias("tk"))
    t = t.withColumn("pk", F.lag("tk").over(w))
    inter = F.size(F.array_intersect("tk", "pk"))
    uni = F.size("tk") + F.size("pk") - inter
    boundary = F.when(F.col("pk").isNull(), F.lit(True)).otherwise(
        inter * F.lit(jac_den) < uni * F.lit(jac_num)
    )
    t = t.withColumn("is_boundary", boundary)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return t.select(
        "conv_id",
        "turn_idx",
        "is_boundary",
        F.sum(F.col("is_boundary").cast("int")).over(wrun).cast("int").alias("seg_id"),
    )


TEXTRANK_ITER = 5


def _textrank_arrow_fn(iterations: int, scale: int, d_num: int, d_den: int):
    """Per-conversation dense TextRank kernel for ``applyInPandas``.

    Bit-identical to the relational ``grouped_pagerank`` loop: the shared
    distinct-token count matrix S plays the symmetric edge weights, and
    every round applies the SAME int64 arithmetic — per-edge
    ``(rank_u · d_num · S_uv) DIV (d_den · outw_u)`` floor-divisions
    summed per target, plus the per-group teleport base.  The matmul that
    builds S runs in float64, exact because entries are counts < 2^53;
    all PageRank arithmetic is int64 with the same overflow bound as the
    relational kernel (rank·d_num·w < 2^63)."""

    def fn(key, nodes_pdf, toks_pdf):
        import numpy as np
        import pandas as pd

        n = np.sort(nodes_pdf["node"].unique()).astype(np.int64)
        t = len(n)
        if t == 0:
            return pd.DataFrame(
                {
                    "conv_id": pd.Series([], dtype=object),
                    "turn_idx": pd.Series([], dtype=np.int32),
                    "rank_scaled": pd.Series([], dtype=np.int64),
                }
            )
        if len(toks_pdf):
            codes, uniques = pd.factorize(toks_pdf["tok"])
            pos = pd.Series(np.arange(t), index=n)
            rows = pos.loc[toks_pdf["i"].to_numpy(dtype=np.int64)].to_numpy()
            m = np.zeros((t, len(uniques)), dtype=np.float64)
            m[rows, codes] = 1.0
            s = (m @ m.T).astype(np.int64)
            np.fill_diagonal(s, 0)
        else:
            s = np.zeros((t, t), dtype=np.int64)
        outw = s.sum(axis=1)
        denom = np.maximum(d_den * outw, 1)  # outw==0 rows are all-zero anyway
        rank = np.full(t, scale // t, dtype=np.int64)
        base = (scale * (d_den - d_num)) // (d_den * t)
        for _ in range(iterations):
            contrib = (rank[:, None] * d_num * s) // denom[:, None]
            rank = base + contrib.sum(axis=0)
        return pd.DataFrame(
            {
                "conv_id": key[0],
                "turn_idx": n.astype(np.int32),
                "rank_scaled": rank,
            }
        )

    return fn


def textrank_turns(
    transcripts: DataFrame,
    iterations: int = TEXTRANK_ITER,
    kernel: str = "arrow",
) -> DataFrame:
    """TextRank at turn granularity (Mihalcea & Tarau 2004) →
    (conv_id, turn_idx, rank_scaled): rank each conversation's turns by
    centrality in the within-conversation similarity graph.

    Nodes are turns; the edge weight between two turns is the size of
    their shared distinct-token set (the same tokenization as
    ``topic_segments``); ranking is per-conversation fixed-round integer
    PageRank, so every value is exact int64 and an unrolled-CTE oracle
    reproduces it bit-for-bit.

    This is the centrality complement of ``conversation_context``'s
    recency bias: instead of keeping the most recent turns under a token
    budget, keep the turns the rest of the conversation keeps referring
    to — extractive summarization of a transcript for context assembly
    (the reference's history builder truncates by recency only:
    query/system_prompt_builder/history/conversation_history.py).

    Two bit-identical kernels (pytest-asserted equal; the driver's hash
    gate runs the default):

    - ``kernel="arrow"`` (default): ONE shuffle — the exploded token
      table cogrouped with the node list by conv_id — then the pair
      matrix and all PageRank rounds run dense per group inside
      ``applyInPandas``.  Right when groups are bounded (a conversation's
      turn count is a product property, not a corpus property): the
      2→8-core probe measured the relational loop at 0.45 efficiency —
      5 rounds × (join + groupBy) shuffles saturate one host's disk —
      while this path is CPU-bound and conversation-parallel.  Dense
      T×T per group: keep for T ≲ a few thousand.
    - ``kernel="relational"``: candidate pairs from an equi-join on
      (conv_id, token) — never a cross join — feeding
      ``graphops.grouped_pagerank`` (all stages conversation-parallel
      shuffles).  The unbounded-group fallback, and the shape the SQL
      oracle mirrors.

    Isolated turns (no shared token with any other turn) keep pure
    teleport mass in both kernels.
    """
    from ..functions.textqc import normalized_text, ws_tokens_col
    from .graphops import PR_DAMP_DEN, PR_DAMP_NUM, PR_SCALE, grouped_pagerank

    toks = transcripts.select(
        "conv_id",
        F.col("turn_idx").alias("i"),
        F.explode(
            F.array_distinct(ws_tokens_col(normalized_text(F.col("text"))))
        ).alias("tok"),
    )
    if kernel == "arrow":
        nodes = transcripts.select("conv_id", F.col("turn_idx").alias("node"))
        return (
            nodes.groupBy("conv_id")
            .cogroup(toks.groupBy("conv_id"))
            .applyInPandas(
                _textrank_arrow_fn(iterations, PR_SCALE, PR_DAMP_NUM, PR_DAMP_DEN),
                "conv_id string, turn_idx int, rank_scaled long",
            )
        )
    right = toks.select("conv_id", F.col("i").alias("j"), "tok")
    pairs = (
        toks.join(right, ["conv_id", "tok"])
        .filter(F.col("i") < F.col("j"))
        .groupBy("conv_id", "i", "j")
        .agg(F.count("*").cast("bigint").alias("w"))
    )
    sym = pairs.unionByName(
        pairs.select("conv_id", F.col("j").alias("i"), F.col("i").alias("j"), "w")
    )
    nodes = transcripts.select("conv_id", F.col("turn_idx").alias("node"))
    ranks = grouped_pagerank(
        sym.select("conv_id", F.col("i").alias("u"), F.col("j").alias("v"), "w"),
        nodes,
        group_col="conv_id",
        node_col="node",
        weight_col="w",
        iterations=iterations,
    )
    return ranks.select("conv_id", F.col("node").alias("turn_idx"), "rank_scaled")
