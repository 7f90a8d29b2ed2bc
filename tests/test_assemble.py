"""Stable-ordered assembly (the per-row invariant): role-prefixed turn lines
joined in turn_idx order, independent of physical row order (F5)."""

from pyspark.sql import functions as F

from knowledge_graph_spark.operators.assemble import assemble_conversations
from knowledge_graph_spark.synth import synth_transcripts

ROWS = [
    ("c1", 2, "assistant", "third", "", None),
    ("c1", 0, "user", "first", "", None),
    ("c2", 0, "user", "solo", "", None),
    ("c1", 1, "tool", "second", "search", None),
]
SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def test_turn_order_is_turn_idx(spark):
    docs = assemble_conversations(spark.createDataFrame(ROWS, SCHEMA))
    by_conv = {r.conv_id: r for r in docs.collect()}
    assert by_conv["c1"].text == "user: first\ntool: second\nassistant: third"
    assert by_conv["c1"].n_turns == 3
    assert by_conv["c2"].text == "user: solo"


def test_ordering_invariance_under_shuffle(spark):
    """F5: shuffled physical order across many partitions → identical output."""
    t = synth_transcripts(spark, n_convs=10, base_turns=12)
    shuffled = t.orderBy(F.xxhash64("text", "turn_idx")).repartition(7)
    a = {(r.conv_id, r.text) for r in assemble_conversations(t).collect()}
    b = {(r.conv_id, r.text) for r in assemble_conversations(shuffled).collect()}
    assert a == b


def test_ts_ties_broken_by_turn_idx(spark):
    """synth plants duplicate-ts turns; assembly must follow turn_idx."""
    t = synth_transcripts(spark, n_convs=3, base_turns=10)
    dup = (
        t.groupBy("conv_id", "ts").count().filter(F.col("count") > 1).count()
    )
    assert dup > 0  # fixture really exercises the tie
    docs = assemble_conversations(t).collect()
    for d in docs:
        steps = [
            int(line.rsplit(" ", 1)[-1])
            for line in d.text.split("\n")
            if " at step " in line
        ]
        assert steps == sorted(steps)


def test_doc_id_deterministic(spark):
    t = synth_transcripts(spark, n_convs=2, base_turns=4)
    a = {r.doc_id for r in assemble_conversations(t).collect()}
    b = {r.doc_id for r in assemble_conversations(t).collect()}
    assert a == b and len(a) == 2


# ---------------------------------------------------------------------------
# QA folding + last-K user turns (reference conversation_history.py:42-66)
# ---------------------------------------------------------------------------

QA_ROWS = [
    # system turn BEFORE any user turn → belongs to no QA turn (dropped)
    ("q1", 0, "system", "preamble", "", None),
    ("q1", 1, "user", "ask one", "", None),
    ("q1", 2, "assistant", "ans a", "", None),
    ("q1", 3, "tool", "ans b", "search", None),
    ("q1", 4, "user", "ask two", "", None),  # QA turn with NO answers
    ("q2", 0, "user", "only question", "", None),
    ("q2", 1, "assistant", "only answer", "", None),
]


def _qa(spark):
    from knowledge_graph_spark.operators.assemble import qa_turns

    df = spark.createDataFrame(QA_ROWS, SCHEMA)
    return {
        (r.conv_id, r.qa_idx): (r.user_query, r.answer_text, r.n_answers)
        for r in qa_turns(df).collect()
    }


def test_qa_fold_semantics(spark):
    got = _qa(spark)
    # pre-user turns dropped; non-user turns '\n'-joined in turn order
    assert got[("q1", 1)] == ("ask one", "ans a\nans b", 2)
    # open QA turn with no answers → answer_text is NULL (reference None)
    assert got[("q1", 2)] == ("ask two", None, 0)
    assert got[("q2", 1)] == ("only question", "only answer", 1)
    assert set(got) == {("q1", 1), ("q1", 2), ("q2", 1)}


def test_last_user_turns(spark):
    from knowledge_graph_spark.operators.assemble import last_user_turns

    df = spark.createDataFrame(QA_ROWS, SCHEMA)
    got = {
        (r.conv_id, r.recency): r.text for r in last_user_turns(df, k=2).collect()
    }
    # most recent first; non-user roles never counted
    assert got == {
        ("q1", 1): "ask two",
        ("q1", 2): "ask one",
        ("q2", 1): "only question",
    }
    one = {
        (r.conv_id, r.recency): r.text for r in last_user_turns(df, k=1).collect()
    }
    assert one == {("q1", 1): "ask two", ("q2", 1): "only question"}


def test_conversation_context_budget(spark):
    from knowledge_graph_spark.operators.assemble import conversation_context

    df = spark.createDataFrame(QA_ROWS, SCHEMA)
    # budget 4 tokens: most recent q1 query "ask two" (2 tokens) fits,
    # adding "ask one" (2 tokens) still fits at cum 4
    got = {
        (r.conv_id, r.rk): (r.content, r.n_tokens, r.cum_tokens)
        for r in conversation_context(df, max_qa_turns=5, max_tokens=4).collect()
    }
    assert got == {
        ("q1", 1): ("ask two", 2, 2),
        ("q1", 2): ("ask one", 2, 4),
        ("q2", 1): ("only question", 2, 2),
    }
    # budget 2: only the most recent query per conversation survives
    tight = {
        (r.conv_id, r.rk)
        for r in conversation_context(df, max_qa_turns=5, max_tokens=2).collect()
    }
    assert tight == {("q1", 1), ("q2", 1)}
    # cap of 1 QA turn beats the budget
    capped = {
        (r.conv_id, r.rk)
        for r in conversation_context(df, max_qa_turns=1, max_tokens=99).collect()
    }
    assert capped == {("q1", 1), ("q2", 1)}
