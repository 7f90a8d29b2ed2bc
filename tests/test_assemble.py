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
