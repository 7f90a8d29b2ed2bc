"""Past-cutover equivalence: the distributed iterative-join paths produce
byte-identical fixpoints to the driver-local twins on a graph LARGER than
LOCAL_EDGE_THRESHOLD — the round-2 verdict's gap that the cutover's
"physical-plan choice, not a semantic one" claim was never exercised
above the threshold."""

from pyspark.sql import functions as F

from knowledge_graph_spark.operators.community import (
    LOCAL_EDGE_THRESHOLD,
    connected_components,
    label_propagation,
)
from knowledge_graph_spark.synth import synth_graph

N_EDGES = LOCAL_EDGE_THRESHOLD + 20_000  # 220k — past the cutover
N_NODES = 40_000


def _graph(spark):
    edges = synth_graph(spark, n_nodes=N_NODES, n_edges=N_EDGES, seed=11).persist()
    assert edges.count() > LOCAL_EDGE_THRESHOLD
    nodes = (
        edges.select(F.col("source").alias("title"))
        .unionByName(edges.select(F.col("target").alias("title")))
        .distinct()
        .persist()
    )
    return nodes, edges


def test_distributed_cc_equals_local_past_cutover(spark):
    nodes, edges = _graph(spark)
    dist = connected_components(nodes, edges, local_threshold=0)
    local = connected_components(nodes, edges, local_threshold=2 * N_EDGES)
    assert dist.count() == local.count()
    assert dist.exceptAll(local).limit(1).count() == 0


def test_distributed_lpa_equals_local_past_cutover(spark):
    nodes, edges = _graph(spark)
    # fixed 3 synchronous rounds on both paths → identical label tables
    dist = label_propagation(nodes, edges, local_threshold=0, max_iter=3)
    local = label_propagation(nodes, edges, local_threshold=2 * N_EDGES, max_iter=3)
    assert dist.count() == local.count()
    assert dist.exceptAll(local).limit(1).count() == 0


def test_with_running_sum_matches_single_window(spark):
    """The two-phase distributed prefix sum is value-identical to the
    partitionless running-sum window it replaces, for any total order."""
    from pyspark.sql import Window

    from knowledge_graph_spark.operators.graphops import with_running_sum

    df = spark.range(1000).select(
        F.col("id").alias("k"),
        ((F.col("id") * 37) % 101).alias("v"),
        (-(F.col("id") % 13)).alias("neg_major"),
    ).repartition(16)
    got = {
        r.k: r.run
        for r in with_running_sum(df, ["neg_major", "k"], "v", out_col="run").collect()
    }
    w = Window.orderBy("neg_major", "k").rowsBetween(Window.unboundedPreceding, 0)
    want = {r.k: r.run for r in df.withColumn("run", F.sum("v").over(w)).collect()}
    assert got == want
