"""Round-3 wave-16 operators: per-group integer PageRank (the TextRank
kernel), TextRank turn salience, and the Snorkel-style weak-supervision
audit.

grouped_pagerank is checked for exact agreement with pagerank_int on a
single-group graph (the two loops share the same integer arithmetic, so
the values must be bit-identical) and for per-group teleport independence
on a multi-group frame; the weak-label ops against hand fixtures.
"""

from knowledge_graph_spark.operators.assemble import textrank_turns
from knowledge_graph_spark.operators.corpus import (
    WEAK_LFS,
    weak_label_matrix,
    weak_lf_stats,
)
from knowledge_graph_spark.operators.graphops import grouped_pagerank, pagerank_int


def _gedges(spark, rows):
    return spark.createDataFrame(rows, "group string, u string, v string, w long")


def _gnodes(spark, rows):
    return spark.createDataFrame(rows, "group string, node string")


# --- grouped_pagerank -------------------------------------------------------


def test_grouped_matches_global_on_single_group(spark):
    # one group == plain PageRank: identical integer values round-for-round
    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    flat = spark.createDataFrame(edges, "source string, target string")
    want = {r["title"]: r["rank_scaled"] for r in pagerank_int(flat, iterations=4).collect()}
    sym = [("g", s, t, 1) for s, t in edges] + [("g", t, s, 1) for s, t in edges]
    nodes = _gnodes(spark, [("g", n) for n in "abcd"])
    got = {
        r["node"]: r["rank_scaled"]
        for r in grouped_pagerank(
            _gedges(spark, sym), nodes, iterations=4, weight_col="w"
        ).collect()
    }
    assert got == want


def test_grouped_groups_are_independent(spark):
    # the same graph in two groups ranks identically; a third group's
    # presence cannot perturb either (per-group teleport normalization)
    sym = [("g1", "a", "b", 1), ("g1", "b", "a", 1)]
    both = sym + [("g2", "a", "b", 1), ("g2", "b", "a", 1), ("g3", "x", "y", 3), ("g3", "y", "x", 3)]
    n1 = _gnodes(spark, [("g1", "a"), ("g1", "b")])
    nall = _gnodes(
        spark, [("g1", "a"), ("g1", "b"), ("g2", "a"), ("g2", "b"), ("g3", "x"), ("g3", "y")]
    )
    solo = {
        r["node"]: r["rank_scaled"]
        for r in grouped_pagerank(_gedges(spark, sym), n1, weight_col="w").collect()
    }
    rows = grouped_pagerank(_gedges(spark, both), nall, weight_col="w").collect()
    g1 = {r["node"]: r["rank_scaled"] for r in rows if r["group"] == "g1"}
    g2 = {r["node"]: r["rank_scaled"] for r in rows if r["group"] == "g2"}
    assert g1 == solo and g2 == solo
    # weight scaling cancels within a symmetric 2-clique: same fixpoint
    g3 = {r["node"]: r["rank_scaled"] for r in rows if r["group"] == "g3"}
    assert g3 == {"x": solo["a"], "y": solo["b"]}


def test_grouped_isolated_node_keeps_teleport_only(spark):
    # n_g = 3: the isolated node converges to pure per-group teleport
    sym = [("g", "a", "b", 1), ("g", "b", "a", 1)]
    nodes = _gnodes(spark, [("g", "a"), ("g", "b"), ("g", "c")])
    got = {
        r["node"]: r["rank_scaled"]
        for r in grouped_pagerank(_gedges(spark, sym), nodes, weight_col="w").collect()
    }
    base = (10**12 * 15) // (100 * 3)
    assert got["c"] == base
    assert got["a"] == got["b"] > base


# --- textrank_turns ---------------------------------------------------------


def test_textrank_clique_outranks_isolates(spark):
    t = spark.createDataFrame(
        [
            ("c1", 0, "alpha beta gamma"),
            ("c1", 1, "beta gamma delta"),
            ("c1", 2, "epsilon zeta"),
            ("c1", 3, "unique words only"),
            ("c2", 0, "solo turn"),
        ],
        "conv_id string, turn_idx int, text string",
    )
    got = {(r["conv_id"], r["turn_idx"]): r["rank_scaled"] for r in textrank_turns(t).collect()}
    assert len(got) == 5
    # the 2-clique holds all non-teleport mass; isolates get pure teleport
    base4 = (10**12 * 15) // (100 * 4)
    assert got[("c1", 2)] == got[("c1", 3)] == base4
    assert got[("c1", 0)] == got[("c1", 1)] > base4
    # a 1-turn conversation keeps only its teleport (dangling mass drops)
    assert got[("c2", 0)] == (10**12 * 15) // 100


def test_textrank_hub_turn_ranks_first(spark):
    # turn 1 shares a token with every other turn: highest centrality
    t = spark.createDataFrame(
        [
            ("c", 0, "alpha one"),
            ("c", 1, "alpha beta gamma"),
            ("c", 2, "beta two"),
            ("c", 3, "gamma three"),
        ],
        "conv_id string, turn_idx int, text string",
    )
    rows = sorted(textrank_turns(t).collect(), key=lambda r: -r["rank_scaled"])
    assert rows[0]["turn_idx"] == 1


def test_textrank_arrow_kernel_matches_relational_on_synth(spark):
    """The dense per-group Arrow kernel and the relational grouped-
    PageRank loop must be bit-identical — same int64 floor-division
    arithmetic, different physical plan (1 shuffle vs 5×2)."""
    from knowledge_graph_spark.synth import synth_transcripts

    t = synth_transcripts(spark, n_convs=40, base_turns=12)
    arrow = {
        (r["conv_id"], r["turn_idx"]): r["rank_scaled"]
        for r in textrank_turns(t).collect()
    }
    rel = {
        (r["conv_id"], r["turn_idx"]): r["rank_scaled"]
        for r in textrank_turns(t, kernel="relational").collect()
    }
    assert arrow == rel and len(arrow) > 100


def test_textrank_arrow_kernel_matches_relational_edge_cases(spark):
    """Isolated turns, empty text, and a single-turn conversation take
    the same values through both kernels."""
    t = spark.createDataFrame(
        [
            ("c1", 0, "alpha beta"),
            ("c1", 1, "beta gamma"),
            ("c1", 2, ""),
            ("c1", 3, "   "),
            ("c2", 0, "solo"),
        ],
        "conv_id string, turn_idx int, text string",
    )
    arrow = {
        (r["conv_id"], r["turn_idx"]): r["rank_scaled"]
        for r in textrank_turns(t).collect()
    }
    rel = {
        (r["conv_id"], r["turn_idx"]): r["rank_scaled"]
        for r in textrank_turns(t, kernel="relational").collect()
    }
    assert arrow == rel and len(arrow) == 5


# --- weak labels ------------------------------------------------------------


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "run the query and join agg now"),  # two positive LFs
            (2, "stream batch window pipeline"),  # two negative LFs
            (3, "plain text nothing"),  # all abstain
            (4, "query the stream"),  # 1 vs 0 tie -> vote 0
        ],
        "doc_id long, text string",
    )


def test_weak_label_matrix_votes(spark):
    got = {r["doc_id"]: r for r in weak_label_matrix(_docs(spark)).collect()}
    assert got[1]["vote"] == 1 and got[1]["n_pos"] == 2 and got[1]["n_neg"] == 0
    assert got[2]["vote"] == 0 and got[2]["n_neg"] == 2
    assert got[3]["vote"] is None and got[3]["n_pos"] == got[3]["n_neg"] == 0
    # tie breaks to the smaller label
    assert got[4]["n_pos"] == got[4]["n_neg"] == 1 and got[4]["vote"] == 0
    # abstains are NULL, fires carry the LF's label
    assert got[1]["lf_query"] == 1 and got[1]["lf_stream"] is None
    assert got[2]["lf_batch_window"] == 0


def test_weak_lf_stats_counts(spark):
    got = {r["lf"]: r for r in weak_lf_stats(_docs(spark)).collect()}
    assert set(got) == {name for name, _, _ in WEAK_LFS}
    q = got["lf_query"]  # fires on docs 1 and 4
    assert q["n_fired"] == 2 and q["coverage_micro"] == 500_000
    assert q["n_overlap"] == 2  # doc1 with lf_join_agg, doc4 with lf_stream
    assert q["n_conflict"] == 1  # doc4: lf_stream voted 0
    assert q["n_agree_vote"] == 1  # doc1 only (doc4's vote is 0)
    s = got["lf_stream"]  # fires on docs 2 and 4, agrees with both votes
    assert s["n_fired"] == 2 and s["n_conflict"] == 1 and s["n_agree_vote"] == 2
    j = got["lf_join_agg"]  # doc1 only, overlaps lf_query, no conflict
    assert j["n_fired"] == 1 and j["n_overlap"] == 1 and j["n_conflict"] == 0


def test_weak_lf_stats_custom_lfs(spark):
    lfs = (("lf_a", ("alpha",), 1), ("lf_b", ("beta",), 0))
    d = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha"), (3, "nothing")], "doc_id long, text string"
    )
    got = {r["lf"]: r for r in weak_lf_stats(d, lfs=lfs).collect()}
    assert got["lf_a"]["n_fired"] == 2 and got["lf_a"]["n_conflict"] == 1
    assert got["lf_b"]["coverage_micro"] == 333_333


# --- quality survivors -------------------------------------------------------


def test_quality_survivors_picks_best_and_breaks_ties(spark):
    from knowledge_graph_spark.operators.dedup import quality_survivors

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5)],
        "doc_id long, canonical_id long",
    )
    scores = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (4, 7), (5, 2), (6, 2)],
        "doc_id long, quality_micro long",
    )
    got = {r["doc_id"]: r for r in quality_survivors(clusters, scores).collect()}
    kept = {d for d, r in got.items() if r["keep"]}
    # best score wins; score ties break to the smaller doc_id; singletons keep
    assert kept == {2, 4, 5}
    # membership is untouched — every input row survives with its cluster
    assert {(d, r["canonical_id"]) for d, r in got.items()} == {
        (1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5)
    }


def test_quality_survivors_preserves_unscored_members(spark):
    """A cluster member missing from ``scores`` must stay in the output
    (sorted after every scored member), not silently vanish — and must
    not be elected over a scored one."""
    from knowledge_graph_spark.operators.dedup import quality_survivors

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3)], "doc_id long, canonical_id long"
    )
    scores = spark.createDataFrame([(2, 5)], "doc_id long, quality_micro long")
    got = {r["doc_id"]: r for r in quality_survivors(clusters, scores).collect()}
    assert set(got) == {1, 2, 3}  # nothing dropped
    assert got[2]["keep"] and not got[1]["keep"]
    assert got[3]["keep"]  # fully-unscored singleton still elects itself


def test_weak_stats_zero_doc_counter_reads_zero_coverage(spark):
    """A counter row folded from an empty corpus (n_docs = 0) must read
    coverage 0, not NULL (or a division error in the oracle mirror)."""
    from knowledge_graph_spark.operators.corpus import weak_stats_from_counters

    counters = spark.createDataFrame(
        [("lf_a", 1, 0, 0, 0, 0, 0)],
        "lf string, label int, n_docs long, n_fired long,"
        " n_overlap long, n_conflict long, n_agree_vote long",
    )
    row = weak_stats_from_counters(counters).collect()[0]
    assert row["coverage_micro"] == 0
