"""Round-3 wave-11 operators: langid (operators/langid.py) and
coarsen_by_matching (graphops.py).

langid is checked on two synthetic 'languages' with disjoint character
alphabets (perfect recovery expected) plus the rank-weight and
short-text contracts; coarsening against its conservation invariants
(total weight preserved, matched nodes absent from the coarse vertex
set, self-loops exactly the contracted pairs' internal weight) and a
hand-computed two-pair fixture.
"""

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_langid_recovers_disjoint_alphabets(spark):
    from knowledge_graph_spark.operators.langid import (
        langid_predict,
        train_language_profiles,
    )

    rows = [
        (i, "aaabbbcccabcabc" * 3, "aa") for i in range(10)
    ] + [
        (i + 100, "xxyyzzxyzxyzzyx" * 3, "zz") for i in range(10)
    ]
    d = _docs(spark, rows)
    prof = train_language_profiles(d.filter(F.col("doc_id") % 5 != 0))
    out = langid_predict(d.filter(F.col("doc_id") % 5 == 0), prof)
    got = {r.doc_id: r for r in out.collect()}
    assert len(got) == 4  # 0,5 and 100,105
    for r in got.values():
        assert r.pred_lang == r.lang and r.correct == 1 and r.score > 0


def test_langid_profile_rank_weights(spark):
    from knowledge_graph_spark.operators.langid import train_language_profiles

    d = _docs(spark, [(1, "ababab", "aa")])  # grams: aba x2, bab x2? -> aba,bab,aba,bab
    prof = {r.gram: r for r in train_language_profiles(d, top_p=8).collect()}
    # 'ababab' -> aba bab aba bab: counts 2/2, rank ties broken gram ASC
    assert prof["aba"].rk == 1 and prof["aba"].w == 8
    assert prof["bab"].rk == 2 and prof["bab"].w == 7


def test_langid_short_text_and_no_overlap(spark):
    from knowledge_graph_spark.operators.langid import (
        langid_predict,
        train_language_profiles,
    )

    train = _docs(spark, [(1, "qqqqqq", "qq")])
    test = _docs(spark, [(2, "ab", "qq"), (3, "zzzzzz", "qq")])
    out = {r.doc_id: r for r in
           langid_predict(test, train_language_profiles(train)).collect()}
    # doc 2: shorter than a trigram -> no grams -> unclassified
    assert out[2].pred_lang == "" and out[2].score == 0 and out[2].correct == 0
    # doc 3: grams exist but none in profile -> unclassified
    assert out[3].pred_lang == "" and out[3].n_hits == 0


def _edges(spark, rows):
    return spark.createDataFrame(rows, "source string, target string, weight double")


def test_coarsen_hand_fixture(spark):
    from knowledge_graph_spark.operators.graphops import coarsen_by_matching

    # matching: (A,B) and (C,D); E unmatched
    e = _edges(
        spark,
        [
            ("A", "B", 2.0),  # internal -> self-loop at A
            ("A", "C", 1.0),  # cross -> (A, C)
            ("B", "D", 3.0),  # cross -> (A, C) too (B->A, D->C)
            ("D", "E", 5.0),  # half-matched -> (C, E)
        ],
    )
    m = spark.createDataFrame([("A", "B"), ("C", "D")], "source string, target string")
    got = {(r.a, r.b): (r.w, r.n_multi) for r in coarsen_by_matching(e, m).collect()}
    assert got[("A", "A")] == (2.0, 1)
    assert got[("A", "C")] == (4.0, 2)  # A-C and B-D collapse
    assert got[("C", "E")] == (5.0, 1)
    assert len(got) == 3


def test_coarsen_invariants_on_matching(spark):
    from knowledge_graph_spark.operators.graphops import (
        coarsen_by_matching,
        maximal_matching,
    )

    rows = []
    for i in range(30):
        rows.append((f"n{i}", f"n{(i + 1) % 30}", float(1 + i % 3)))
        rows.append((f"n{i}", f"n{(i + 7) % 30}", 1.0))
    e = _edges(spark, rows)
    m = maximal_matching(e.select("source", "target"), rounds=4)
    coarse = coarsen_by_matching(e, m)
    # weight conservation
    tot_fine = e.agg(F.sum("weight")).first()[0]
    tot_coarse = coarse.agg(F.sum("w")).first()[0]
    assert abs(tot_fine - tot_coarse) < 1e-9
    assert coarse.agg(F.sum("n_multi")).first()[0] == e.count()
    # matched TARGETS never survive as coarse endpoints
    gone = {r.target for r in m.collect()}
    endpoints = {r.a for r in coarse.collect()} | {r.b for r in coarse.collect()}
    assert not (gone & endpoints)
    # coarse vertex count = fine count - |matching|
    fine_nodes = {r.source for r in e.collect()} | {r.target for r in e.collect()}
    assert len(endpoints) == len(fine_nodes) - m.count()


def test_coarsen_hierarchy_conserves_and_shrinks(spark):
    from knowledge_graph_spark.operators.graphops import coarsen_hierarchy

    rows = []
    for i in range(40):
        rows.append((f"n{i}", f"n{(i + 1) % 40}", 2.0))
        rows.append((f"n{i}", f"n{(i + 9) % 40}", 1.0))
    e = _edges(spark, rows)
    l1 = coarsen_hierarchy(e, levels=1)
    l2 = coarsen_hierarchy(e, levels=2)
    # provenance: every original edge accounted for at every level
    assert l1.agg(F.sum("n_multi")).first()[0] == 80
    assert l2.agg(F.sum("n_multi")).first()[0] == 80
    assert abs(l2.agg(F.sum("w")).first()[0] - 120.0) < 1e-9
    # each level strictly shrinks the vertex set (matching is non-empty
    # on this dense ring)
    def n_nodes(df):
        return len({r.a for r in df.collect()} | {r.b for r in df.collect()})
    assert n_nodes(l2) < n_nodes(l1) < 40
    # level-2 == manual compose: match+contract the level-1 output
    from knowledge_graph_spark.operators.graphops import (
        coarsen_by_matching,
        maximal_matching,
    )

    m2 = maximal_matching(
        l1.filter(F.col("a") != F.col("b")).select(
            F.col("a").alias("source"), F.col("b").alias("target")
        ),
        rounds=4,
    )
    manual = coarsen_by_matching(
        l1, m2, src="a", dst="b", weight_col="w", count_col="n_multi"
    )
    got = {(r.a, r.b): (r.w, r.n_multi) for r in l2.collect()}
    want = {(r.a, r.b): (r.w, r.n_multi) for r in manual.collect()}
    assert got == want


def test_coarsen_empty_matching_is_canonicalization(spark):
    from knowledge_graph_spark.operators.graphops import coarsen_by_matching

    e = _edges(spark, [("B", "A", 1.0), ("A", "B", 2.0), ("C", "C", 4.0)])
    m = spark.createDataFrame([], "source string, target string")
    got = {(r.a, r.b): (r.w, r.n_multi) for r in coarsen_by_matching(e, m).collect()}
    assert got == {("A", "B"): (3.0, 2), ("C", "C"): (4.0, 1)}


def test_partition_audit_star_graph(spark):
    """On a star, hash-by-source funnels the hub's whole fan-out into
    ONE part (max_load = d, no replication) while degree-based hashing
    cuts the hub: load spreads across parts and only the hub replicates.
    """
    from knowledge_graph_spark.operators.graphops import edge_partition_audit

    d, parts = 200, 8
    e = spark.createDataFrame(
        [("HUB", f"leaf{i:03d}") for i in range(d)], "source string, target string"
    )
    got = {r.strategy: r for r in edge_partition_audit(e, n_parts=parts).collect()}
    assert set(got) == {"src_hash", "edge_hash", "dbh"}
    # src_hash: every edge lands in part(h(HUB))
    assert got["src_hash"].max_load == d
    assert got["src_hash"].imb_micro == parts * 1_000_000
    assert got["src_hash"].repl_micro == 1_000_000  # no vertex split
    # dbh cuts the hub: load spreads, only HUB replicates
    assert got["dbh"].max_load < d
    assert got["dbh"].imb_micro < parts * 1_000_000
    # 201 vertices; HUB in <= parts parts -> repl in (1, 1 + parts/201]
    assert 1_000_000 < got["dbh"].repl_micro <= 1_000_000 * (201 + parts - 1) // 201
    # random vertex-cut: best load of the three, replication >= dbh's
    assert got["edge_hash"].max_load <= got["dbh"].max_load
    assert got["edge_hash"].repl_micro >= got["dbh"].repl_micro
