

def test_rrf_fuse_scores_and_order(spark):
    from knowledge_graph_spark.operators.query import rrf_fuse

    a = spark.createDataFrame(
        [("X", 1), ("Y", 2), ("Z", 3)], "title: string, rk: int"
    )
    b = spark.createDataFrame(
        [("Y", 1), ("X", 2), ("W", 3)], "title: string, rk: int"
    )
    out = {r["title"]: r for r in rrf_fuse([a, b]).collect()}
    m = 1_000_000
    # exact integer terms: floor(1e6/(60+rk))
    assert out["X"]["rrf_micro"] == m // 61 + m // 62
    assert out["Y"]["rrf_micro"] == m // 62 + m // 61
    assert out["Z"]["rrf_micro"] == m // 63
    assert out["W"]["n_lists"] == 1 and out["X"]["n_lists"] == 2
    # X and Y tie -> lexicographic; both outrank single-list items
    assert (out["X"]["rk"], out["Y"]["rk"]) == (1, 2)
    assert {out["Z"]["rk"], out["W"]["rk"]} == {3, 4}
