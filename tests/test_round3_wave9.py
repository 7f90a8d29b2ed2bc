"""Session-9 operator wave: seeded type propagation, maximal matching,
ER blocking-quality audit, turn-level co-mention bursts.

Each operator's gate is hash-checked against its DuckDB oracle by
tools/check_entry.py; these tests pin the SEMANTIC properties the hash
can't express — matching validity/maximality, seed clamping, metric
identities, burst-rule arithmetic — on small closed-form fixtures.
"""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from knowledge_graph_spark.operators.dedup import blocking_quality, char_shingle_table
from knowledge_graph_spark.operators.graphops import (
    maximal_matching,
    seeded_type_propagation,
)
from knowledge_graph_spark.operators.temporal import comention_burst_profile


def _edges_df(spark, edges, weighted=False):
    if weighted:
        return spark.createDataFrame(
            edges, "source string, target string, weight double"
        )
    return spark.createDataFrame(edges, "source string, target string")


# ---------------------------------------------------------------------------
# seeded_type_propagation
# ---------------------------------------------------------------------------


def test_typed_lpa_seed_clamp_and_majority(spark):
    """Seeds never change; a masked node adopts its weighted neighbour
    majority; tie breaks to the lexicographically smaller type."""
    # star: center c, leaves l1 (PERSON, w=3), l2 (GEO, w=1), l3 (GEO, w=1)
    nodes = spark.createDataFrame(
        [("c", "EVENT"), ("l1", "PERSON"), ("l2", "GEO"), ("l3", "GEO")],
        "title string, type string",
    )
    edges = _edges_df(
        spark,
        [("c", "l1", 3.0), ("c", "l2", 1.0), ("c", "l3", 1.0)],
        weighted=True,
    )
    # force c masked, leaves seeded, via mask_mod=1? no — pick a mask the
    # fixture controls: mask_mod large enough that fingerprints decide.
    # Instead drive determinism by checking BOTH regimes from the output
    # flags themselves.
    out = {
        r.title: r
        for r in seeded_type_propagation(nodes, edges, rounds=3, mask_mod=2).collect()
    }
    for t, r in out.items():
        if r.is_seed:
            # clamped: prediction is always the true type
            assert r.pred_type == r.true_type and r.correct
    # the masked set is fingerprint-determined; whatever it is, every
    # masked node with at least one seeded neighbour must carry a
    # prediction after 3 rounds on this connected star
    seeded = {t for t, r in out.items() if r.is_seed}
    if "c" not in seeded and seeded & {"l1", "l2", "l3"}:
        c = out["c"]
        # weighted majority: PERSON wins iff l1 seeded and 3 > sum of
        # seeded GEO weights; on a tie the lexicographically smaller
        # label (GEO < PERSON) wins
        w = {"PERSON": 3 if "l1" in seeded else 0}
        w["GEO"] = (1 if "l2" in seeded else 0) + (1 if "l3" in seeded else 0)
        expect = min(k for k in w if w[k] == max(w.values()))
        assert c.pred_type == expect


def test_typed_lpa_explicit_majority(spark):
    """Pin an exact majority outcome with mask_mod chosen so the masked
    set is known: fingerprint('B_CENTER') % 1 == 0 masks EVERY node —
    then nothing can propagate (no seeds) and predictions are all NULL."""
    nodes = spark.createDataFrame(
        [("A", "PERSON"), ("B", "GEO")], "title string, type string"
    )
    edges = _edges_df(spark, [("A", "B", 1.0)], weighted=True)
    out = seeded_type_propagation(nodes, edges, rounds=2, mask_mod=1).collect()
    assert all(not r.is_seed and r.pred_type is None for r in out)


def test_typed_lpa_two_hop_propagation(spark):
    """With rounds >= 2 a type crosses two hops: seed - masked - masked."""
    # chain s - m1 - m2; force masking via mask_mod by probing flags
    from knowledge_graph_spark.functions.textqc import FP_BASE, FP_MOD

    def fp(s):
        h = 0
        for ch in s:
            h = (h * FP_BASE + ord(ch)) % FP_MOD
        return h

    # find titles: one seed (fp % 3 != 0) and two masked (fp % 3 == 0)
    seed_t = next(f"S{i}" for i in range(100) if fp(f"S{i}") % 3 != 0)
    masked = [f"M{i}" for i in range(200) if fp(f"M{i}") % 3 == 0][:2]
    nodes = spark.createDataFrame(
        [(seed_t, "PERSON"), (masked[0], "GEO"), (masked[1], "GEO")],
        "title string, type string",
    )
    edges = _edges_df(
        spark,
        [(seed_t, masked[0], 1.0), (masked[0], masked[1], 1.0)],
        weighted=True,
    )
    out = {
        r.title: r
        for r in seeded_type_propagation(nodes, edges, rounds=3, mask_mod=3).collect()
    }
    assert out[seed_t].is_seed and not out[masked[0]].is_seed
    assert out[masked[0]].pred_type == "PERSON"
    assert out[masked[1]].pred_type == "PERSON"  # arrived via round 2+


# ---------------------------------------------------------------------------
# maximal_matching
# ---------------------------------------------------------------------------


def test_maximal_matching_valid_and_maximal(spark):
    """On a pseudo-random graph the output is a VALID matching (node-
    disjoint edges, every edge from the input) and with enough rounds
    MAXIMAL (no remaining edge has both endpoints unmatched)."""
    from knowledge_graph_spark.functions.hashing import HASH_A, HASH_C, HASH_M31

    n = 40
    edges = sorted(
        {
            tuple(
                sorted(
                    (
                        f"n{((HASH_A * (i + 7) + HASH_C) % HASH_M31) % n:02d}",
                        f"n{(((HASH_A * (i + 7) + HASH_C) % HASH_M31) // n) % n:02d}",
                    )
                )
            )
            for i in range(120)
        }
    )
    edges = [(a, b) for a, b in edges if a != b]
    edf = _edges_df(spark, edges)
    out = maximal_matching(edf, rounds=8).collect()
    matched_edges = {(r.source, r.target) for r in out}
    assert matched_edges <= set(edges)
    nodes_used = [x for e in matched_edges for x in e]
    assert len(nodes_used) == len(set(nodes_used))  # node-disjoint
    # maximality: every input edge touches a matched node
    mset = set(nodes_used)
    assert all(a in mset or b in mset for a, b in edges)


def test_maximal_matching_triangle_and_chain(spark):
    """A triangle yields exactly one matched edge; a 4-chain yields a
    perfect matching of 2 edges with enough rounds."""
    tri = _edges_df(spark, [("a", "b"), ("b", "c"), ("a", "c")])
    out = maximal_matching(tri, rounds=4).collect()
    assert len(out) == 1
    chain = _edges_df(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    out2 = {(r.source, r.target) for r in maximal_matching(chain, rounds=6).collect()}
    # maximal matchings of a 4-chain: {ab, cd} (perfect) or {bc} alone
    assert out2 in ({("a", "b"), ("c", "d")}, {("b", "c")})
    # verify against networkx: is it a maximal matching?
    g = nx.Graph([("a", "b"), ("b", "c"), ("c", "d")])
    assert nx.is_maximal_matching(g, {tuple(e) for e in out2})


def test_maximal_matching_dedups_multi_edges(spark):
    """Parallel and reversed duplicate edges collapse before matching."""
    edf = _edges_df(spark, [("a", "b"), ("b", "a"), ("a", "b")])
    out = maximal_matching(edf, rounds=2).collect()
    assert [(r.source, r.target) for r in out] == [("a", "b")]


# ---------------------------------------------------------------------------
# blocking_quality
# ---------------------------------------------------------------------------


def test_blocking_quality_identities(spark):
    """Metric identities on a corpus with planted near-dups: counts are
    consistent (hit <= min(cand, truth)), ratios reproduce the counts,
    and exact duplicates are always both truth and candidates."""
    rows = []
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    for i in range(30):
        rows.append((i, f"document {i} " + " ".join(f"tok{i}_{j}" for j in range(12))))
    # planted near-dup pair: one-token edit of a long shared text
    rows.append((100, base))
    rows.append((101, base.replace("lazy", "sleepy")))
    rows.append((102, base))  # exact dup of 100 — SAME normalized name
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = blocking_quality(docs, threshold=0.5).collect()[0]
    assert out.n_names == 32  # 33 docs, one exact-dup collapse
    assert out.n_total_pairs == 32 * 31 // 2
    assert out.n_hit <= min(out.n_cand, out.n_truth)
    assert out.n_truth >= 1  # the planted near-dup pair
    assert out.reduction_ratio == pytest.approx(1 - out.n_cand / out.n_total_pairs)
    if out.n_truth:
        assert out.pairs_completeness == pytest.approx(out.n_hit / out.n_truth)
    if out.n_cand:
        assert out.pairs_quality == pytest.approx(out.n_hit / out.n_cand)


def test_char_shingle_table_exact_sets(spark):
    """Shingle table == the Python shingle set of each normalized name
    (linking._shingles), including the short-string whole-name case."""
    from knowledge_graph_spark.operators.linking import _shingles

    names = ["hello world document text", "tiny", "  spaced   out  name  "]
    df = spark.createDataFrame([(n,) for n in names], "title string")
    got = {}
    for r in char_shingle_table(df, k=9).collect():
        got.setdefault(r.name, set()).add(r.g)
    for n in names:
        assert got[n] == _shingles(n, 9)


def test_blocking_quality_empty_truth_nulls(spark):
    """All-distinct corpus: zero truth pairs → completeness is NULL, not
    a crash; reduction ratio still computes."""
    docs = spark.createDataFrame(
        [(i, f"utterly unique text number {i} " + "x" * i) for i in range(8)],
        "doc_id long, text string",
    )
    out = blocking_quality(docs, threshold=0.9).collect()[0]
    assert out.n_truth == 0 and out.pairs_completeness is None
    assert out.reduction_ratio is not None


# ---------------------------------------------------------------------------
# comention_burst_profile
# ---------------------------------------------------------------------------


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )


def test_comention_bursts_rule_arithmetic(spark):
    """Plant a pair mentioned 1/hr for 3 hours then 5x in hour 4: the
    spike hour is a burst, the steady hours are not (after warmup)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    k = 0
    for h in range(3):
        rows.append(("c", k, "user", "ALPHA met BETA", "", t0 + dt.timedelta(hours=h)))
        k += 1
    for i in range(5):
        rows.append(
            ("c", k, "user", "ALPHA met BETA", "", t0 + dt.timedelta(hours=3, minutes=i))
        )
        k += 1
    out = {
        r.hour_epoch: r
        for r in comention_burst_profile(_turns(spark, rows)).collect()
    }
    epochs = sorted(out)
    assert [out[e].cnt for e in epochs] == [1, 1, 1, 5]
    # hour 0: cnt=1 < min_count → not a burst
    assert not out[epochs[0]].is_burst
    # hours 1-2: cnt=1 below min_count
    assert not out[epochs[1]].is_burst and not out[epochs[2]].is_burst
    # hour 3: trail_sum=3, 3*5 > 2*3 and 5 >= 2 → burst
    assert out[epochs[3]].trail_sum == 3 and out[epochs[3]].is_burst


def test_comention_bursts_trailing_window_slides(spark):
    """The trailing frame covers exactly the previous 3 buckets: a count
    4 hours old no longer suppresses a spike."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    k = 0
    # 9 mentions in hour 0, silence, then 3 in hour 5 — trail empty again
    for i in range(9):
        rows.append(("c", k, "user", "GAMMA met DELTA", "", t0 + dt.timedelta(minutes=i)))
        k += 1
    for i in range(3):
        rows.append(
            ("c", k, "user", "GAMMA met DELTA", "", t0 + dt.timedelta(hours=5, minutes=i))
        )
        k += 1
    out = {r.hour_epoch: r for r in comention_burst_profile(_turns(spark, rows)).collect()}
    late = max(out)
    assert out[late].trail_sum == 0 and out[late].is_burst


def test_comention_bursts_pairs_within_turn_only(spark):
    """Mentions in different turns never pair; within a turn all
    unordered distinct pairs count once (duplicates collapse)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("c", 0, "user", "AAA saw BBB and CCC and BBB", "", t0),
        ("c", 1, "user", "DDD alone here", "", t0),
    ]
    out = comention_burst_profile(_turns(spark, rows)).collect()
    pairs = {(r.source, r.target) for r in out}
    assert pairs == {("AAA", "BBB"), ("AAA", "CCC"), ("BBB", "CCC")}
    assert all(r.cnt == 1 for r in out)


def test_blocking_quality_sample_mod(spark):
    """sample_mod: 1/None are exact-identical; k>1 audits the
    deterministic 1/k name subuniverse — counts shrink together and the
    metric identities keep holding (the corpus-scale estimator path)."""
    rows = [
        (i, f"document {i} " + " ".join(f"tok{i}_{j}" for j in range(12)))
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    full = blocking_quality(docs, threshold=0.5).collect()[0]
    same = blocking_quality(docs, threshold=0.5, sample_mod=1).collect()[0]
    assert full.asDict() == same.asDict()
    sampled = blocking_quality(docs, threshold=0.5, sample_mod=4).collect()[0]
    assert 0 < sampled.n_names < full.n_names
    assert sampled.n_total_pairs == sampled.n_names * (sampled.n_names - 1) // 2
    assert sampled.n_hit <= min(sampled.n_cand if sampled.n_cand else 0,
                                sampled.n_truth if sampled.n_truth else 0) or (
        sampled.n_cand == 0 or sampled.n_truth == 0
    )


def test_blocking_quality_exact_matches_brute_force(spark):
    """Pins the EXACT path now that the blocking_audit gate runs on the
    sample_mod subuniverse (VERDICT r4 #3): on a small corpus the
    operator's exact truth-pair count equals an all-pairs Python
    Jaccard loop over the normalized-name shingle sets, and n_hit
    equals the brute-force truth ∩ candidate intersection."""
    from knowledge_graph_spark.operators.linking import (
        _shingles,
        minhash_candidate_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [(i, f"document {i} " + " ".join(f"tok{i}_{j}" for j in range(10)))
            for i in range(25)]
    rows += [
        (100, base),
        (101, base.replace("lazy", "sleepy")),
        (103, base.replace("river", "creek")),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = blocking_quality(docs, threshold=0.5).collect()[0]

    from knowledge_graph_spark.functions.textqc import normalized_text
    names = sorted(
        r.title
        for r in docs.select(normalized_text(F.col("text")).alias("title"))
        .filter("title <> ''").distinct().collect()
    )
    sets = {n: _shingles(n, 9) for n in names}
    truth = set()
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            inter = len(sets[a] & sets[b])
            if inter and inter / len(sets[a] | sets[b]) >= 0.5:
                truth.add((a, b))
    assert out.n_names == len(names)
    assert out.n_truth == len(truth) and len(truth) >= 2  # planted near-dups
    ndf = docs.select(normalized_text(F.col("text")).alias("title")).filter(
        "title <> ''"
    ).distinct()
    cand = {
        (r.name_a, r.name_b)
        for r in minhash_candidate_pairs(
            ndf, name_col="title", num_perm=64, bands=16, shingle_k=9
        ).collect()
    }
    assert out.n_hit == len(truth & cand)
