"""Agent-trace analytics (agent_trace.py) + the session-5 graph/corpus
operators (widest_paths, adamic_adar_pairs, merge_pair_counts).

Each operator is replayed in pure Python over the same small input and
compared exactly — the unit-level analogue of the DuckDB gate oracles.
"""

import math
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from knowledge_graph_spark.operators.agent_trace import (
    tool_transitions,
    turn_latency,
)
from knowledge_graph_spark.operators.corpus import merge_pair_counts
from knowledge_graph_spark.operators.graphops import (
    AA_SCALE,
    WIDEST_SEED_STRENGTH,
    adamic_adar_pairs,
    widest_paths,
)

# (conv_id, turn_idx, role, text, tool, ts_sec): two conversations with
# interleaved tool calls; c2's lone tool call checks the ^START-only path.
TURNS = [
    ("c1", 0, "user", "hi", "", 100),
    ("c1", 1, "assistant", "hello", "", 107),
    ("c1", 2, "tool", "r", "search", 110),
    ("c1", 3, "tool", "r", "fetch", 118),
    ("c1", 4, "assistant", "done", "", 130),
    ("c1", 5, "tool", "r", "search", 131),
    ("c2", 0, "assistant", "first-turn, no predecessor", "", 50),
    ("c2", 1, "tool", "r", "fetch", 64),
    ("c2", 2, "assistant", "ok", "", 99),
]


@pytest.fixture(scope="module")
def transcripts(spark):
    rows = [(c, i, r, x, tl, ts) for c, i, r, x, tl, ts in TURNS]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts_sec long",
    ).withColumn("ts", F.timestamp_seconds("ts_sec"))


def test_tool_transitions(spark, transcripts):
    got = {
        (r.prev_tool, r.tool): (r.n_transitions, r.n_convs)
        for r in tool_transitions(transcripts).collect()
    }
    assert got == {
        ("^START", "search"): (1, 1),
        ("search", "fetch"): (1, 1),
        ("fetch", "search"): (1, 1),
        ("^START", "fetch"): (1, 1),
    }


def test_turn_latency(spark, transcripts):
    got = {
        r.conv_id: (r.n_responses, r.total_wait_us, r.max_wait_us)
        for r in turn_latency(transcripts).collect()
    }
    # c1: waits 7s (t1) and 12s (t4); c2: 35s (t2) — t0 has no predecessor.
    assert got == {
        "c1": (2, 19_000_000, 12_000_000),
        "c2": (1, 35_000_000, 35_000_000),
    }


WEDGES = [  # weighted path graph plus a triangle: a-b-c-d, b-d, d-e
    ("a", "b", 5.0),
    ("b", "c", 2.0),
    ("c", "d", 7.0),
    ("b", "d", 3.0),
    ("d", "e", 1.0),
]


def _local_widest(edges, seed, rounds):
    adj = defaultdict(dict)
    for u, v, w in edges:
        w = int(w)
        adj[u][v] = max(adj[u].get(v, 0), w)
        adj[v][u] = max(adj[v].get(u, 0), w)
    s = {seed: WIDEST_SEED_STRENGTH}
    for _ in range(rounds):
        nxt = dict(s)
        for u, su in s.items():
            for v, w in adj[u].items():
                cand = min(su, w)
                if cand > nxt.get(v, -1):
                    nxt[v] = cand
        s = nxt
    return s


def test_widest_paths_matches_local_fixpoint(spark):
    edges = spark.createDataFrame(WEDGES, "source string, target string, weight double")
    seeds = spark.createDataFrame([("a",)], "title string")
    for rounds in (1, 4):
        got = {r.title: r.strength for r in widest_paths(edges, seeds, rounds).collect()}
        assert got == _local_widest(WEDGES, "a", rounds)
    # 4 rounds closes this graph: e's bottleneck is min over best path
    got = {r.title: r.strength for r in widest_paths(edges, seeds, 4).collect()}
    assert got["e"] == 1 and got["c"] == 3 and got["b"] == 5


def test_adamic_adar_matches_local(spark):
    edges = spark.createDataFrame(WEDGES, "source string, target string, weight double")
    adj = defaultdict(set)
    for u, v, _ in WEDGES:
        adj[u].add(v)
        adj[v].add(u)
    expect = {}
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            if b in adj[a]:
                continue
            common = adj[a] & adj[b]
            if not common:
                continue
            score = sum(
                AA_SCALE // max(int(math.log2(len(adj[z]))), 1) for z in common
            )
            expect[(a, b)] = (len(common), score)
    got = {
        (r.title_a, r.title_b): (r.n_common, r.aa_micro)
        for r in adamic_adar_pairs(edges).collect()
    }
    assert got == expect
    # degree cap: centers above the cap contribute no wedges
    capped = adamic_adar_pairs(edges, max_center_degree=2).collect()
    assert all(r.n_common >= 1 for r in capped)
    assert len(capped) <= len(got)


def test_merge_pair_counts(spark):
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran"), (3, "one"), (4, "")],
        "doc_id long, text string",
    )
    got = [(r.left_tok, r.right_tok, r.n_pairs) for r in merge_pair_counts(docs, 3).collect()]
    counts = Counter()
    for t in ("the cat sat", "the cat ran"):
        toks = t.split()
        counts.update(zip(toks, toks[1:]))
    expect = sorted(
        ((l, r, n) for (l, r), n in counts.items()),
        key=lambda x: (-x[2], x[0], x[1]),
    )[:3]
    assert got == expect


def test_hits_int_matches_replay(spark):
    from knowledge_graph_spark.operators.graphops import HITS_NORM_SCALE, hits_int

    # directed multigraph, duplicate edge included on purpose
    de = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("a", "b")]
    edges = spark.createDataFrame(de, "source string, target string")

    def replay(rounds):
        nodes = sorted({n for e in de for n in e})
        h = {n: 1 for n in nodes}
        a = {}
        for _ in range(rounds):
            raw_a = defaultdict(int)
            for u, v in de:
                raw_a[v] += h.get(u, 0)
            m = max(raw_a.values())
            a = {n: x // max(1, m // HITS_NORM_SCALE) for n, x in raw_a.items()}
            raw_h = defaultdict(int)
            for u, v in de:
                raw_h[u] += a.get(v, 0)
            m = max(raw_h.values())
            h = {n: x // max(1, m // HITS_NORM_SCALE) for n, x in raw_h.items()}
        return {n: (a.get(n, 0), h.get(n, 0)) for n in nodes}

    for rounds in (1, 3):
        got = {
            r.title: (r.authority, r.hub)
            for r in hits_int(edges, rounds=rounds).collect()
        }
        assert got == replay(rounds)
    # direction signal: a (three outgoing edges) is the top hub but a weak
    # authority — exactly the asymmetry the undirected walk erases.
    got = {r.title: (r.authority, r.hub) for r in hits_int(edges, rounds=3).collect()}
    assert got["a"][1] == max(v[1] for v in got.values())
    assert got["a"][0] == min(v[0] for v in got.values())


def test_assortativity_matches_networkx(spark):
    import networkx as nx
    from fractions import Fraction

    from knowledge_graph_spark.operators.graphops import assortativity_profile
    from knowledge_graph_spark.operators.graphops import node_degrees

    edges = spark.createDataFrame(
        [(u, v) for u, v, _ in WEDGES], "source string, target string"
    )
    row = assortativity_profile(edges, node_degrees(edges)).collect()[0]
    r = Fraction(row.num, row.den)
    g = nx.Graph([(u, v) for u, v, _ in WEDGES])
    expected = nx.degree_assortativity_coefficient(g)
    assert abs(float(r) - expected) < 1e-12
    assert row.m_dir == 2 * len(WEDGES)


def test_tool_latency(spark, transcripts):
    from knowledge_graph_spark.operators.agent_trace import tool_latency

    got = {
        r.tool: (r.n_calls, r.n_timed, r.total_gap_us, r.max_gap_us)
        for r in tool_latency(transcripts).collect()
    }
    # c1: search@110→118 (8s), fetch@118→130 (12s), search@131 is final
    # (untimed); c2: fetch@64→99 (35s)
    assert got == {
        "search": (2, 1, 8_000_000, 8_000_000),
        "fetch": (2, 2, 47_000_000, 35_000_000),
    }


def test_conversation_shapes(spark, transcripts):
    from knowledge_graph_spark.operators.agent_trace import conversation_shapes

    got = {
        r.conv_id: (r.n_turns, r.n_user, r.n_assistant, r.n_tool_calls,
                    r.last_role, r.duration_us)
        for r in conversation_shapes(transcripts).collect()
    }
    assert got == {
        "c1": (6, 1, 2, 3, "tool", 31_000_000),
        "c2": (3, 0, 2, 1, "assistant", 49_000_000),
    }


def test_tool_ngrams(spark, transcripts):
    from knowledge_graph_spark.operators.agent_trace import tool_ngrams

    got = [
        (r.g1, r.g2, r.g3, r.n_occurrences)
        for r in tool_ngrams(transcripts, n=3, k_top=8).collect()
    ]
    # c1's calls: search, fetch, search -> one complete trigram; c2 has
    # a single call -> none.
    assert got == [("search", "fetch", "search", 1)]
    bigrams = {
        (r.g1, r.g2): r.n_occurrences
        for r in tool_ngrams(transcripts, n=2, k_top=8).collect()
    }
    assert bigrams == {("search", "fetch"): 1, ("fetch", "search"): 1}


def test_null_robustness(spark):
    """NULL text / tool / role / ts and duplicate turn_idx must flow
    through the pipeline and every trace operator without ANSI-mode
    throws — ingest garbage is a fact of life at 10^12 turns."""
    from knowledge_graph_spark.operators.agent_trace import (
        conversation_shapes,
        tool_latency,
    )
    from knowledge_graph_spark.pipeline import PipelineConfig, build_graph

    rows = [
        ("c1", 0, "user", None, "", 100),
        ("c1", 1, "tool", "r", None, 110),
        ("c1", 2, "assistant", "PERSON_1 met CITY_2", "", None),
        ("c2", 0, None, "x", "", 50),
        ("c3", 0, "tool", "r", "search", 60),
        ("c3", 0, "tool", "r", "fetch", 61),
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, sec long",
    ).select(
        "conv_id", "turn_idx", "role", "text", "tool",
        F.timestamp_seconds("sec").alias("ts"),
    )
    stages = build_graph(t, PipelineConfig(chunk_size=16, chunk_overlap=4, tokenizer="ws"))
    assert stages["nodes"].count() == 2 and stages["edges"].count() == 1
    assert tool_transitions(t).count() == 2  # NULL-tool call is excluded
    assert turn_latency(t).count() == 1      # NULL-ts turn yields no wait
    assert tool_latency(t).count() == 2
    shapes = {r.conv_id: r.n_tool_calls for r in conversation_shapes(t).collect()}
    assert shapes == {"c1": 0, "c2": 0, "c3": 2}  # NULL tool != '' is false


def test_multimodal_resize_and_features(spark):
    from knowledge_graph_spark.operators import multimodal

    docs = spark.createDataFrame(
        [(0, "an image doc"), (1, "an audio doc"), (2, "a video doc")],
        "doc_id long, text string",
    )
    media = multimodal.attach_payload(docs)
    meta = multimodal.extract_media_meta(media)
    rp = {r.doc_id: r for r in multimodal.resize_plan(meta, max_edge=512).collect()}
    assert set(rp) == {0, 2}  # image + video only
    for r in rp.values():
        long_edge = max(r.width, r.height)
        if long_edge > 512:
            assert r.needs_resize
            assert r.target_w == r.width * 512 // long_edge
            assert r.target_h == r.height * 512 // long_edge
            assert max(r.target_w, r.target_h) == 512
        else:
            assert (r.target_w, r.target_h) == (r.width, r.height)
    feats = multimodal.extract_features(media).collect()
    assert len(feats) == 3 * 16
    by_doc = {}
    for r in feats:
        by_doc.setdefault(r.doc_id, 0)
        by_doc[r.doc_id] += r.value
    assert all(v == 32 for v in by_doc.values())  # md5 hex has 32 nibbles
    import pytest as _pytest

    with _pytest.raises(Exception, match="NotImplementedError|feature extraction"):
        multimodal.extract_features(media, feature_stub=False).collect()
