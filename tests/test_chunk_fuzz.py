"""Differential fuzz: the chunking window kernel vs the reference loop.

``chunk_windows`` (the kernel inside the Arrow chunk UDF) re-expresses
the reference's ``split_text_on_tokens`` while-loop (reference
text/chunk/strategies/tokens.py:28-62, itself adapted from langchain's
splitter).  This file runs the REFERENCE loop verbatim in-test (ws
tokenizer standing in for tiktoken — the documented env substitution)
over random texts and window geometries and asserts chunk-for-chunk
equality: same chunk count, same token windows, same n_tokens,
including the classic off-by-one corners (empty text, whitespace-only
text, len == size, len a multiple of step, final short window,
overlap = 0, overlap = size-1).

No Spark needed: the kernel is pure Python shared by the UDF and these
tests, and the UDF's Arrow path is covered by the chunk gate +
test_chunk.py.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from knowledge_graph_spark.functions.tokens import get_tokenizer
from knowledge_graph_spark.operators.chunk import chunk_windows


def reference_split_on_tokens(text: str, size: int, overlap: int):
    """The reference while-loop, single-document form
    (tokens.py:36-62): encode → fixed-step windows → decode."""
    tok = get_tokenizer("ws")
    input_ids = tok(text)
    result = []
    start_idx = 0
    cur_idx = min(start_idx + size, len(input_ids))
    chunk_ids = input_ids[start_idx:cur_idx]
    while start_idx < len(input_ids):
        result.append((" ".join(chunk_ids), len(chunk_ids)))
        start_idx += size - overlap
        cur_idx = min(start_idx + size, len(input_ids))
        chunk_ids = input_ids[start_idx:cur_idx]
    return result


texts = st.lists(
    st.text(alphabet="ab7 \t\n", min_size=1, max_size=8), max_size=40
).map(" ".join)
geometries = st.tuples(st.integers(1, 12), st.integers(0, 11)).filter(
    lambda t: t[1] < t[0]
)


@settings(max_examples=300, deadline=None)
@given(text=texts, geom=geometries)
def test_chunk_windows_match_reference_loop(text, geom):
    size, overlap = geom
    tok = get_tokenizer("ws")
    ours = [
        (chunk, n) for _idx, chunk, n in chunk_windows(tok(text), size, overlap)
    ]
    assert ours == reference_split_on_tokens(text, size, overlap)


def test_chunk_windows_corner_cases():
    tok = get_tokenizer("ws")
    for text, size, overlap in [
        ("", 5, 2),
        ("   \t  ", 5, 2),
        ("a b c d e", 5, 2),       # len == size
        ("a b c d e f", 3, 1),     # len a multiple of step
        ("a b c d e f g", 3, 0),   # no overlap
        ("a b c d", 3, 2),         # overlap = size-1 (step 1)
    ]:
        ours = [
            (c, n) for _i, c, n in chunk_windows(tok(text), size, overlap)
        ]
        assert ours == reference_split_on_tokens(text, size, overlap), (
            text,
            size,
            overlap,
        )
