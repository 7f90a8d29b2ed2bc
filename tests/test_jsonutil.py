"""LLM-seam JSON cleanup (reference utils/__init__.py try_parse_json_object)."""

from knowledge_graph_spark.functions.jsonutil import try_parse_json_object


def test_well_formed_passthrough():
    s, d = try_parse_json_object('{"a": 1, "b": [1, 2]}')
    assert d == {"a": 1, "b": [1, 2]}


def test_prose_around_braces():
    s, d = try_parse_json_object('Sure! Here is the JSON: {"title": "X"} hope it helps')
    assert d == {"title": "X"}


def test_markdown_frame_and_newlines():
    s, d = try_parse_json_object('```json\n{"a":\n 1}\n```')
    assert d == {"a": 1}


def test_double_braces():
    s, d = try_parse_json_object('{{"a": 1}}')
    assert d == {"a": 1}


def test_trailing_comma_and_single_quotes():
    s, d = try_parse_json_object("{'a': 1, 'b': 2,}")
    assert d == {"a": 1, "b": 2}


def test_unbalanced_closers():
    s, d = try_parse_json_object('{"a": {"b": 1')
    assert d == {"a": {"b": 1}}


def test_unparseable_returns_empty_dict():
    s, d = try_parse_json_object("not json at all")
    assert d == {}


def test_non_dict_top_level_returns_empty():
    s, d = try_parse_json_object("[1, 2, 3]")
    assert d == {}
