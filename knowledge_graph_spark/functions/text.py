"""String-normalization kernels shared across the pipeline.

`clean_str` reproduces the reference's normalization (reference
utils/string.py:11-19: html.unescape + control-character strip, then the
call sites' upper().strip() at graph/extractors/graph_extractor.py:205-206
and utils/graph.py:60-63).  The html-unescape step needs Python, so it ships
as an Arrow-vectorized pandas UDF; everything else is native Column algebra
so it stays inside whole-stage codegen.
"""

from __future__ import annotations

import html
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import types as T
from pyspark.sql import functions as F

# control characters (reference utils/string.py:17-19 strips categories C*)
_CONTROL_RE = re.compile(r"[\x00-\x1f\x7f-\x9f]")


def _clean_py(s: str) -> str:
    if s is None:
        return None
    return _CONTROL_RE.sub("", html.unescape(s.strip()))


@F.pandas_udf(T.StringType())
def unescape_clean(s: pd.Series) -> pd.Series:  # pragma: no cover - trivial
    return s.map(_clean_py, na_action="ignore")


# Named-entity subset covering html.unescape's behavior on real-world
# extraction output.  &amp; is LAST so "&amp;lt;" → "&lt;" exactly like
# Python's single-pass unescape.  Exotic entities (&copy;, &#x1F600;)
# fall outside this subset — the parse stage handles ~10^8 records per
# input TB, and a row-at-a-time Python unescape there costs more than the
# whole JVM parse; callers needing full fidelity use `unescape_clean`.
_HTML_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&#x27;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def _strip_ws(col: Column) -> Column:
    """Python ``str.strip()`` semantics: remove ALL leading/trailing
    whitespace — tabs, newlines, unicode spaces — not just 0x20.  JVM
    ``trim()`` strips only the space character, which left a trailing
    space behind on inputs like ``'; \\t'`` (trim can't remove the
    space because a tab sits outside it; the control-char regex then
    deletes the tab).  Caught by the parser differential fuzz
    (tests/test_parse_fuzz.py); ``(?U)`` makes \\s match unicode
    whitespace like Python's strip."""
    return F.regexp_replace(col, r"(?U)^\s+|\s+$", "")


def _native_clean(col: Column) -> Column:
    c = _strip_ws(col)
    for entity, char in _HTML_ENTITIES:
        c = F.replace(c, F.lit(entity), F.lit(char))
    return F.regexp_replace(c, r"[\x00-\x1f\x7f-\x9f]", "")


def clean_name(col: Column) -> Column:
    """Entity-name normalization: unescape + control-strip + UPPER,
    matching reference graph_extractor.py:205-206 / utils/graph.py:62
    (``clean_str(name.upper())`` — no second trim after the clean, so a
    control-char-guarded trailing space survives exactly like Python).
    Native (whole-stage codegen)."""
    return F.upper(_native_clean(col))


def clean_str_col(col: Column) -> Column:
    """Description/value normalization (no uppercasing).  Native."""
    return _native_clean(col)


def strip_outer_parens(col: Column) -> Column:
    """Remove one layer of surrounding parentheses from a record tuple
    (reference graph_extractor.py:200 ``re.sub(r'^\\(|\\)$', '', ...)``
    applied to ``record.strip()`` — full Python whitespace strip, see
    ``_strip_ws``)."""
    return F.regexp_replace(_strip_ws(col), r"^\(|\)$", "")


def parse_weight(col: Column) -> Column:
    """Float parse with fallback to 1.0 for non-numeric weights
    (reference graph_extractor.py:248-251)."""
    casted = F.trim(col).try_cast("double")  # ANSI-safe: malformed → null
    return F.coalesce(casted, F.lit(1.0))
