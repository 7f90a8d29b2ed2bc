"""Text-analysis operators for large-scale training-data pipelines.

Everything here is native Column algebra (JVM-side, whole-stage codegen) —
no Python in the hot path.  Each op has an exact ANSI-SQL twin in
__spark_entry__.oracle_sql, so the DuckDB gate value-hash-checks them:

- language-ID: stopword-hit n-gram heuristic over a fixed per-language
  word list; deterministic argmax with a fixed language preference order.
- quality scoring: length / punctuation / stopword-ratio mix (the classic
  C4/Gopher-style heuristic family, arXiv 2112.11446 §A1, re-expressed as
  closed-form column math).
- token counting: whitespace count plus a BPE-ish estimate (letter runs /
  digit runs / single punctuation — the GPT-2 pre-tokenizer family).
- fingerprinting: sha256 content hash of the normalized text plus a
  31-base polynomial rolling hash (Rabin-Karp) folded over characters.

Scale: all narrow projections — Catalyst fuses them into the scan stage;
no shuffle, full predicate/column pushdown preserved.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Fixed per-language stopword lists (order = tie-break preference).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "y", "que", "los"],
    "fr": ["le", "la", "de", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist", "ein"],
}
PUNCT_RE = r"[^A-Za-z0-9\s]"
BPEISH_RE = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"
FP_MOD = 1_000_000_007
FP_BASE = 31


def ws_tokens_col(text: Column) -> Column:
    """Whitespace token array, empties dropped (split on \\s+)."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != F.lit(""))


def ws_token_count(text: Column) -> Column:
    return F.size(ws_tokens_col(text))


def bpeish_token_count(text: Column) -> Column:
    """BPE-ish token-count estimate, fully native (no UDF)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPEISH_RE), F.lit(0)))


def punct_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(PUNCT_RE), F.lit(0)))


def stopword_hits(text: Column, lang: str = "en") -> Column:
    words = LANG_STOPWORDS[lang]
    return F.size(
        F.filter(ws_tokens_col(F.lower(text)), lambda t: t.isin(*words))
    )


def lang_scores(text: Column) -> dict[str, Column]:
    return {lang: stopword_hits(text, lang) for lang in LANG_STOPWORDS}


def lang_id(text: Column) -> Column:
    """argmax over per-language stopword hits; first language (in
    LANG_STOPWORDS order) wins ties; zero hits everywhere → 'unknown'."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    expr = F.lit("unknown")
    for lang in reversed(list(LANG_STOPWORDS)):
        expr = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def quality_score(text: Column) -> Column:
    """[0,1] heuristic: longer docs, stopword-bearing prose, low
    punctuation density score higher.  Closed-form, identical arithmetic
    in the SQL oracle (term order matters for float bit-parity)."""
    n_tok = ws_token_count(text).cast("double")
    n_chars = F.greatest(F.length(text), F.lit(1)).cast("double")
    punct_ratio = punct_count(text).cast("double") / n_chars
    stop_ratio = stopword_hits(text).cast("double") / F.greatest(n_tok, F.lit(1.0))
    return (
        F.least(n_tok / F.lit(100.0), F.lit(1.0)) * F.lit(0.4)
        + F.least(stop_ratio / F.lit(0.5), F.lit(1.0)) * F.lit(0.3)
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(5.0), F.lit(1.0))) * F.lit(0.3)
    )


def lines_col(text: Column) -> Column:
    """Non-blank line array (split on newline, whitespace-only dropped)."""
    return F.filter(F.split(text, "\n"), lambda l: F.trim(l) != F.lit(""))


def dup_line_fraction(text: Column) -> Column:
    """Gopher-style repetition signal: fraction of non-blank lines that
    duplicate another line in the same document (arXiv 2112.11446 §A1.1,
    'duplicate line fraction').  Native array algebra — no shuffle, no
    explode; the per-row distinct is linear in the line count."""
    lines = lines_col(text)
    return F.when(F.size(lines) == 0, F.lit(0.0)).otherwise(
        F.lit(1.0)
        - F.size(F.array_distinct(lines)).cast("double") / F.size(lines).cast("double")
    )


def repeated_token_fraction(text: Column) -> Column:
    """Fraction of lowercased whitespace tokens that repeat an earlier
    token — high values flag keyword-stuffed / degenerate documents."""
    toks = ws_tokens_col(F.lower(text))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        F.lit(1.0)
        - F.size(F.array_distinct(toks)).cast("double") / F.size(toks).cast("double")
    )


def normalized_text(text: Column) -> Column:
    """Dedup normalization: lowercase + whitespace collapse + trim."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def content_hash(text: Column) -> Column:
    """sha256 fingerprint of the normalized text (exact-dedup key)."""
    return F.sha2(normalized_text(text), 256)


def rolling_fingerprint(text: Column) -> Column:
    """Rabin-Karp polynomial rolling hash over the character stream:
    fold h -> (h*31 + code(c)) mod 1e9+7.  Native F.aggregate — stays in
    codegen; the DuckDB twin is list_reduce over ord(substr(...))."""
    return F.aggregate(
        F.split(text, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * FP_BASE + F.ascii(c)) % FP_MOD,
    )
