"""LLM-output JSON cleanup (reference utils/__init__.py:44-99,
``try_parse_json_object``) — part of the LLM seam: extractor backends
that parse structured model output (reports, gleaning rounds) route
through this instead of bare ``json.loads``.

The reference chains: direct parse → brace extraction → literal cleanup
(double braces, stray escapes, newlines) → markdown-frame strip →
``json_repair`` library fallback.  That library is not in this sandbox,
so the fallback here is a minimal deterministic repair (trailing commas,
single-quoted strings, unbalanced closers) covering the common LLM
glitches; anything still unparseable returns ``(cleaned, {})`` exactly
like the reference's failure path.
"""

from __future__ import annotations

import json
import re


def _repair_minimal(s: str) -> str:
    """Deterministic stand-in for the json_repair fallback: fixes the
    frequent LLM-output defects without guessing at grammar."""
    # trailing commas before a closer
    s = re.sub(r",\s*([}\]])", r"\1", s)
    # single-quoted keys/strings → double quotes (only when the quoted
    # run itself contains no double quote — conservative)
    s = re.sub(r"'([^'\"]*)'", r'"\1"', s)
    # append missing closers for unbalanced braces/brackets
    opens = []
    for ch in s:
        if ch in "{[":
            opens.append("}" if ch == "{" else "]")
        elif ch in "}]" and opens:
            opens.pop()
    return s + "".join(reversed(opens))


def try_parse_json_object(input: str) -> tuple[str, dict]:
    """Best-effort (cleaned_string, parsed_dict); ({} on failure) —
    reference semantics step for step."""
    try:
        result = json.loads(input)
        if isinstance(result, dict):
            return input, result
    except json.JSONDecodeError:
        pass

    match = re.search(r"\{(.*)\}", input, re.DOTALL)
    cleaned = "{" + match.group(1) + "}" if match else input
    cleaned = (
        cleaned.replace("{{", "{")
        .replace("}}", "}")
        .replace('"[{', "[{")
        .replace('}]"', "}]")
        .replace("\\n", " ")
        .replace("\n", " ")
        .replace("\r", "")
        .strip()
    )
    if cleaned.startswith("```json"):
        cleaned = cleaned[len("```json"):]
    if cleaned.endswith("```"):
        cleaned = cleaned[: -len("```")]

    try:
        result = json.loads(cleaned)
    except json.JSONDecodeError:
        cleaned = _repair_minimal(cleaned)
        try:
            result = json.loads(cleaned)
        except json.JSONDecodeError:
            return cleaned, {}
    if not isinstance(result, dict):
        return cleaned, {}
    return cleaned, result
