"""Vendored sequential oracle for parity testing.

A clean-room, plain-Python re-implementation of the reference's record
parser + graph merger semantics (reference
graph/extractors/graph_extractor.py:180-292, documented in SURVEY.md §2.3
E3), used ONLY in tests to verify that the distributed DataFrame pipeline
produces the same (subj, pred, obj) triples and node merges as a sequential
single-process run.  Deterministic normalizations applied identically on
both sides (the reference itself is nondeterministic here — Python set
iteration order):

- description unions are rendered in sorted order (the reference's own
  summarization stage sorts too: description_summarize.py:34);
- empty descriptions are dropped from a union whenever a non-empty one
  exists (auto-created endpoints contribute "");
- records are processed in (conv_id, text_unit_id, rec_idx) order — the
  pipeline's stable record ordinal.
"""

from __future__ import annotations

import html
import re
from dataclasses import dataclass, field

RECORD_DELIM = "##"
TUPLE_DELIM = "<|>"
_CONTROL_RE = re.compile(r"[\x00-\x1f\x7f-\x9f]")


def clean_str(s: str) -> str:
    return _CONTROL_RE.sub("", html.unescape(s.strip()))


@dataclass
class OracleNode:
    type: str = ""
    descriptions: set = field(default_factory=set)
    source_ids: set = field(default_factory=set)


@dataclass
class OracleEdge:
    weight: float = 0.0
    descriptions: set = field(default_factory=set)
    source_ids: set = field(default_factory=set)


def parse_records_oracle(
    records_by_unit: list[tuple[str, str]],
) -> tuple[dict[str, OracleNode], dict[tuple[str, str], OracleEdge]]:
    """records_by_unit: (text_unit_id, records-string) pairs, pre-sorted by
    the caller into the pipeline's stable record order."""
    nodes: dict[str, OracleNode] = {}
    edges: dict[tuple[str, str], OracleEdge] = {}

    for unit_id, data in records_by_unit:
        for record in data.split(RECORD_DELIM):
            record = re.sub(r"^\(|\)$", "", record.strip())
            attrs = record.split(TUPLE_DELIM)
            if attrs[0] == '"entity"' and len(attrs) >= 4:
                name = clean_str(attrs[1].upper())
                etype = clean_str(attrs[2].upper())
                desc = clean_str(attrs[3])
                node = nodes.setdefault(name, OracleNode())
                node.descriptions.add(desc)
                node.source_ids.add(unit_id)
                if etype != "":
                    node.type = etype
            if attrs[0] == '"relationship"' and len(attrs) >= 5:
                src = clean_str(attrs[1].upper())
                tgt = clean_str(attrs[2].upper())
                desc = clean_str(attrs[3])
                try:
                    weight = float(attrs[-1])
                except ValueError:
                    weight = 1.0
                # reference-exact auto-create (reference :253-266): an
                # endpoint node is created — with the edge's provenance —
                # only when it is NOT already in the graph; edges touching
                # an existing node never add provenance
                for endpoint in (src, tgt):
                    if endpoint not in nodes:
                        n = nodes[endpoint] = OracleNode()
                        n.descriptions.add("")
                        n.source_ids.add(unit_id)
                key = (min(src, tgt), max(src, tgt))
                edge = edges.setdefault(key, OracleEdge())
                edge.weight += weight
                edge.descriptions.add(desc)
                edge.source_ids.add(unit_id)
    return nodes, edges


def render_description(descs: set) -> str:
    nonempty = sorted(d for d in descs if d != "")
    return "\n".join(nonempty if nonempty else sorted(descs))


def oracle_node_rows(nodes: dict[str, OracleNode]) -> list[dict]:
    return [
        {
            "title": name,
            "type": n.type,
            "description": render_description(n.descriptions),
            "source_id": sorted(n.source_ids),
        }
        for name, n in sorted(nodes.items())
    ]


def oracle_edge_rows(edges: dict[tuple[str, str], OracleEdge]) -> list[dict]:
    return [
        {
            "source": s,
            "target": t,
            "weight": e.weight,
            "description": "\n".join(sorted(e.descriptions)),
            "text_unit_ids": sorted(e.source_ids),
        }
        for (s, t), e in sorted(edges.items())
    ]


def triples(edges: dict[tuple[str, str], OracleEdge]) -> set[tuple[str, str, str]]:
    """(subj, pred, obj) set — the P/R comparison unit (BASELINE.md)."""
    out = set()
    for (s, t), e in edges.items():
        for pred in sorted(e.descriptions):
            out.add((s, pred, t))
    return out


def precision_recall(
    ours: set[tuple], reference: set[tuple]
) -> tuple[float, float]:
    if not ours or not reference:
        return (1.0 if ours == reference else 0.0,) * 2
    inter = len(ours & reference)
    return inter / len(ours), inter / len(reference)
