"""Q7/Q8 — local & global search CONTEXT dataflow (deterministic).

The reference's structured search wraps two dataflows around an LLM
call: LOCAL search assembles a mixed context for a query from mapped
entities (reference query/structured_search/local_search/
combine_context.py:80-224 — entity mapping → community reports →
entity/relationship tables → ranked text units, each section bounded by
a token-budget share), and GLOBAL search map-reduces over community
reports (global_search/community_context.py + search.py — rate each
report for the query, keep the best under a budget).  Per the north
rule the LLM calls are out of scope; everything UP TO the prompt — the
retrieval, ranking, budgeting, and table rendering — is the dataflow
re-expressed here, returning the final context string the LLM seam
would consume.

Determinism substitutions (documented):
- entity mapping uses the feature-hash name embeddings
  (operators/embedding.py) instead of a trained encoder;
- the global map phase's LLM usefulness rating becomes the count of
  distinct query terms present in the report content (score desc, rank
  desc ties) — a plain relevance heuristic with the same map-reduce
  shape.

Scale shape: every section is a join/groupBy keyed on entity or
community; budget packing is a running-sum window over each section's
candidate rows (bounded: top-k entities fan out to at most their
reports/units); final assembly crosses 1-row section frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

WS_TOKENS = r"\s+"


def _ws_count(c) -> F.Column:
    return F.size(F.filter(F.split(c, WS_TOKENS), lambda x: x != ""))


def _pack(df: DataFrame, order_cols: list, text_col: str, budget: int) -> DataFrame:
    """Greedy prefix under a ws-token budget in the given order — the
    reference's add-until-max_tokens loop as a running-sum window."""
    w = Window.orderBy(*order_cols).rowsBetween(Window.unboundedPreceding, 0)
    return (
        df.withColumn("__t", _ws_count(F.col(text_col)))
        .withColumn("__run", F.sum("__t").over(w))
        .filter(F.col("__run") <= budget)
    )


def _one_row_block(df: DataFrame, key_cols: list, line_col, header: str) -> DataFrame:
    """Collapse ordered lines into a single (block) row; empty input →
    empty block string.  ``key_cols`` must be plain ASCENDING sort keys
    (negate numeric columns for descending order) — they are packed into
    a struct for array_sort."""
    lined = df.select(F.struct(*key_cols).alias("__o"), line_col.alias("__l"))
    return lined.agg(
        F.concat(
            F.lit(header),
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__o", "__l"))), lambda s: s["__l"]
                ),
            ),
        ).alias("block"),
        F.count("*").cast("int").alias("n"),
    )


def local_search_context(
    query: str,
    nodes: DataFrame,
    degrees: DataFrame,
    edges_ranked: DataFrame,
    communities: DataFrame,
    reports: DataFrame,
    text_units: DataFrame,
    claims: DataFrame | None = None,
    top_k_entities: int = 10,
    top_k_relationships: int = 10,
    max_tokens: int = 8000,
    community_prop: float = 0.25,
    text_unit_prop: float = 0.5,
) -> DataFrame:
    """One-row context for a local-search query (reference
    combine_context.py:80-224 section order: Reports → Entities →
    Relationships → Claims → Sources)."""
    from .embedding import map_query_to_entities

    selected = map_query_to_entities(nodes, query, k=top_k_entities).select(
        "title", F.col("rk").alias("entity_order")
    )
    sel = F.broadcast(selected)

    community_budget = max(int(max_tokens * community_prop), 0)
    text_budget = max(int(max_tokens * text_unit_prop), 0)

    # Reports: communities containing a selected entity, rank desc
    sel_comms = (
        communities.join(sel, "title").select("community").distinct()
    )
    rep_rows = reports.join(sel_comms, "community").select(
        F.col("rank"), "community", F.col("full_content").alias("line")
    )
    rep_packed = _pack(rep_rows, [F.desc("rank"), F.asc("community")], "line", community_budget)
    rep_block = _one_row_block(
        rep_packed,
        [(-F.col("rank")).alias("k1"), F.col("community").alias("k2")],
        F.col("line"),
        "-----Reports-----\n",
    )

    # Entities: the mapped entities with degree, in mapping order
    ent_rows = selected.join(degrees, "title", "left").select(
        "entity_order",
        F.concat_ws(
            ",", F.col("title"), F.coalesce(F.col("degree"), F.lit(0)).cast("string")
        ).alias("line"),
    )
    ent_block = _one_row_block(
        ent_rows, [F.col("entity_order")], F.col("line"), "-----Entities-----\ntitle,degree\n"
    )

    # Relationships: in-network first (rank desc), then out-network by
    # (links desc, rank desc) — reference relationship ranking — capped
    # at top_k_relationships
    from .query import split_network_relationships

    in_net, out_net = split_network_relationships(edges_ranked, selected)
    rel = in_net.select(
        F.lit(0).alias("grp"), F.lit(0).alias("links"), "rank", "source", "target"
    ).unionByName(
        out_net.select(F.lit(1).alias("grp"), "links", "rank", "source", "target")
    )
    w_rel = Window.orderBy(
        F.asc("grp"), F.desc("links"), F.desc("rank"), F.asc("source"), F.asc("target")
    )
    rel_rows = (
        rel.withColumn("rel_rk", F.row_number().over(w_rel))
        .filter(F.col("rel_rk") <= top_k_relationships)
        .select(
            "rel_rk",
            F.concat_ws(",", "source", "target", F.col("rank").cast("string")).alias("line"),
        )
    )
    rel_block = _one_row_block(
        rel_rows, [F.col("rel_rk")], F.col("line"), "-----Relationships-----\nsource,target,rank\n"
    )

    blocks = [rep_block, ent_block, rel_block]

    if claims is not None:
        cl_rows = claims.join(
            sel.select(F.col("title").alias("subject_id")), "subject_id"
        ).select(
            "subject_id",
            F.concat_ws(",", "subject_id", "claim_type", "object_id").alias("line"),
        )
        blocks.append(
            _one_row_block(
                cl_rows, [F.col("subject_id")], F.col("line"),
                "-----Claims-----\nsubject,type,object\n",
            )
        )

    # Sources: units of selected entities ordered (entity_order asc,
    # relationship-count desc, id) packed under the text budget
    # (reference _build_text_unit_context:230-274)
    tue = nodes.select("title", F.explode("source_id").alias("text_unit_id"))
    unit_sel = (
        tue.join(sel, "title")
        .groupBy("text_unit_id")
        .agg(
            F.min("entity_order").alias("entity_order"),
            F.count("*").alias("n_rel"),
        )
    )
    unit_rows = unit_sel.join(
        text_units.select(F.col("id").alias("text_unit_id"), "chunk"), "text_unit_id"
    ).select("entity_order", "n_rel", "text_unit_id", F.col("chunk").alias("line"))
    unit_packed = _pack(
        unit_rows,
        [F.asc("entity_order"), F.desc("n_rel"), F.asc("text_unit_id")],
        "line",
        text_budget,
    )
    blocks.append(
        _one_row_block(
            unit_packed,
            [
                F.col("entity_order").alias("k1"),
                (-F.col("n_rel")).alias("k2"),
                F.col("text_unit_id").alias("k3"),
            ],
            F.col("line"),
            "-----Sources-----\n",
        )
    )

    out = None
    names = ["reports", "entities", "relationships"] + (
        ["claims"] if claims is not None else []
    ) + ["sources"]
    for name, b in zip(names, blocks):
        b = b.select(
            F.col("block").alias(f"{name}_block"), F.col("n").alias(f"n_{name}")
        )
        out = b if out is None else out.crossJoin(b)
    ctx = F.concat_ws(
        "\n\n", *[F.col(f"{n}_block") for n in names]
    )
    return out.select(
        F.lit(query).alias("query"),
        *[F.col(f"n_{n}") for n in names],
        ctx.alias("context_string"),
        _ws_count(ctx).cast("int").alias("context_tokens"),
    )


def global_search_context(
    query: str,
    reports: DataFrame,
    max_tokens: int = 8000,
    min_score: int = 1,
) -> DataFrame:
    """Global-search map-reduce over community reports (reference
    global_search/search.py): MAP rates every report for the query —
    deterministically, the number of DISTINCT query terms present in the
    report content — and REDUCE keeps reports with score ≥ min_score,
    ordered (score desc, rank desc, community), packed under the token
    budget.  Output: one row per kept report (so the map scores stay
    inspectable) plus the packed flag."""
    terms = [t for t in {w.upper() for w in query.split()} if t]
    score = sum(
        (F.when(F.upper("full_content").contains(t), 1).otherwise(0) for t in terms),
        start=F.lit(0),
    )
    scored = reports.select(
        "community",
        "rank",
        F.col("summary"),
        score.cast("int").alias("score"),
        _ws_count(F.col("summary")).alias("__t"),
    ).filter(F.col("score") >= min_score)
    # Two-phase distributed prefix sum instead of a partitionless window:
    # unlike the local-search packers (inputs pre-bounded to the selected
    # entities' neighborhoods), this runs over EVERY community report —
    # millions of rows at corpus scale — and every row stays in the
    # output (the in_context flag, not a top-k, is the contract), so the
    # single-task global sort had no row bound.  (score desc, rank desc,
    # community) is a total order: desc expressed by negation.
    from .graphops import with_running_sum

    # NULL-rank handling matches the window this replaced (desc → nulls
    # LAST): coalesce to -inf so -rank = +inf sorts last under asc.
    # rank is double — negate, don't cast (fractional ranks).
    run = with_running_sum(
        scored.withColumn("__ns", (-F.col("score")).cast("int")).withColumn(
            "__nr", -F.coalesce(F.col("rank"), F.lit(float("-inf")))
        ),
        ["__ns", "__nr", "community"],
        "__t",
        out_col="__run",
    )
    return (
        run.withColumn("in_context", F.col("__run") <= max_tokens)
        .select(
            F.lit(query).alias("query"),
            "community",
            "score",
            "rank",
            "summary",
            "in_context",
        )
    )
