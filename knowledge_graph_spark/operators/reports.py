"""Community report preparation & generation (reference §2.8, R1-R13).

The reference builds per-community LLM reports from a token-budgeted
"local context" of member entities/edges/claims (reference
verbs/community_summarization/prepare_report/*, graph/community_reports/*).
Per the north rule, LLM report generation is replaced with deterministic
community summaries rendered from the same context tables; the LLM seam
remains where ``render_report`` is applied.

Operators (reference analogue in parens):
- node/edge context frames (R1/R2 community_nodes.py:16-58,
  community_edges.py:20-65): joins + coalesce('No Description').
- edge combined degree (R3 compute_edge_degree.py:11-54): in graphops.
- get_levels / level filters (R5/R6 utils.py:26-53).
- local context (R7/R8 community_reports.py:57-186, sort_context.py:
  10-155): per-community top-K entities by (degree desc, title) and
  edges by (rank desc, source, target) rendered as the reference's
  "-----Entities----- / -----Relationships-----" CSV blocks.
- community hierarchy (R10 community_hierachy.py:13-74): node-set
  containment between adjacent levels.
- report generation (R13 summarization.py:32-120): deterministic
  rendering; rank = sum of member edge weights (size-weighted salience
  replacing the LLM rating).

Scale: everything is joins/groupBys keyed on community id; the only
windows are per-community top-K (bounded output).  Context rendering is
string_agg over ≤K rows per community — no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NO_DESCRIPTION = "No Description"  # reference community_nodes.py fillna
DEFAULT_TOP_K = 10


def node_context(nodes: DataFrame, degrees: DataFrame, communities: DataFrame) -> DataFrame:
    """R1: (title, type, description, degree, community)."""
    return (
        nodes.join(degrees, "title", "left")
        .join(communities, "title", "left")
        .select(
            "title",
            "type",
            F.coalesce(
                F.when(F.col("description") != "", F.col("description")), F.lit(NO_DESCRIPTION)
            ).alias("description"),
            F.coalesce("degree", F.lit(0)).alias("degree"),
            F.col("community"),
        )
    )


def edge_context(edges_ranked: DataFrame, communities: DataFrame) -> DataFrame:
    """R2+R6: edges whose BOTH endpoints share a community, stamped with
    it (reference at_level keeps edges with both ends in the node set)."""
    cs = communities.select(F.col("title").alias("source"), F.col("community").alias("__cs"))
    ct = communities.select(F.col("title").alias("target"), F.col("community").alias("__ct"))
    return (
        edges_ranked.join(cs, "source")
        .join(ct, "target")
        .filter(F.col("__cs") == F.col("__ct"))
        .withColumn("community", F.col("__cs"))
        .drop("__cs", "__ct")
    )


def get_levels(communities: DataFrame) -> list[int]:
    """R5: distinct levels, deepest first (reference utils.py:26-29)."""
    return [
        r.level
        for r in communities.select("level").distinct().orderBy(F.desc("level")).collect()
    ]


def claim_context(claims: DataFrame, communities: DataFrame) -> DataFrame:
    """R4: claims stamped with their subject entity's community
    (reference community_claims.py:17-43 builds claim_details per
    community; membership is by subject)."""
    m = communities.select(F.col("title").alias("subject_id"), "community")
    return claims.join(m, "subject_id").select(
        "community", "subject_id", "object_id", "claim_type", "status", "description"
    )


def community_local_context(
    nodes_ctx: DataFrame,
    edges_ctx: DataFrame,
    top_k: int = DEFAULT_TOP_K,
    claims_ctx: DataFrame | None = None,
) -> DataFrame:
    """R7/R8: per community, rendered context of the top-K entities
    (degree desc, title) and top-K edges (rank desc, source, target) in
    the reference's sectioned-CSV shape, plus counts and weight mass."""
    wn = Window.partitionBy("community").orderBy(F.desc("degree"), F.asc("title"))
    top_nodes = nodes_ctx.withColumn("rk", F.row_number().over(wn)).filter(F.col("rk") <= top_k)
    ent_block = top_nodes.groupBy("community").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("rk"), F.col("title"), F.col("type"), F.col("degree")))
                ),
                lambda s: F.concat_ws(",", s["title"], s["type"], s["degree"].cast("string")),
            ),
        ).alias("entity_rows"),
        F.count("*").cast("int").alias("n_top_entities"),
        F.min_by("title", "rk").alias("top_entity"),
        F.min_by("degree", "rk").cast("int").alias("top_entity_degree"),
    )
    we = Window.partitionBy("community").orderBy(F.desc("rank"), F.asc("source"), F.asc("target"))
    top_edges = edges_ctx.withColumn("rk", F.row_number().over(we)).filter(F.col("rk") <= top_k)
    edge_block = top_edges.groupBy("community").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("rk"), F.col("source"), F.col("target"), F.col("rank"))
                    )
                ),
                lambda s: F.concat_ws(",", s["source"], s["target"], s["rank"].cast("string")),
            ),
        ).alias("edge_rows"),
        F.count("*").cast("int").alias("n_top_edges"),
        F.min_by("source", "rk").alias("top_edge_source"),
        F.min_by("target", "rk").alias("top_edge_target"),
        F.min_by("rank", "rk").cast("int").alias("top_edge_rank"),
    )
    sizes = nodes_ctx.groupBy("community").agg(F.count("*").cast("int").alias("n_entities"))
    mass = edges_ctx.groupBy("community").agg(
        F.sum("weight").cast("double").alias("weight_mass"),
        F.count("*").cast("int").alias("n_edges"),
    )
    joined = (
        sizes.join(ent_block, "community", "left")
        .join(edge_block, "community", "left")
        .join(mass, "community", "left")
    )
    claim_block_col = F.lit("")
    if claims_ctx is not None:
        wc = Window.partitionBy("community").orderBy(
            F.asc("subject_id"), F.asc("claim_type"), F.asc("object_id")
        )
        top_claims = claims_ctx.withColumn("rk", F.row_number().over(wc)).filter(
            F.col("rk") <= top_k
        )
        claim_block = top_claims.groupBy("community").agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("rk"),
                                F.col("subject_id"),
                                F.col("claim_type"),
                                F.col("object_id"),
                            )
                        )
                    ),
                    lambda s: F.concat_ws(
                        ",", s["subject_id"], s["claim_type"], s["object_id"]
                    ),
                ),
            ).alias("claim_rows"),
        )
        joined = joined.join(claim_block, "community", "left")
        claim_block_col = F.concat(
            F.lit("\n-----Claims-----\nsubject,type,object\n"),
            F.coalesce("claim_rows", F.lit("")),
        )
    ctx = joined.select(
        "community",
        "n_entities",
        F.coalesce("n_edges", F.lit(0)).alias("n_edges"),
        F.coalesce("weight_mass", F.lit(0.0)).alias("weight_mass"),
        "top_entity",
        F.coalesce("top_entity_degree", F.lit(0)).alias("top_entity_degree"),
        "top_edge_source",
        "top_edge_target",
        "top_edge_rank",
        F.concat(
            F.lit("-----Entities-----\ntitle,type,degree\n"),
            F.coalesce("entity_rows", F.lit("")),
            F.lit("\n-----Relationships-----\nsource,target,rank\n"),
            F.coalesce("edge_rows", F.lit("")),
            claim_block_col,
        ).alias("context_string"),
    )
    return ctx


def _json_esc(c) -> F.Column:
    """Escape a string column for embedding in a JSON string literal.
    Backslash, quote, newline are the only specials the deterministic
    renderer can produce; mirrored verbatim in the SQL oracle."""
    c = F.replace(c, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit('"'), F.lit('\\"'))
    return F.replace(c, F.lit("\n"), F.lit("\\n"))


def render_reports(context: DataFrame, level: int = 0) -> DataFrame:
    """R13 (deterministic replacement): one report row per community with
    the reference's FULL record shape (reference
    verbs/community_summarization/typing.py:8-18): id, community, title,
    summary, full_content, full_content_json, rank, rank_explanation,
    findings[{summary, explanation}], level, human_readable_id.

    rank = weight_mass (edge-weight salience); findings are derived
    deterministically from the context's top entity and top edge.  An
    LLM backend would map ``context_string`` → {title, summary, rating,
    rating_explanation, findings} here instead
    (community_reports_extractor.py:45-79; graph_intelligence/run.py:46-56
    assembles the record, full_content_json = json.dumps(report))."""
    from .graphops import with_global_index

    rank_col = F.col("weight_mass")
    title_col = F.concat(F.lit("Community "), F.col("community"))
    summary_col = F.concat(
        F.lit("Community of "),
        F.col("n_entities").cast("string"),
        F.lit(" entities with "),
        F.col("n_edges").cast("string"),
        F.lit(" internal relationships (weight "),
        F.col("weight_mass").cast("string"),
        F.lit(")"),
    )
    rank_expl_col = F.concat(
        F.lit("Rank "),
        F.col("weight_mass").cast("string"),
        F.lit(" = sum of internal relationship weights"),
    )
    f1 = F.when(
        F.col("top_entity").isNotNull(),
        F.struct(
            F.concat(F.lit("Dominant entity: "), F.col("top_entity")).alias("summary"),
            F.concat(
                F.col("top_entity"),
                F.lit(" has the highest degree ("),
                F.col("top_entity_degree").cast("string"),
                F.lit(") among "),
                F.col("n_entities").cast("string"),
                F.lit(" community members"),
            ).alias("explanation"),
        ),
    )
    f2 = F.when(
        F.col("top_edge_source").isNotNull(),
        F.struct(
            F.concat(
                F.lit("Strongest relationship: "),
                F.col("top_edge_source"),
                F.lit(" -> "),
                F.col("top_edge_target"),
            ).alias("summary"),
            F.concat(
                F.lit("Combined endpoint degree "),
                F.col("top_edge_rank").cast("string"),
                F.lit(" tops the community's "),
                F.col("n_edges").cast("string"),
                F.lit(" internal relationships"),
            ).alias("explanation"),
        ),
    )
    findings_col = F.array_compact(F.array(f1, f2))
    findings_json = F.concat_ws(
        ", ",
        F.transform(
            findings_col,
            lambda f: F.concat(
                F.lit('{"summary": "'),
                _json_esc(f["summary"]),
                F.lit('", "explanation": "'),
                _json_esc(f["explanation"]),
                F.lit('"}'),
            ),
        ),
    )
    rendered = context.select(
        F.sha2(F.col("community"), 256).alias("id"),
        "community",
        title_col.alias("title"),
        summary_col.alias("summary"),
        F.concat(
            F.lit("# Community "),
            F.col("community"),
            F.lit("\n\n"),
            F.col("context_string"),
        ).alias("full_content"),
        F.concat(
            F.lit('{"title": "'),
            _json_esc(title_col),
            F.lit('", "summary": "'),
            _json_esc(summary_col),
            F.lit('", "rating": '),
            rank_col.cast("string"),
            F.lit(', "rating_explanation": "'),
            _json_esc(rank_expl_col),
            F.lit('", "findings": ['),
            findings_json,
            F.lit("]}"),
        ).alias("full_content_json"),
        rank_col.alias("rank"),
        rank_expl_col.alias("rank_explanation"),
        findings_col.alias("findings"),
        F.lit(level).alias("level"),
    )
    return with_global_index(rendered, [F.desc("rank"), F.asc("community")])


def build_mixed_context(
    parent_ctx: DataFrame,
    hierarchy: DataFrame,
    sub_ctx: DataFrame,
    sub_reports: DataFrame,
    max_tokens: int = 8000,
) -> DataFrame:
    """R11/R12: when a parent community's local context exceeds the
    token budget, greedily substitute its largest sub-communities' local
    contexts with their (shorter) report summaries until the mix fits;
    if even all-summaries overflows, pack summaries largest-first up to
    the budget (reference build_mixed_context.py:12-68 /
    pre_community_report_context.py:22-74, deterministically re-rendered).

    Inputs: parent_ctx/sub_ctx from ``community_local_context``;
    hierarchy from ``community_hierarchy``; sub_reports from
    ``render_reports`` on the sub level.  Output: (community,
    mixed_context, context_tokens, exceeds_budget, n_substituted).

    The greedy fold is a pure function of one community's sub list →
    Arrow-batched UDF; everything around it is joins keyed on community.
    """
    import pandas as pd
    from pyspark.sql import types as T

    subs = (
        hierarchy.select("community", "sub_community")
        .join(
            sub_ctx.select(
                F.col("community").alias("sub_community"),
                F.col("context_string").alias("sub_context"),
            ),
            "sub_community",
        )
        .join(
            sub_reports.select(
                F.col("community").alias("sub_community"),
                F.col("summary").alias("sub_summary"),
            ),
            "sub_community",
        )
    )
    grouped = subs.groupBy("community").agg(
        F.array_sort(
            F.collect_list(F.struct("sub_community", "sub_context", "sub_summary"))
        ).alias("subs")
    )
    joined = parent_ctx.join(grouped, "community", "left")

    out_t = T.StructType(
        [
            T.StructField("mixed_context", T.StringType()),
            T.StructField("context_tokens", T.IntegerType()),
            T.StructField("exceeds_budget", T.BooleanType()),
            T.StructField("n_substituted", T.IntegerType()),
        ]
    )

    def _wc(s: str) -> int:
        return len(s.split())

    @F.pandas_udf(out_t)
    def mix(ctx, subs_col):  # (pd.Series, pd.Series) -> pd.DataFrame[out_t]
        rows = []
        for context, sub_list in zip(ctx, subs_col):
            if context is None:
                context = ""
            if _wc(context) <= max_tokens or sub_list is None or len(sub_list) == 0:
                rows.append((context, _wc(context), _wc(context) > max_tokens, 0))
                continue
            parts = [
                {"id": s["sub_community"], "text": s["sub_context"], "summary": s["sub_summary"]}
                for s in sub_list
            ]
            # substitute largest local contexts first (size desc, id asc)
            order = sorted(parts, key=lambda p: (-_wc(p["text"]), p["id"]))
            substituted: set = set()

            def render() -> str:
                out = []
                for p in parts:
                    if p["id"] in substituted:
                        out.append(f"Report {p['id']}: {p['summary']}")
                    else:
                        out.append(p["text"])
                return "\n".join(out)

            mixed = render()
            for p in order:
                if _wc(mixed) <= max_tokens:
                    break
                substituted.add(p["id"])
                mixed = render()
            if _wc(mixed) > max_tokens:
                # reports-only fallback, packed until the budget
                packed, total = [], 0
                for p in order:
                    line = f"Report {p['id']}: {p['summary']}"
                    if total + _wc(line) > max_tokens:
                        break
                    packed.append(line)
                    total += _wc(line)
                mixed = "\n".join(packed)
            rows.append(
                (mixed, _wc(mixed), _wc(mixed) > max_tokens, len(substituted))
            )
        return pd.DataFrame(
            rows, columns=["mixed_context", "context_tokens", "exceeds_budget", "n_substituted"]
        )

    mixed = joined.withColumn("m", mix(F.col("context_string"), F.col("subs")))
    return mixed.select(
        "community",
        F.col("m.mixed_context").alias("mixed_context"),
        F.col("m.context_tokens").alias("context_tokens"),
        F.col("m.exceeds_budget").alias("exceeds_budget"),
        F.col("m.n_substituted").alias("n_substituted"),
    )


def leveled_reports(
    nodes: DataFrame,
    degrees: DataFrame,
    edges_ranked: DataFrame,
    communities_leveled: DataFrame,
    claims: DataFrame | None = None,
    max_tokens: int = 8000,
    top_k: int = DEFAULT_TOP_K,
) -> DataFrame:
    """Level-ordered report generation, deepest first, with mixed-context
    substitution — the reference's headline hierarchical flow (reference
    verbs/community_summarization/summarization.py level loop +
    pre_community_report_context.py:22-74): generate the deepest level's
    reports from local context, then for each shallower level substitute
    oversized parents' context with their largest sub-communities'
    report summaries via ``build_mixed_context``.

    Output: one report row per community per level (render_reports shape
    + mixed-context diagnostics context_tokens / exceeds_budget /
    n_substituted; 0-defaults at the deepest level).  Community ids are
    globally unique across levels (deeper labels are parent-qualified),
    so per-level frames union cleanly.
    """
    levels = get_levels(communities_leveled)  # deepest first (R5)
    hier = community_hierarchy(communities_leveled)
    sub_ctx: DataFrame | None = None
    sub_reports: DataFrame | None = None
    out: DataFrame | None = None
    for lvl in levels:
        comm = communities_leveled.filter(F.col("level") == lvl).select(
            "title", "community"
        )
        nctx = node_context(nodes, degrees, comm).filter(F.col("community").isNotNull())
        ectx = edge_context(edges_ranked, comm)
        cctx = community_local_context(
            nctx,
            ectx,
            top_k=top_k,
            claims_ctx=claim_context(claims, comm) if claims is not None else None,
        )
        if sub_reports is not None:
            mixed = build_mixed_context(
                cctx, hier.filter(F.col("level") == lvl), sub_ctx, sub_reports,
                max_tokens=max_tokens,
            )
            render_in = (
                cctx.join(mixed.select(
                    "community", "mixed_context", "context_tokens",
                    "exceeds_budget", "n_substituted",
                ), "community", "left")
                .withColumn(
                    "context_string",
                    F.coalesce("mixed_context", "context_string"),
                )
                .drop("mixed_context")
            )
        else:
            # deepest level: no sub-reports to substitute (reference
            # trims; our top-K context is budget-bounded by construction)
            render_in = (
                cctx.withColumn(
                    "context_tokens",
                    F.size(F.split("context_string", r"\s+")).cast("int"),
                )
                .withColumn("exceeds_budget", F.col("context_tokens") > max_tokens)
                .withColumn("n_substituted", F.lit(0).cast("int"))
            )
        rep = render_reports(render_in, level=lvl).join(
            render_in.select(
                "community", "context_tokens", "exceeds_budget", "n_substituted"
            ),
            "community",
        )
        out = rep if out is None else out.unionByName(rep)
        sub_ctx, sub_reports = cctx, rep
    if out is None:
        raise ValueError("communities_leveled has no levels")
    return out


def community_hierarchy(communities_leveled: DataFrame) -> DataFrame:
    """R10: (community, level, sub_community, sub_size) — a next-level
    community is a sub-community iff its node set is contained in the
    parent's (reference checks issubset; here: member-join count ==
    sub-community size)."""
    a = communities_leveled.select("title", F.col("community").alias("parent"), "level")
    b = communities_leveled.select(
        "title", F.col("community").alias("sub_community"), F.col("level").alias("sub_level")
    )
    joined = a.join(b, "title").filter(F.col("sub_level") == F.col("level") + 1)
    sub_sizes = (
        communities_leveled.groupBy(F.col("community").alias("sub_community"), "level")
        .agg(F.count("*").alias("sub_size"))
        .withColumnRenamed("level", "sub_level")
    )
    overlap = joined.groupBy("parent", "level", "sub_community").agg(
        F.count("*").alias("overlap")
    )
    return (
        overlap.join(sub_sizes, ["sub_community"])
        .filter(F.col("overlap") == F.col("sub_size"))
        .select(
            F.col("parent").alias("community"),
            "level",
            "sub_community",
            F.col("sub_size").cast("int").alias("sub_community_size"),
        )
    )
