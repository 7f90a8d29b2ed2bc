"""knowledge_graph_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch rebuild of the semantics of the reference GraphRAG-style
indexing pipeline (DucHungGithub/knowledge_graph): multi-turn transcript
ingestion → stable-ordered per-conversation text assembly → token chunking →
batched (vectorized) mention / triple / claim extraction → entity linking and
canonicalization → weighted deduplicated node/edge tables → community
detection (label propagation) → deterministic community summaries → tabular
export — expressed entirely as Spark DataFrame transformations with
Arrow-vectorized pandas UDFs for the non-relational kernels.

Design goals (see SURVEY.md):
- DataFrame/Catalyst-first: every relational step is a declarative plan so
  predicate pushdown, column pruning, broadcast selection and AQE apply.
- Scale-first: explicit repartition by hash(conv_id) before extraction,
  salted two-phase aggregation on skewed entity names, canonical
  (least, greatest) edge keys, checkpointed stage boundaries.
- Determinism: content-hash ids, array_sort before every concat_ws,
  explicit orderBy for any row_number — no reliance on shuffle order.
"""

__version__ = "0.1.0"
