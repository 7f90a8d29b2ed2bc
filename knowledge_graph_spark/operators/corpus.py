"""Corpus assembly operators for training-data pipelines: deterministic
weighted mixing and sequence packing.

Pretraining corpora are BUILT, not just filtered: sources are re-weighted
(sample web text down, books up; rebalance languages) and documents are
packed into fixed-token-budget training sequences.  Both operators here
are closed-form deterministic — no RNG state — so runs are reproducible,
resumable shards agree, and a SQL oracle reproduces every row:

- **weighted_sample**: per-document uniform key in [0, 1) from the
  int64-safe affine hash family (functions/hashing.py) on the doc id;
  keep iff key < the stratum's rate.  One broadcast join against the
  tiny rates table + a narrow filter — fused into the scan, no shuffle.
- **pack_sequences**: documents are hashed into ``buckets`` independent
  packing streams; within a bucket (ordered by id) a running token sum
  assigns ``seq_id = floor((cumsum - n_tokens) / target)`` — the
  standard greedy offset packer (a document starting inside a sequence's
  budget joins it; one doc may straddle the boundary, the streaming
  packer's usual overflow rule).  One window per bucket — embarrassingly
  parallel across buckets, so the packer scales with the corpus while
  staying bit-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import FP_MOD, HASH_A, HASH_B, HASH_C, HASH_M31
from ..partitioning import widen

KEY_SCALE = 1_000_000  # sample keys reported as micro-units for exact compare


def salt_ab(salt: int) -> tuple[int, int]:
    """(a, b) affine coefficients for the salted key family:
    a = (HASH_A·(salt+1)) mod M31, b = (HASH_B·salt + HASH_C) mod M31.
    salt 0 reproduces the original (HASH_A, HASH_C) key.  Every sampling
    operator draws a DISTINCT salt so their keep/priority/split decisions
    are decorrelated: with one shared key, stratum_cap keeps exactly the
    smallest split keys per stratum and (for small caps) nearly all
    survivors land in 'test'/'val' — observed and flagged in round 2.
    a < 2^31 and x < FP_MOD = 2^30 → a·x + b < 2^62: int64-safe."""
    return (HASH_A * (salt + 1)) % HASH_M31, (HASH_B * salt + HASH_C) % HASH_M31


# fixed operator salts (documented here, mirrored in the gate oracles)
SALT_SAMPLE = 0  # weighted_sample / corpus mix
SALT_CAP = 1  # stratum_cap reservoir priority
SALT_SPLIT = 2  # hash_split / leak-free split


def sample_key(id_col: F.Column, salt: int = SALT_SAMPLE) -> F.Column:
    """Deterministic uniform key in [0, 1): salted affine hash of the id
    over the Mersenne-31 modulus.  id is first reduced mod FP_MOD so the
    product stays < 2^62 on every engine (int64-safe)."""
    a, b = salt_ab(salt)
    x = F.pmod(id_col.cast("long"), F.lit(FP_MOD))
    h = F.pmod(F.lit(a).cast("long") * x + F.lit(b), F.lit(HASH_M31))
    return h.cast("double") / F.lit(float(HASH_M31))


def weighted_sample(
    docs: DataFrame,
    rates: DataFrame,
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep each document with its stratum's probability, deterministically.

    ``rates``: (strata_col, rate) — small, broadcast.  Strata missing
    from the table default to rate 1.0 (kept).  Adds ``key_micro``
    (floor(key * 1e6)) so two engines can compare the decision margin
    exactly."""
    r = F.broadcast(rates.select(strata_col, "rate"))
    key = sample_key(F.col(id_col))
    return (
        docs.join(r, strata_col, "left")
        .withColumn("rate", F.coalesce(F.col("rate"), F.lit(1.0)))
        .filter(key < F.col("rate"))
        .withColumn("key_micro", F.floor(key * KEY_SCALE).cast("bigint"))
    )


def stratum_cap(
    docs: DataFrame,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    k: int = 100,
) -> DataFrame:
    """Keep exactly min(k, |stratum|) rows per stratum — the per-source
    cap every web-scale mixer applies ("at most k docs per domain") and,
    equivalently, a deterministic reservoir sample: with a uniform race
    key replacing the RNG (Efraimidis-Spirakis with unit weights), the k
    smallest keys per stratum are a uniform k-subset, and membership is
    reproducible across engines, re-runs, and resumes — unlike
    ``df.sampleBy``, whose output moves when partitioning does.

    Scale shape: priority is the affine integer hash at its OWN salt
    (SALT_CAP — decorrelated from hash_split/weighted_sample so the cap
    survivors are not biased toward one split; kept unscaled so
    collisions need id collisions mod FP_MOD; id tiebreak covers even
    those).  The
    ``row_number() ≤ k`` filter triggers Spark's rank-limit pushdown
    (WindowGroupLimit): each map partition pre-prunes to its local top-k
    per stratum BEFORE the shuffle, so a hot stratum ships
    O(k · n_input_partitions) rows, never its population — the window
    analogue of map-side partial aggregation (asserted in
    tests/test_physical_plans.py).  Adds (pri, rk)."""
    cap_a, cap_b = salt_ab(SALT_CAP)
    x = F.pmod(F.col(id_col).cast("long"), F.lit(FP_MOD))
    pri = F.pmod(F.lit(cap_a).cast("long") * x + F.lit(cap_b), F.lit(HASH_M31))
    w = Window.partitionBy(strata_col).orderBy("pri", id_col)
    return (
        docs.withColumn("pri", pri.cast("bigint"))
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k)
    )


def pack_sequences(
    docs: DataFrame,
    token_col: str = "n_tokens",
    target_tokens: int = 2048,
    buckets: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every document to a training sequence:
    (id, bucket, seq_id, start_offset).  ``buckets`` independent greedy
    packing streams (hash-partitioned) — the window sort is per bucket,
    never global, so the packer has no single-partition stage."""
    x = F.pmod(F.col(id_col).cast("long"), F.lit(FP_MOD))
    bucket = F.pmod(
        F.pmod(F.lit(HASH_A).cast("long") * x + F.lit(HASH_C), F.lit(HASH_M31)),
        F.lit(buckets),
    ).cast("int")
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w)
    return (
        docs.withColumn("bucket", bucket)
        .withColumn("start_offset", (cum - F.col(token_col)).cast("bigint"))
        .withColumn(
            "seq_id",
            F.floor(F.col("start_offset") / F.lit(target_tokens)).cast("bigint"),
        )
        .select(id_col, token_col, "bucket", "seq_id", "start_offset")
    )


def unigram_counts(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Corpus unigram table: (token, cnt) over normalized whitespace
    tokens.  One explode + one groupBy; partial aggregation collapses the
    hot head of the Zipf curve map-side, so the shuffle carries roughly
    |vocab| rows per input partition, not |corpus| rows."""
    from ..functions.textqc import normalized_text, ws_tokens_col

    return (
        widen(docs).select(
            F.explode(ws_tokens_col(normalized_text(F.col(text_col)))).alias("token")
        )
        .groupBy("token")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def familiarity_profile(
    docs: DataFrame,
    counts: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Corpus-derived unigram language-model score per document — the
    classic pretraining quality signal (CCNet / Gopher style) computed
    WITHOUT an external model: documents made of corpus-frequent tokens
    score high, documents of corpus-singletons score low.

    All outputs are exact integers so the DuckDB oracle matches
    bit-for-bit: per token occurrence the score contribution is
    floor(log2(cnt)) computed as ``length(bin(cnt)) - 1`` (pure integer
    bit-length — no libm, no cross-engine log rounding), summed over the
    document.

    Returns (doc_id, n_tokens, n_distinct, n_rare, familiarity_bits,
    mean_bits_micro):
      - n_rare: occurrences of corpus-singleton tokens (cnt == 1),
      - familiarity_bits: sum of floor(log2(cnt)) over occurrences,
      - mean_bits_micro: floor(1e6 * familiarity_bits / n_tokens).

    Scale shape: per-(doc, token) occurrence counts are reduced FIRST
    (shuffle key includes doc_id — no hot-token skew), then joined to the
    vocab table on token.  The vocab is Zipf-bounded (millions of rows at
    100 TB, not billions) — broadcast by default; ``broadcast_vocab=
    False`` falls back to a shuffled join where AQE's skew split handles
    the stop-word head."""
    from ..functions.textqc import normalized_text, ws_tokens_col

    vocab = counts.select("token", "cnt")
    if broadcast_vocab:
        vocab = F.broadcast(vocab)
    occ = (
        widen(docs).select(
            F.col(id_col).alias("doc_id"),
            F.explode_outer(
                ws_tokens_col(normalized_text(F.col(text_col)))
            ).alias("token"),
        )
        .groupBy("doc_id", "token")
        .agg(F.count(F.col("token")).cast("bigint").alias("c"))
    )
    bits = (F.length(F.bin(F.col("cnt"))) - 1).cast("bigint")
    scored = occ.join(vocab, "token", "left").groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("token").isNull(), 0).otherwise(1))
        .cast("bigint")
        .alias("n_distinct"),
        F.sum(F.when(F.col("cnt") == 1, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("n_rare"),
        F.sum(F.coalesce(F.col("c") * bits, F.lit(0)))
        .cast("bigint")
        .alias("familiarity_bits"),
    )
    mean = F.when(F.col("n_tokens") == 0, F.lit(0.0)).otherwise(
        F.col("familiarity_bits").cast("double")
        * 1_000_000
        / F.col("n_tokens").cast("double")
    )
    return scored.select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        "n_distinct",
        "n_rare",
        "familiarity_bits",
        F.floor(mean).cast("bigint").alias("mean_bits_micro"),
    )


def hash_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    val_frac: float = 0.05,
    test_frac: float = 0.05,
) -> DataFrame:
    """Deterministic train/val/test assignment — adds (split, key_micro).

    The standard training-corpus splitter: the same closed-form uniform
    key FAMILY as weighted_sample at its own salt (SALT_SPLIT — the
    split decision must be independent of cap priority and sample keep;
    affine hash over M31 — no RNG, no seed state, so assignment is
    stable under re-runs, resumes, and engine changes; a document NEVER
    migrates between splits when the corpus grows, unlike randomSplit).
    Thresholds: key < test_frac → test, < test_frac+val_frac → val, else
    train.  Pure Column algebra, zero shuffle — the split column is
    computed in the scan stage.
    """
    key = sample_key(F.col(id_col), salt=SALT_SPLIT)
    split = (
        F.when(key < F.lit(test_frac), F.lit("test"))
        .when(key < F.lit(test_frac + val_frac), F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return docs.withColumn("split", split).withColumn(
        "key_micro", F.floor(key * KEY_SCALE).cast("bigint")
    )


def length_profile(
    profile: DataFrame,
    strata_col: str = "lang",
    n_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum exact token-length order statistics →
    (stratum, n_docs, p50, p90, max_tokens).

    Batch-size planning / outlier detection for a training corpus.  The
    percentiles are EXACT order statistics (element at integer index
    floor((n-1)·q), ties broken by id) — not an approximate sketch — so
    two engines agree bit-for-bit; the index arithmetic is pure int64.
    One shuffle (window by stratum) + a map-side-combinable aggregate.
    At 100 TB the per-stratum sort is the cost: strata are languages
    (dozens), so the window parallelizes across them; for a single giant
    stratum switch to percentile_approx and drop the oracle claim.
    """
    w = Window.partitionBy(strata_col).orderBy(F.col(n_col).asc(), F.col(id_col).asc())
    ranked = profile.select(
        strata_col,
        F.col(n_col).cast("bigint").alias("n"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy(strata_col)).alias("cnt"),
    )
    # exact integer index: ((cnt-1)*num) div den — Spark `div` ≡ DuckDB `//`
    at = lambda q_num, q_den: F.max(  # noqa: E731
        F.when(
            F.col("rn") == F.expr(f"((cnt - 1) * {q_num}) div {q_den}") + 1,
            F.col("n"),
        )
    )
    return ranked.groupBy(strata_col).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        at(5, 10).alias("p50"),
        at(9, 10).alias("p90"),
        F.max("n").alias("max_tokens"),
    )


def build_vocab(docs: DataFrame, text_col: str = "text", min_count: int = 1) -> DataFrame:
    """Tokenizer-style vocabulary table: (token, cnt, token_id) with ids
    dense in (cnt DESC, token ASC) order — the conventional
    frequency-ranked id assignment of BPE/WordPiece vocab files.

    The id comes from ``graphops.with_global_index`` (two-phase
    range-partitioned numbering), so no stage funnels the vocab through
    a single task even at a 10^8-token vocabulary.
    """
    from .graphops import with_global_index

    counts = unigram_counts(docs, text_col).filter(F.col("cnt") >= min_count)
    return with_global_index(
        counts, [F.col("cnt").desc(), F.col("token")], out_col="token_id"
    ).select("token", "cnt", F.col("token_id").cast("bigint").alias("token_id"))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list,
    compare_cols: list,
) -> DataFrame:
    """Keyed diff of two table snapshots → one row per key present in
    either side with status ∈ {added, removed, changed, unchanged}.

    Per-partition lineage manifests (checkpoint.py) say WHICH stages
    re-ran; this says WHAT changed between two materializations of the
    same table — the audit view for incremental runs (old/new nodes
    before/after canonicalization, yesterday's/today's corpus).  Pure
    full-outer equi-join on the key: one shuffle, no skew beyond the
    key's own distribution.
    """
    o = old.select(
        *[F.col(k).alias(f"k_{k}") for k in key_cols],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(1).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"k_{k}") for k in key_cols],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(1).alias("_in_new"),
    )
    joined = o.join(n, [f"k_{k}" for k in key_cols], "full_outer")
    same = None
    for c in compare_cols:
        eq = F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        same = eq if same is None else (same & eq)
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        *[F.col(f"k_{k}").alias(k) for k in key_cols],
        status.alias("status"),
        *[F.col(f"old_{c}") for c in compare_cols],
        *[F.col(f"new_{c}") for c in compare_cols],
    )


def merge_pair_counts(
    docs: DataFrame, k_top: int = 64, text_col: str = "text"
) -> DataFrame:
    """One BPE training round: corpus-wide adjacent-token-pair counts →
    the ``k_top`` best merge candidates (left_tok, right_tok, n_pairs).

    Byte-pair-encoding tokenizer training (Sennrich et al. 2016) is
    repeated rounds of "count all adjacent symbol pairs, merge the most
    frequent"; this is that counting round over the same normalized
    whitespace tokens as ``build_vocab``, so the two tables together are
    the tokenizer-bootstrap statistics (vocab + first merge table).

    Determinism: the top-k total order is (n_pairs DESC, left ASC, right
    ASC) — no ties survive, so the row SET is stable and hash-checkable.

    Scale shape: pairs explode ~1:1 with tokens (n−1 pairs per doc); the
    (left,right) groupBy partial-aggregates the Zipf head map-side like
    unigram_counts, and the global top-k is orderBy().limit() —
    TakeOrderedAndProject, a per-partition heap + driver merge of k·P
    rows, never a single-partition sort.
    """
    from ..functions.textqc import normalized_text, ws_tokens_col

    toks = widen(docs).select(
        ws_tokens_col(normalized_text(F.col(text_col))).alias("t")
    ).filter(F.size("t") >= 2)
    # F.sequence(1, 0) would be DESCENDING — the size filter guards it.
    pairs = toks.select(
        F.explode(
            F.expr("transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS l, t[i] AS r))")
        ).alias("p")
    )
    return (
        pairs.groupBy(
            F.col("p.l").alias("left_tok"), F.col("p.r").alias("right_tok")
        )
        .agg(F.count("*").cast("bigint").alias("n_pairs"))
        .orderBy(F.desc("n_pairs"), F.asc("left_tok"), F.asc("right_tok"))
        .limit(k_top)
    )


def dsir_bucket_counts(
    docs: DataFrame,
    target: F.Column,
    text_col: str = "text",
    n_buckets: int = 4096,
) -> DataFrame:
    """The DSIR bucket models as a bare count table (b, cr, ct): raw and
    target hashed-bigram occurrence counts per bucket.  Split out because
    the counts are SUM-mergeable — shards and streaming micro-batches
    fold exactly (streaming/dsir_stream.py), unlike the derived
    log-ratio weights."""
    from ..functions.textqc import rolling_fingerprint
    from .dedup import token_windows

    grams = widen(docs).select(
        target.alias("is_target"),
        F.explode(token_windows(F.col(text_col), 2, 1)).alias("span"),
    ).withColumn(
        "b", F.pmod(rolling_fingerprint(F.col("span")), F.lit(n_buckets))
    )
    return grams.groupBy("b").agg(
        F.count("*").cast("bigint").alias("cr"),
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).cast("bigint").alias("ct"),
    )


def dsir_scores(
    docs: DataFrame,
    target: F.Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    keep_k: int = 100,
    bucket_counts: DataFrame | None = None,
) -> DataFrame:
    """Data Selection with Importance Resampling (DSIR, Xie et al. 2023,
    arXiv:2302.03169): score every raw document by how much its hashed
    n-gram distribution looks like a *target domain*, then keep the top
    ``keep_k``.  This is the standard pretraining-data curation move when
    you have a small in-domain seed set (the ``target`` predicate) and a
    huge raw crawl.

    Features are the paper's hashed bigrams: each whitespace-token bigram
    is fingerprinted (`rolling_fingerprint`, the shared SQL-expressible
    polynomial family) into ``n_buckets`` buckets.  Per bucket we fit two
    add-one-smoothed count models — target vs raw — and the per-document
    score is the mean log-likelihood ratio over its bigram occurrences.
    All arithmetic is exact integers: log2 via bit_length
    (``length(bin(c+1)) - 1``), the mean reported as a floored
    micro-ratio, so the DuckDB oracle matches bit-for-bit.  Using raw
    counts instead of probabilities shifts every occurrence's term by the
    same constant log(|raw|/|target|); the per-gram mean makes that a
    constant offset on every document, leaving the RANKING identical to
    the normalized-probability form — which is all selection uses.

    Selection is deterministic importance *ranking* (no RNG): top
    ``keep_k`` under the tie-free total order (score DESC, id ASC) via
    ``orderBy().limit()`` — TakeOrderedAndProject, a per-partition heap,
    never a global sort — then a broadcast semi-join stamps ``selected``.

    Scale shape: bigrams shuffle once keyed by (doc, bucket) — partial
    aggregation collapses repeats map-side; the bucket model table is
    ``n_buckets`` rows, always broadcast.  Nothing here grows with corpus
    size except the two linear scans.

    Returns (doc_id, n_grams, dsir_bits, mean_lr_micro, selected) for
    every input document (docless-of-bigrams rows score 0).

    ``bucket_counts``: optionally score against EXTERNAL models — a
    (b, cr, ct) table from ``dsir_bucket_counts`` or the streaming fold
    (streaming/dsir_stream.py).  It must cover the scored docs' buckets
    (true whenever the model corpus is a superset, e.g. the stream has
    ingested them); by default the models are fit on ``docs`` itself.
    """
    from ..functions.textqc import rolling_fingerprint
    from .dedup import token_windows

    grams = widen(docs).select(
        F.col(id_col).alias("doc_id"),
        target.alias("is_target"),
        F.explode(token_windows(F.col(text_col), 2, 1)).alias("span"),
    ).withColumn(
        "b", F.pmod(rolling_fingerprint(F.col("span")), F.lit(n_buckets))
    )
    # occ feeds BOTH the bucket models and the per-doc scores; persist so
    # the text scan + bigram explode run once (the ngram_dedup pattern)
    occ = grams.groupBy("doc_id", "b").agg(
        F.count("*").cast("bigint").alias("c"),
        F.first("is_target").alias("is_target"),
    ).persist()
    bits = lambda c: (F.length(F.bin(c + F.lit(1))) - 1).cast("bigint")  # noqa: E731
    if bucket_counts is None:
        bucket_counts = occ.groupBy("b").agg(
            F.sum("c").alias("cr"),
            F.sum(F.when(F.col("is_target"), F.col("c")).otherwise(0)).alias("ct"),
        )
    buckets = bucket_counts.select(
        "b", (bits(F.col("ct")) - bits(F.col("cr"))).alias("wt")
    )
    # LEFT join: an external model that doesn't cover a bucket must not
    # silently drop its occurrences from n_grams (biasing the mean) — an
    # unmodeled bucket scores the add-one-smoothed unseen value,
    # bits(0+1) - bits(0+1) = 0, exactly what fitting with ct=cr=0 gives.
    # The internal fit (bucket_counts from occ itself) always matches, so
    # this is a no-op on the default path.
    prof = (
        occ.join(F.broadcast(buckets), "b", "left")
        .withColumn("wt", F.coalesce("wt", F.lit(0).cast("bigint")))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_grams"),
            F.sum(F.col("c") * F.col("wt")).cast("bigint").alias("dsir_bits"),
        )
    )
    mean = F.floor(
        F.col("dsir_bits").cast("double") * 1_000_000 / F.col("n_grams").cast("double")
    ).cast("bigint")
    # prof feeds the top-K heap AND the output join — persist (tiny: one
    # row per doc)
    prof = prof.select(
        "doc_id", "n_grams", "dsir_bits", mean.alias("mean_lr_micro")
    ).persist()
    top = (
        prof.orderBy(F.desc("mean_lr_micro"), F.asc("doc_id"))
        .limit(keep_k)
        .select("doc_id", F.lit(True).alias("selected"))
    )
    out = (
        widen(docs).select(F.col(id_col).alias("doc_id"))
        .join(prof, "doc_id", "left")
        .join(F.broadcast(top), "doc_id", "left")
    )
    return out.select(
        "doc_id",
        F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
        F.coalesce("dsir_bits", F.lit(0)).cast("bigint").alias("dsir_bits"),
        F.coalesce("mean_lr_micro", F.lit(0)).cast("bigint").alias("mean_lr_micro"),
        F.coalesce("selected", F.lit(False)).alias("selected"),
    )


def mixer_audit(
    signals: DataFrame, rules: list[tuple[str, F.Column]], id_col: str = "doc_id"
) -> DataFrame:
    """Dolma-style tagger/mixer audit (Soldaini et al. 2024,
    arXiv:2402.00159): given one row of quality signals per document and
    an ordered list of (rule_name, fires) predicates, emit WHY each
    document was kept or dropped — the provenance table a curation
    pipeline ships alongside the filtered corpus so cut decisions are
    auditable and re-mixable without recomputing the taggers.

    ``reasons`` is the comma-joined names of the rules that fired, in the
    given (fixed) rule order — `concat_ws` skips the NULLs from rules
    that did not fire identically on every engine, so the string is
    deterministic without a sort.  ``kept`` is "no rule fired".

    Pure row-local Column algebra over the signals table: no shuffle, no
    Python — the audit fuses into whatever scan produced the signals.
    """
    reasons = F.concat_ws(
        ",", *[F.when(pred, F.lit(name)) for name, pred in rules]
    )
    return signals.select(
        F.col(id_col).alias("doc_id"),
        reasons.alias("reasons"),
        (reasons == F.lit("")).alias("kept"),
    )


def bpe_train_merges(
    docs: DataFrame, rounds: int = 3, text_col: str = "text"
) -> DataFrame:
    """Byte-pair-encoding tokenizer TRAINING (Sennrich et al. 2016,
    arXiv:1508.07909): ``rounds`` iterations of "count every adjacent
    symbol pair, merge the most frequent everywhere" → the learned merge
    table (round, left_tok, right_tok, n_pairs), which IS a BPE
    tokenizer's core artifact.  Extends ``merge_pair_counts`` (one
    counting round over words) to the full character-level training loop.

    Like every real BPE trainer, the loop runs over the WORD-FREQUENCY
    table, not the corpus: the text is scanned once into (word, cnt) —
    Zipf-bounded (millions of rows at 100 TB, not trillions) — and every
    subsequent round touches only that table.  Per round:

    1. adjacent-pair counts weighted by word frequency (explode + one
       combinable groupBy);
    2. argmax under the tie-free total order (n DESC, left, right) via
       ``orderBy().limit(1)`` — TakeOrderedAndProject;
    3. apply the merge greedily left-to-right inside every word via plain
       string ``replace`` over a newline-anchored rendering: symbols are
       joined with two '\\n's and the word wrapped in single '\\n's, so
       the pattern '\\n l \\n\\n r \\n' can only match WHOLE adjacent
       symbols (tokens never contain whitespace), the shared boundary
       newline lets consecutive pairs both merge, and replace's leftmost
       non-overlapping scan IS greedy BPE semantics ("aaa" + merge(a,a)
       → [aa, a]).  Native on both engines, no Python.  (A struct-
       accumulator aggregate fold is equivalent in Spark, but DuckDB
       1.0's list_reduce corrupts list-in-struct accumulators across
       consecutive branches — measured — so both sides use replace.)

    The oracle runs the identical construction, so the learned merges
    hash-match exactly.  No end-of-word marker is appended (deviation
    from Sennrich's </w>; merges are purely intra-word — documented,
    same both engines).
    """
    from ..functions.textqc import normalized_text, ws_tokens_col

    vocab = (
        widen(docs)
        .select(F.explode(ws_tokens_col(normalized_text(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .select(
            "cnt",
            F.expr(
                "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
            ).alias("syms"),
        )
        .persist()
    )
    merged = F.expr(
        r"""
        split(
          substring(
            replace(concat('\n', array_join(syms, '\n\n'), '\n'),
                    concat('\n', _l, '\n\n', _r, '\n'),
                    concat('\n', _l, _r, '\n')),
            2,
            length(replace(concat('\n', array_join(syms, '\n\n'), '\n'),
                           concat('\n', _l, '\n\n', _r, '\n'),
                           concat('\n', _l, _r, '\n'))) - 2),
          '\n\n')
        """
    )
    merges = None
    for r in range(1, rounds + 1):
        pairs = (
            vocab.select(
                "cnt",
                F.explode(
                    F.expr(
                        "CASE WHEN size(syms) < 2 THEN CAST(array() AS array<struct<l:string,r:string>>) "
                        "ELSE transform(sequence(1, size(syms) - 1), "
                        "i -> struct(syms[i-1] AS l, syms[i] AS r)) END"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("_l"), F.col("p.r").alias("_r"))
            .agg(F.sum("cnt").cast("bigint").alias("_n"))
        )
        best = pairs.orderBy(F.desc("_n"), F.asc("_l"), F.asc("_r")).limit(1).persist()
        row = best.select(
            F.lit(r).cast("int").alias("round"),
            F.col("_l").alias("left_tok"),
            F.col("_r").alias("right_tok"),
            F.col("_n").alias("n_pairs"),
        )
        merges = row if merges is None else merges.unionByName(row)
        vocab = (
            vocab.crossJoin(F.broadcast(best))
            .select("cnt", merged.alias("syms"))
            .persist()
        )
    return merges


def bpe_segment(
    docs: DataFrame,
    rounds: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a freshly-trained ``rounds``-merge BPE tokenizer to the
    corpus → (doc_id, n_words, n_bpe_tokens): the token-count table a
    packing/budgeting stage consumes once the tokenizer exists.

    Scale design: tokenization is a DICTIONARY JOIN, not a per-occurrence
    re-run of the merges.  Training already segments every distinct word
    (the word-frequency table); this keeps that final (word → |symbols|)
    table — Zipf-bounded, broadcastable — and joins each document's word
    occurrences against it, summing symbol counts per doc.  The merge
    loop therefore runs once per ROUND over the vocab, never per word
    occurrence — the shape that holds at 100 TB.
    """
    from ..functions.textqc import normalized_text, ws_tokens_col

    words = widen(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(ws_tokens_col(normalized_text(F.col(text_col)))).alias("word"),
    )
    vocab = (
        words.filter(F.col("word").isNotNull())
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .select(
            "word",
            F.expr(
                "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
            ).alias("syms"),
            "cnt",
        )
        .persist()
    )
    merged = F.expr(
        r"""
        split(
          substring(
            replace(concat('\n', array_join(syms, '\n\n'), '\n'),
                    concat('\n', _l, '\n\n', _r, '\n'),
                    concat('\n', _l, _r, '\n')),
            2,
            length(replace(concat('\n', array_join(syms, '\n\n'), '\n'),
                           concat('\n', _l, '\n\n', _r, '\n'),
                           concat('\n', _l, _r, '\n'))) - 2),
          '\n\n')
        """
    )
    for _ in range(rounds):
        pairs = (
            vocab.select(
                "cnt",
                F.explode(
                    F.expr(
                        "CASE WHEN size(syms) < 2 THEN CAST(array() AS array<struct<l:string,r:string>>) "
                        "ELSE transform(sequence(1, size(syms) - 1), "
                        "i -> struct(syms[i-1] AS l, syms[i] AS r)) END"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("_l"), F.col("p.r").alias("_r"))
            .agg(F.sum("cnt").cast("bigint").alias("_n"))
        )
        best = pairs.orderBy(F.desc("_n"), F.asc("_l"), F.asc("_r")).limit(1)
        vocab = (
            vocab.crossJoin(F.broadcast(best))
            .select("word", merged.alias("syms"), "cnt")
            .persist()
        )
    seg = F.broadcast(vocab.select("word", F.size("syms").cast("bigint").alias("n_syms")))
    return (
        words.join(seg, "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count("word").cast("bigint").alias("n_words"),
            F.coalesce(F.sum("n_syms"), F.lit(0)).cast("bigint").alias("n_bpe_tokens"),
        )
    )


def tertile_buckets(
    scored: DataFrame,
    strata_col: str = "lang",
    score_col: str = "mean_bits_micro",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style quality bucketing (Wenzek et al. 2020,
    arXiv:1911.00359): within each stratum, rank documents by the LM
    quality score and cut into head / middle / tail tertiles — the
    standard way pretraining mixes are then drawn (head-heavy sampling).

    Integer-exact and tie-free: rk = row_number over (stratum, score
    DESC, id ASC); head iff 3·rk ≤ n, middle iff 3·rk ≤ 2n, else tail —
    no division, no percentile interpolation, so the SQL oracle matches
    bit-for-bit.  One stratum-partitioned window (never global) + a
    stratum-count broadcast join.
    """
    w = Window.partitionBy(strata_col).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    n = F.broadcast(
        scored.groupBy(strata_col).agg(F.count("*").cast("bigint").alias("_n"))
    )
    ranked = scored.withColumn("rk", F.row_number().over(w).cast("bigint")).join(
        n, strata_col
    )
    bucket = (
        F.when(3 * F.col("rk") <= F.col("_n"), F.lit("head"))
        .when(3 * F.col("rk") <= 2 * F.col("_n"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return ranked.select(
        id_col, strata_col, score_col, F.col("rk"), bucket.alias("bucket")
    )


def heaps_profile(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heaps/Herdan vocabulary-growth curve → one row per document in
    ``id_col`` order: (doc_ord, doc_id, n_tokens, new_types, cum_tokens,
    cum_types).

    cum_types(d) counts DISTINCT normalized whitespace tokens seen in
    docs 1..d — the V(N) ≈ K·N^β law every tokenizer-budget and
    vocab-size decision leans on; a corpus whose curve bends early is
    repetitive (dedup target), one that never bends is noisy (garbage
    tokens).  Exact integers, no estimation.

    Scale shape: the naive form (cumulative DISTINCT per prefix) is
    quadratic; the distributed identity used here is
    cum_types(d) = #{tokens whose FIRST occurrence ord ≤ d} — one
    min-aggregate per token, one count per first-occurrence ord, then
    two prefix sums via with_running_sum (two-phase, no
    single-partition window).  Everything is a map-side-combinable
    aggregate on (token) or (ord); no driver loops.

    Reference anchor: none (the reference has no corpus telemetry) —
    this is part of the training-data-pipeline brief, companion to
    build_vocab / unigram_counts.
    """
    from ..functions.textqc import normalized_text, ws_tokens_col
    from .graphops import with_global_index, with_running_sum

    base = with_global_index(
        widen(docs).select(
            F.col(id_col).alias("doc_id"),
            ws_tokens_col(normalized_text(F.col(text_col))).alias("__toks"),
        ),
        ["doc_id"],
        "doc_ord",
    ).select(
        "doc_id",
        (F.col("doc_ord") + 1).cast("bigint").alias("doc_ord"),
        "__toks",
        F.size("__toks").cast("bigint").alias("n_tokens"),
    )
    base = base.persist()
    first_occ = (
        base.select("doc_ord", F.explode("__toks").alias("token"))
        .groupBy("token")
        .agg(F.min("doc_ord").alias("first_ord"))
    )
    new_types = first_occ.groupBy(F.col("first_ord").alias("doc_ord")).agg(
        F.count("*").cast("bigint").alias("new_types")
    )
    per_doc = base.join(new_types, "doc_ord", "left").select(
        "doc_ord",
        "doc_id",
        "n_tokens",
        F.coalesce("new_types", F.lit(0)).cast("bigint").alias("new_types"),
    )
    out = with_running_sum(per_doc, ["doc_ord"], "n_tokens", "cum_tokens")
    out = with_running_sum(out, ["doc_ord"], "new_types", "cum_types")
    return out.select(
        "doc_ord",
        "doc_id",
        "n_tokens",
        "new_types",
        F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
        F.col("cum_types").cast("bigint").alias("cum_types"),
    )


def bpe_fertility(
    docs: DataFrame,
    rounds: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Tokenizer fertility audit → one row per language: (lang, n_docs,
    sum_words, sum_bpe, fertility_micro) where fertility_micro =
    floor(1e6 · bpe_tokens / words).

    Fertility (BPE tokens emitted per whitespace word) is the standard
    tokenizer-equity metric: a tokenizer trained on skewed data segments
    under-represented languages into more pieces, inflating their
    training cost and truncation rate.  Reuses bpe_segment's dictionary
    join (the merges run once over the Zipf-bounded vocab, never per
    occurrence) and folds to one exact-integer row per language.
    """
    seg = bpe_segment(docs, rounds=rounds, id_col=id_col, text_col=text_col)
    tagged = seg.join(
        docs.select(F.col(id_col).alias("doc_id"), F.col(lang_col).alias("lang")),
        "doc_id",
    )
    return (
        tagged.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("sum_words"),
            F.sum("n_bpe_tokens").cast("bigint").alias("sum_bpe"),
        )
        .withColumn(
            "fertility_micro",
            F.expr("(1000000 * sum_bpe) DIV greatest(sum_words, 1)").cast("bigint"),
        )
    )


# ---------------------------------------------------------------------------
# Trained bigram language-model scoring (the CCNet / KenLM quality filter
# shape): fit n-gram counts on the TRAIN split only, score every document
# with stupid-backoff bits-per-token.  Distinct from familiarity_profile
# (corpus unigram, no split discipline, no backoff): this is the
# held-out-model path — the score of a train document never depends on
# val/test text, so the filter itself cannot leak the evaluation set.
# ---------------------------------------------------------------------------

LM_BACKOFF_BITS = 4  # stupid-backoff penalty per backed-off token (≈ α=1/16)


def _doc_tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, t: array<string>) — the shared ws tokenization."""
    from ..functions.textqc import normalized_text, ws_tokens_col

    return widen(docs).select(
        F.col(id_col).alias("doc_id"),
        ws_tokens_col(normalized_text(F.col(text_col))).alias("t"),
    )


def _token_pairs(toks: DataFrame) -> DataFrame:
    """(doc_id, w1, w2) — adjacent token pairs from ``_doc_tokens``
    output.  ONE definition so LM training and scoring extract pairs
    identically (the counts and the cost joins must agree bit-for-bit)."""
    return toks.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("t"), 1, F.greatest(F.size("t") - 1, F.lit(0))).alias("w1"),
                F.slice(F.col("t"), 2, F.greatest(F.size("t") - 1, F.lit(0))).alias("w2"),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))


def lm_train_counts(
    train_docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Bigram LM tables from the training split: (unigrams(w, cnt),
    bigrams(w1, w2, cnt), total — a 1-row (n_total) frame).

    One tokenization scan feeds both count tables; partial aggregation
    collapses the Zipf head map-side so each shuffle carries ~|vocab|
    rows per input partition.  The scalar total rides a broadcast 1-row
    frame (no driver collect)."""
    toks = _doc_tokens(train_docs, id_col, text_col)
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    bi = (
        _token_pairs(toks)
        .select("w1", "w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    # coalesce so an EMPTY training split yields n_total = 0 (bitlen 0),
    # matching the oracle's coalesce(sum(cnt), 0) instead of a NULL that
    # would NULL every downstream cost
    total = uni.agg(F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias("n_total"))
    return uni, bi, total


def lm_bits(
    docs: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    total: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document against the trained bigram LM → (doc_id,
    n_scored, total_bits, bits_per_token_micro, n_backoff, n_oov).

    Per adjacent token pair (w1, w2) the cost in bits, all integer
    bit-length logs (bitlen(x) = floor(log2 x), the repo-wide convention):

      - bigram seen:    bitlen(U(w1)) − bitlen(B(w1,w2))      (≈ −log2 p)
      - unigram backoff: LM_BACKOFF_BITS + bitlen(N) − bitlen(U(w2))
      - OOV:             LM_BACKOFF_BITS + bitlen(N)

    B ≤ U(w1) and U(w2) ≤ N guarantee non-negative costs with no clamps.
    This is stupid backoff (Brants et al. 2007) with a power-of-two
    penalty, integer-exact on both engines.  Documents with < 2 tokens
    score n_scored = 0 / bits 0 (still emitted — the filter must decide
    on every doc).

    Scale shape: one tokenization scan explodes to (doc, w1, w2) pairs;
    the model joins are plain equi-joins on token keys (broadcast when
    the vocab fits, shuffle-on-token otherwise — never on doc), and the
    per-doc fold is one map-side-combinable groupBy.  Model tables are
    |vocab|-bounded (Zipf), so at 100 TB the score pass is ~one shuffle
    of the bigram occurrence stream."""
    toks = _doc_tokens(docs, id_col, text_col)
    pairs = _token_pairs(toks).select("doc_id", "w1", "w2")
    bits = lambda c: (F.length(F.bin(c)) - 1).cast("bigint")  # noqa: E731
    scored = (
        pairs.join(
            bigrams.select("w1", "w2", F.col("cnt").alias("b_cnt")), ["w1", "w2"], "left"
        )
        .join(
            unigrams.select(F.col("w").alias("w1"), F.col("cnt").alias("u1_cnt")),
            "w1",
            "left",
        )
        .join(
            unigrams.select(F.col("w").alias("w2"), F.col("cnt").alias("u2_cnt")),
            "w2",
            "left",
        )
        .join(F.broadcast(total))
        .select(
            "doc_id",
            F.when(F.col("b_cnt").isNotNull(), bits(F.col("u1_cnt")) - bits(F.col("b_cnt")))
            .when(
                F.col("u2_cnt").isNotNull(),
                F.lit(LM_BACKOFF_BITS) + bits(F.col("n_total")) - bits(F.col("u2_cnt")),
            )
            .otherwise(F.lit(LM_BACKOFF_BITS) + bits(F.col("n_total")))
            .cast("bigint")
            .alias("cost"),
            F.when(F.col("b_cnt").isNotNull(), 0).otherwise(1).alias("backoff"),
            F.when(
                F.col("b_cnt").isNull() & F.col("u2_cnt").isNull(), 1
            ).otherwise(0).alias("oov"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_scored"),
        F.sum("cost").cast("bigint").alias("total_bits"),
        F.sum("backoff").cast("bigint").alias("n_backoff"),
        F.sum("oov").cast("bigint").alias("n_oov"),
    )
    return (
        toks.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_scored", F.lit(0)).cast("bigint").alias("n_scored"),
            F.coalesce("total_bits", F.lit(0)).cast("bigint").alias("total_bits"),
            F.expr(
                "CAST(coalesce(total_bits, 0) * 1000000 DIV greatest(coalesce(n_scored, 0), 1) AS BIGINT)"
            ).alias("bits_per_token_micro"),
            F.coalesce("n_backoff", F.lit(0)).cast("bigint").alias("n_backoff"),
            F.coalesce("n_oov", F.lit(0)).cast("bigint").alias("n_oov"),
        )
    )


def ngram_diversity(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_n: int = 3,
) -> DataFrame:
    """Per-document distinct-n diversity profile → (doc_id, n_tokens,
    distinct_1..distinct_{max_n}, ratio_micro_1..ratio_micro_{max_n}).

    Li et al. 2016's distinct-n metric as a curation filter: the fraction
    of n-gram positions occupied by DISTINCT n-grams, in exact integer
    micros (ratio_micro_n = 1e6 · distinct_n / max(1, positions_n)).
    Low distinct-2/3 flags degenerate repetition (decoding loops, boiler-
    plate, keyword stuffing) that per-token QC misses; the corpus-level
    aggregate tracks diversity drift across dumps.  Complements
    `textqc.repeated_token_fraction` (adjacent repeats only) and
    `dedup.repeated_span_profile` (cross-doc spans) with the in-document
    multiset view.

    Scale shape: entirely ROW-LOCAL Column algebra — tokenize once,
    slide windows with transform/slice, count distincts with
    array_distinct — no explode, no shuffle, no UDF; Catalyst keeps the
    whole computation in one codegen stage over the text scan."""
    from ..functions.textqc import normalized_text, ws_tokens_col

    toks = ws_tokens_col(normalized_text(F.col(text_col)))
    out = docs.select(
        F.col(id_col).alias("doc_id"), toks.alias("t")
    ).withColumn("n_tokens", F.size("t").cast("bigint"))
    def _grams(n: int) -> F.Column:
        # NB: a 1-arg lambda only — F.transform passes (element, index) to
        # 2-arg callables, which would shadow a default-arg n binding
        if n == 1:
            return F.col("t")
        return F.when(F.size("t") < n, F.expr("CAST(array() AS ARRAY<STRING>)")).otherwise(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - n),
                lambda i: F.concat_ws(" ", F.slice(F.col("t"), i + 1, n)),
            )
        )

    for n in range(1, max_n + 1):
        grams = _grams(n)
        out = out.withColumn(f"distinct_{n}", F.size(F.array_distinct(grams)).cast("bigint"))
        out = out.withColumn(
            f"ratio_micro_{n}",
            F.expr(
                f"distinct_{n} * 1000000 DIV greatest(CAST(1 AS BIGINT), n_tokens - {n} + 1)"
            ).cast("bigint"),
        )
    return out.drop("t")


# Default labeling functions for the weak-supervision audit: (name,
# required lowercase substrings, label).  A function fires on a document
# when every substring occurs; its vote is the attached binary label.
# The default task separates query-shaped from stream-shaped docs — the
# two salient registers of this corpus — but any (name, terms, label)
# list works; terms are matched as plain substrings (no regex) so both
# engines share exact semantics.
WEAK_LFS: tuple[tuple[str, tuple[str, ...], int], ...] = (
    ("lf_query", ("query",), 1),
    ("lf_join_agg", ("join", "agg"), 1),
    ("lf_stream", ("stream",), 0),
    ("lf_batch_window", ("batch", "window"), 0),
)


def _lf_fired(text_low: F.Column, terms: tuple[str, ...]) -> F.Column:
    cond = F.lit(True)
    for t in terms:
        cond = cond & (F.instr(text_low, t) > 0)
    return cond


def weak_label_matrix(
    docs: DataFrame,
    lfs: tuple = WEAK_LFS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Data-programming label matrix (Ratner et al. 2017, Snorkel):
    apply every labeling function to every document and fold the votes →
    (doc_id, <lf_name> … with NULL = abstain, n_pos, n_neg, vote).

    The learned label model is replaced by a deterministic majority vote
    (ties break to the smaller label, no-vote docs stay NULL) — the
    auditable baseline every weak-supervision pipeline starts from; a
    trained model plugs in where ``vote`` is computed.

    Scale shape: entirely row-local Column algebra — k substring probes
    and a constant-width CASE per row, zero shuffle, pipelines into
    whatever consumes the labels."""
    low = F.lower(F.col(text_col))
    out = widen(docs).select(F.col(id_col).alias("doc_id"), low.alias("_low"))
    for name, terms, label in lfs:
        out = out.withColumn(
            name, F.when(_lf_fired(F.col("_low"), terms), F.lit(label)).cast("int")
        )
    n_pos = sum(
        (F.when(F.col(name) == 1, 1).otherwise(0) for name, _, _ in lfs), F.lit(0)
    )
    n_neg = sum(
        (F.when(F.col(name) == 0, 1).otherwise(0) for name, _, _ in lfs), F.lit(0)
    )
    out = out.withColumn("n_pos", n_pos.cast("int")).withColumn(
        "n_neg", n_neg.cast("int")
    )
    vote = (
        F.when(F.col("n_pos") > F.col("n_neg"), F.lit(1))
        .when(F.col("n_neg") > F.col("n_pos"), F.lit(0))
        .when(F.col("n_pos") > 0, F.lit(0))  # tie with votes → smaller label
        .otherwise(F.lit(None))
    )
    return out.withColumn("vote", vote.cast("int")).drop("_low")


def weak_lf_counters(
    docs: DataFrame,
    lfs: tuple = WEAK_LFS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Raw per-LF counter table → one row per LF: (lf, label, n_docs,
    n_fired, n_overlap, n_conflict, n_agree_vote).  Every column is a
    SUM of per-document indicators, so two counter tables over disjoint
    corpora merge by summing — the streaming fold in
    streaming/weak_label_stream.py relies on exactly this.

    Scale shape: one pass — the per-doc indicator columns are row-local,
    folded by a single global aggregate (constant width: 4 counters per
    LF), then unpivoted driver-free via an inline stack over the 1-row
    frame.  n_docs rides the same aggregate — no second scan."""
    m = weak_label_matrix(docs, lfs, id_col, text_col)
    aggs = [F.count("*").cast("bigint").alias("n_docs")]
    for name, _, label in lfs:
        fired = F.col(name).isNotNull()
        others_fired = F.lit(False)
        others_conflict = F.lit(False)
        for oname, _, _ in lfs:
            if oname == name:
                continue
            ofired = F.col(oname).isNotNull()
            others_fired = others_fired | ofired
            others_conflict = others_conflict | (
                ofired & (F.col(oname) != F.col(name))
            )
        aggs.append(
            F.sum(F.when(fired, 1).otherwise(0)).cast("bigint").alias(f"_f_{name}")
        )
        aggs.append(
            F.sum(F.when(fired & others_fired, 1).otherwise(0))
            .cast("bigint")
            .alias(f"_o_{name}")
        )
        aggs.append(
            F.sum(F.when(fired & others_conflict, 1).otherwise(0))
            .cast("bigint")
            .alias(f"_c_{name}")
        )
        aggs.append(
            F.sum(F.when(fired & (F.col("vote") == F.col(name)), 1).otherwise(0))
            .cast("bigint")
            .alias(f"_a_{name}")
        )
    one = m.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', CAST({label} AS INT), _f_{name}, _o_{name}, _c_{name}, _a_{name}"
        for name, _, label in lfs
    )
    return one.select(
        F.expr(
            f"stack({len(lfs)}, {stack_args}) AS "
            "(lf, label, n_fired, n_overlap, n_conflict, n_agree_vote)"
        ),
        "n_docs",
    ).select(
        "lf", "label", "n_docs", "n_fired", "n_overlap", "n_conflict", "n_agree_vote"
    )


def weak_stats_from_counters(counters: DataFrame) -> DataFrame:
    """Read the audit table off a (possibly stream-folded) counter table:
    adds coverage_micro = 10^6·n_fired DIV n_docs and drops n_docs —
    derived quantities are computed at read time, never folded.  The
    divisor is floor-guarded (greatest 1) so a counter row folded from
    an empty corpus reads coverage 0 on both engines instead of NULL
    here / a division error in the oracle."""
    return counters.select(
        "lf",
        "label",
        "n_fired",
        F.expr("n_fired * 1000000 DIV greatest(n_docs, 1)")
        .cast("bigint")
        .alias("coverage_micro"),
        "n_overlap",
        "n_conflict",
        "n_agree_vote",
    )


def weak_lf_stats(
    docs: DataFrame,
    lfs: tuple = WEAK_LFS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-labeling-function audit of the weak-label matrix → one row
    per LF: (lf, label, n_fired, coverage_micro, n_overlap, n_conflict,
    n_agree_vote) — Snorkel's coverage/overlap/conflict diagnostics as
    exact integers (coverage_micro = 10^6·n_fired DIV n_docs).

    n_overlap counts docs where the LF fired and at least one OTHER LF
    fired; n_conflict where some other firing LF voted differently;
    n_agree_vote where the LF's vote equals the majority vote.

    One-shot composition of ``weak_lf_counters`` +
    ``weak_stats_from_counters`` (same scale shape: one scan, one
    constant-width aggregate)."""
    return weak_stats_from_counters(weak_lf_counters(docs, lfs, id_col, text_col))
