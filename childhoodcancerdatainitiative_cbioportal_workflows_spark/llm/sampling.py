"""Deterministic dataset splitting & sampling for training-data pipelines.

Train/val/test assignment at 100 TB must be a pure function of a stable
key — ``rand()`` splits are irreproducible across retries/re-partitions,
and ``df.sample`` changes membership when upstream files re-split. Here a
document's split follows from an md5 hash bucket of its id: re-running any
subset of the pipeline (or re-sharding the input) can never move a
document between splits, and any engine can recompute the assignment
(md5-nibble integer fold — same construction as the md5-derived dedup
families, bit-exact in DuckDB/Trino/Spark).

No shuffle is involved at all: assignment is a per-row projection, so a
split/sample is a narrow filter Catalyst pushes into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: bucket space for split fractions; 1e-4 granularity is plenty for split
#: weights. The pre-mod 8-hex-digit value reaches 16^8-1 (~4.29e9, just
#: past uint32) — bucketing relies on the BIGINT parse, never a 32-bit value
NUM_BUCKETS = 10_000


def hash_bucket(key: Column, num_buckets: int = NUM_BUCKETS) -> Column:
    """Uniform pseudo-random bucket in [0, num_buckets) from the md5 of the
    key's string form. First 8 hex digits parsed base-16 (``conv`` — the
    same bigint the old 8-nibble ascii fold produced, at a fraction of the
    expression nodes; r18) — engine-portable and stable forever (md5 of the
    same string never changes)."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("bigint")
        % num_buckets
    )


def dataset_split(
    df: DataFrame,
    weights: list[tuple[str, float]] | None = None,
    key_col: str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """Add a deterministic split label. ``weights`` is an ordered list of
    (name, fraction) summing to <= 1 (remainder falls into the last split);
    default 80/10/10 train/val/test. Cumulative-boundary buckets, so
    growing one split never reassigns rows between the OTHER splits."""
    weights = weights or [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    bucket = hash_bucket(F.col(key_col))
    expr = None
    cum = 0.0
    for name, frac in weights[:-1]:
        cum += frac
        bound = int(round(cum * NUM_BUCKETS))
        cond = bucket < F.lit(bound)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = weights[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def hash_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id"
) -> DataFrame:
    """Deterministic ``fraction`` sample by hash bucket: stable across
    reruns and re-partitioning (unlike ``df.sample``), composable with
    :func:`dataset_split` (independent md5 prefixes would decorrelate;
    here both read the same bucket, so a sample of the train split is
    simply ``bucket < frac*train_bound`` — document when layering)."""
    bound = int(round(fraction * NUM_BUCKETS))
    return df.filter(hash_bucket(F.col(key_col)) < F.lit(bound))


def bigram_counts(
    df: DataFrame,
    top_k: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Adjacent-token-pair (bigram) counts over the corpus — the counting
    step of a BPE/WordPiece merge round and the standard collocation
    statistic. Returns (token_a, token_b, n), optionally cut to the
    ``top_k`` most frequent pairs (total order: n desc, token_a, token_b —
    deterministic limit).

    Scale: the per-document pair list is a narrow ``transform`` over a
    staged token array (no self-join, no window); the explode feeds ONE
    aggregation whose map-side combine bounds the exchange by the distinct
    bigram vocabulary per partition, never the corpus token count. The
    optional top-k is TakeOrderedAndProject. A full BPE training loop is
    this count, a driver-side argmax (the merge table is vocabulary-sized),
    and a re-tokenize pass — each round one shuffle."""
    from ..core.session import spread
    from ..functions.text import ws_tokens

    toks = ws_tokens(F.lower(F.col(text_col)))
    staged = spread(df).select(toks.alias("_tk"))
    # sequence(1, size-1) counts DOWN when size < 2 (the word_shingles
    # gotcha) — guard single-token/empty docs to an empty pair list
    pair_list = F.when(
        F.size(F.col("_tk")) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(F.col("_tk")) - 1),
            lambda i: F.struct(
                F.element_at(F.col("_tk"), i).alias("token_a"),
                F.element_at(F.col("_tk"), i + F.lit(1)).alias("token_b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<token_a:string,token_b:string>>"))
    out = (
        staged.select(F.explode(pair_list).alias("p"))
        .select("p.token_a", "p.token_b")
        .groupBy("token_a", "token_b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if top_k is not None:
        out = out.orderBy(
            F.col("n").desc(), F.col("token_a").asc(), F.col("token_b").asc()
        ).limit(top_k)
    return out


def cooccurrence_counts(
    df: DataFrame,
    window: int = 2,
    top_k: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Skip-gram co-occurrence counts (word2vec/GloVe statistic): ordered
    (center, context) pairs for every context within ``window`` tokens to
    the RIGHT of the center, with the skip distance. The symmetric count
    is recoverable by summing both orientations, so only one direction is
    emitted (half the explode volume).

    Scale: generalizes :func:`bigram_counts` — per-document pair lists
    are narrow ``transform``s over a staged token array (one per
    distance, concatenated), no self-join and no per-token window; the
    single aggregation's map-side combine bounds the exchange by the
    distinct pair vocabulary, never corpus token count."""
    from ..core.session import spread
    from ..functions.text import ws_tokens

    toks = ws_tokens(F.lower(F.col(text_col)))
    staged = spread(df).select(toks.alias("_tk"))
    # slice+zip, NOT element_at over a sequence: pairs at distance d are
    # zip(toks[0..m-d), toks[d..m)); greatest(0, m-d) makes short docs an
    # empty slice instead of an invalid index
    def _pair_fn(d):
        def fn(a, b):
            return F.struct(
                a.alias("token_a"), b.alias("token_b"), F.lit(d).alias("dist")
            )

        return fn

    per_dist = []
    for d in range(1, window + 1):
        m = F.greatest(F.lit(0), F.size(F.col("_tk")) - F.lit(d))
        pairs = F.zip_with(
            F.slice(F.col("_tk"), F.lit(1), m),
            F.slice(F.col("_tk"), F.lit(d + 1), m),
            _pair_fn(d),
        )
        per_dist.append(pairs)
    out = (
        staged.select(F.explode(F.concat(*per_dist)).alias("p"))
        .select("p.token_a", "p.token_b", "p.dist")
        .groupBy("token_a", "token_b", "dist")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if top_k is not None:
        out = out.orderBy(
            F.col("n").desc(),
            F.col("token_a").asc(),
            F.col("token_b").asc(),
            F.col("dist").asc(),
        ).limit(top_k)
    return out


def weighted_hash_sample(
    df: DataFrame, weight: Column, key_col: str = "doc_id"
) -> DataFrame:
    """Deterministic per-row weighted sampling: keep a row iff its hash
    bucket falls under ``weight`` (a per-row Column in [0,1] — e.g. a
    quality score, so acceptance probability tracks quality; the standard
    quality-weighted subsampling step of pre-training mixes).

    Same md5 bucket as :func:`hash_sample`/:func:`dataset_split`, so the
    layering caveat applies (all three read one bucket: a weighted sample
    OF a split is the intersection of their bucket predicates, not an
    independent draw). Pure narrow filter — no shuffle, pushdown-safe when
    ``weight`` is a scan column; expression weights (quality_score) stay
    one projection."""
    bound = F.floor(weight * NUM_BUCKETS).cast("bigint")
    return df.filter(hash_bucket(F.col(key_col)) < bound)


def weighted_sample_k(
    df: DataFrame,
    weight: Column,
    k: int,
    key_col: str = "doc_id",
    logkey_col: str = "logkey_fp",
) -> DataFrame:
    """Exact-size-k weighted sampling WITHOUT replacement via exponential
    keys (Efraimidis & Spirakis 2006, public algorithm): each row draws a
    deterministic uniform u from its md5 bucket and keeps key =
    ln(u)/weight; the k largest keys are the sample — inclusion
    probability proportional to weight, one TakeOrdered, no shuffle
    before the top-k cut.

    Complements :func:`weighted_hash_sample` (Bernoulli, EXPECTED-size);
    this face guarantees exactly k rows. Determinism: u = (bucket+1) /
    (NUM_BUCKETS+1) in (0,1] from the shared md5 bucket, the key is
    floor-scaled to 1e-6 fixed point at birth (the quality_lm ln
    discipline — transcendentals never ride a comparison as raw doubles),
    ties break by ``key_col``. ``weight`` must be strictly positive;
    callers add an epsilon floor to zero-able scores."""
    u = (hash_bucket(F.col(key_col)) + 1).cast("double") / F.lit(
        float(NUM_BUCKETS + 1)
    )
    key_fp = F.floor(F.log(u) / weight * 1_000_000).cast("long")
    return (
        df.withColumn(logkey_col, key_fp)
        .orderBy(F.col(logkey_col).desc(), F.col(key_col).asc())
        .limit(k)
    )


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
    max_df_frac: float = 0.5,
) -> DataFrame:
    """Document-frequency-bounded vocabulary: lowercase whitespace tokens,
    per-document distinct, df counted in ONE shuffle, band-filtered
    (``min_df <= df <= max_df_frac * n_docs``), then ranked into contiguous
    vocab ids by (df desc, token asc).

    Scale shape: the explode + distinct + count is fully distributed; the
    final ranking window is a single ordered partition but runs AFTER the
    df band has shrunk the table to vocabulary size (stopword-bounded
    above, noise-bounded below) — vocabularies are ~1e5-1e6 rows at any
    corpus size, driver-safe. Returns (token, df, vocab_id)."""
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.array_distinct(
                F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
            )
        ).alias("token"),
    )
    n_docs = df.select(F.countDistinct(id_col).alias("_n"))
    dfreq = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .filter(
            (F.col("df") >= min_df) & (F.col("df") <= F.col("_n") * max_df_frac)
        )
        .drop("_n")
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("df").desc(), F.col("token").asc())
    return dfreq.withColumn("vocab_id", F.row_number().over(w))


#: auto-sharding target (see :func:`pack_sequences`): the per-shard token
#: stream is what one window partition must sort+scan; 64 Mi tokens keeps
#: any shard comfortably inside a single executor at any corpus size
TARGET_TOKENS_PER_SHARD = 64_000_000

#: auto-sharding floor: never derive fewer streams than this, so small
#: corpora still parallelize and shard labels stay useful downstream
MIN_SHARDS = 64


def pack_sequences(
    df: DataFrame,
    budget: int = 2048,
    num_shards: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_tokens_per_shard: int = TARGET_TOKENS_PER_SHARD,
) -> DataFrame:
    """Token-budget sequence packing: lay documents end-to-end into
    fixed-``budget`` training rows (token-level chunking — a document may
    span pack boundaries, the standard pretraining layout).

    Deterministic and distributed: documents are assigned to
    ``num_shards`` independent streams by hash bucket, laid out in id
    order within their shard, and the concatenated token stream of each
    shard is cut every ``budget`` tokens. The per-shard cumulative offset
    is one window sum partitioned by shard — num_shards-way parallel, no
    global single-partition window — and a pack never crosses shards, so
    shards are also the unit of downstream reader parallelism.

    ``num_shards=None`` (default) auto-derives the shard count from the
    corpus, like auto-P/auto-m in the dedup families:
    ``max(MIN_SHARDS, total_tokens // target_tokens_per_shard)`` — one
    map-side-combined token-count pre-pass (a scalar agg, the same scan
    the packing pass performs anyway), so the per-shard window sort stays
    bounded at 100 TB without tuning. Pass an explicit ``num_shards`` to
    pin the layout (oracles do, since shard labels and offsets are a
    function of it).

    Returns (doc_id, shard, n_tokens, offset, pack_id): offset is the
    doc's first-token position within its shard stream, pack_id =
    floor(offset / budget) the training row where the doc starts."""
    from pyspark.sql import Window

    from ..functions.text import token_count

    if num_shards is None:
        total = df.select(
            F.sum(token_count(F.col(text_col)).cast("long")).alias("t")
        ).first()["t"] or 0
        num_shards = max(MIN_SHARDS, int(total // target_tokens_per_shard))

    staged = df.select(
        F.col(id_col).alias("doc_id"),
        (hash_bucket(F.col(id_col)) % num_shards).alias("shard"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return staged.select(
        "doc_id",
        "shard",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("offset"),
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")) / budget
        ).alias("pack_id"),
    )


def encode_tokens(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    oov_id: int = 0,
) -> DataFrame:
    """Encode documents to vocabulary token ids: lowercase whitespace
    tokens (the :func:`build_vocab` tokenization) mapped through the
    (token, vocab_id) table, out-of-vocabulary tokens -> ``oov_id``.
    Returns exploded (doc_id, pos, token_id) with 1-based positions — the
    scalar layout value-hashes cleanly and re-assembles into arrays with
    one ordered collect_list when a consumer wants rows.

    Scale shape: vocabularies are ~1e5-1e6 rows at any corpus size, so the
    vocab side is broadcast — the corpus pass is posexplode + broadcast
    probe, zero shuffle on the 100 TB side."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
        ).alias("pos", "token"),
    )
    return (
        toks.join(F.broadcast(vocab.select("token", "vocab_id")), "token", "left")
        .select(
            "doc_id",
            (F.col("pos") + 1).cast("long").alias("pos"),
            F.coalesce(F.col("vocab_id"), F.lit(oov_id)).cast("long").alias("token_id"),
        )
    )


def stratified_hash_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    key_col: str = "doc_id",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Domain mixing: keep a DIFFERENT deterministic fraction per stratum
    (source / language / domain), e.g. up-weight curated sources and
    down-weight web scrape in one pass. Membership reads the same md5
    bucket as :func:`hash_sample` / :func:`dataset_split`, so stratified
    samples NEST (growing a stratum's fraction only adds rows) and compose
    with splits exactly like the un-stratified ops. Strata not listed in
    ``fractions`` keep ``default_fraction``.

    A narrow per-row filter — the stratum column just selects which bucket
    bound applies; no shuffle, no per-stratum passes, one scan at 100 TB."""
    default_bound = F.lit(int(round(default_fraction * NUM_BUCKETS)))
    expr = None
    for name, frac in sorted(fractions.items()):
        bound = int(round(frac * NUM_BUCKETS))
        cond = F.col(strata_col) == name
        expr = F.when(cond, bound) if expr is None else expr.when(cond, bound)
    bound_expr = default_bound if expr is None else expr.otherwise(default_bound)
    return df.filter(hash_bucket(F.col(key_col)) < bound_expr)


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 256,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-size token chunking with overlap — the pre-embedding /
    retrieval prep step: chunk i covers tokens [i*stride, i*stride +
    chunk_tokens) with stride = chunk_tokens - overlap, so consecutive
    chunks share ``overlap`` tokens and no token is dropped. Empty docs
    yield no chunks; a doc shorter than one chunk yields exactly one.

    Returns (doc_id, chunk_id, n_tokens, chunk_text). Narrow per-row
    generate — no shuffle; the chunk count per doc is
    ceil(max(n - overlap, 1) / stride), integer-exact in any engine.

    Scale shape: one scan, one explode; downstream embedding/indexing
    parallelism comes free from the exploded rows."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    toks_expr = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    staged = df.select(
        F.col(id_col).alias("doc_id"), toks_expr.alias("_toks")
    ).filter(F.size("_toks") > 0)
    n = F.size("_toks")
    n_chunks = F.floor(
        (F.greatest(n - F.lit(overlap), F.lit(1)) + F.lit(stride - 1)) / stride
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - F.lit(1)),
        lambda i: F.struct(
            i.cast("long").alias("chunk_id"),
            F.slice(F.col("_toks"), i * stride + 1, chunk_tokens).alias("ctoks"),
        ),
    )
    return (
        staged.select("doc_id", F.explode(chunks).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_id").alias("chunk_id"),
            F.size("c.ctoks").cast("long").alias("n_tokens"),
            F.array_join("c.ctoks", " ").alias("chunk_text"),
        )
    )


def temperature_sample(
    df: DataFrame,
    domain_col: str = "source",
    alpha: float = 0.3,
    budget_frac: float = 0.2,
    key_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based domain rebalancing (the multilingual-corpus
    standard, cf. the alpha-sampling of mC4/XLM-R; public technique):
    sample domain d at a rate proportional to ``n_d^(alpha-1)`` so small
    domains are up-weighted and huge ones down-weighted, with the total
    expected kept volume = ``budget_frac`` of the corpus. The scale
    constant is ``c = budget * N / sum_d n_d^alpha``; a domain whose rate
    caps at 1 contributes everything it has (the budget is then an upper
    bound — exact water-filling would re-spread the shortfall; this is
    the standard one-shot form).

    Membership is the same md5 bucket as every other sampler here, so
    temperature samples NEST with splits/strata samples and are stable
    under re-partitioning and re-runs.

    Scale shape: one tiny per-domain aggregate (|domains| rows), one
    scalar reduce over it, broadcast the (domain -> bucket bound) table
    back, narrow filter. The corpus itself is scanned once and never
    shuffled. Returns the kept rows plus the integer ``rate_bound``
    (bucket bound in [0, NUM_BUCKETS]) so the realized rate is auditable."""
    # Fixed-point discipline (learned the hard way: the first cut summed
    # pow() doubles, whose ORDER depends on partitioning — at uniform
    # domain sizes the rate lands exactly on an integer and floor()
    # flipped between engines/partitionings). pow outputs are rounded to
    # integer grids IMMEDIATELY (1e9 / 1e12 — round, never floor: round
    # is 1-ulp-tolerant at the grid, floor flips on k +/- ulp), the
    # normalizer is then an EXACT bigint sum, and every remaining op is
    # scalar IEEE arithmetic on identical inputs — bit-identical in any
    # engine. The final bucket bound is also round()ed: its knife edge
    # sits at half-integers, which the analytic value never naturally
    # hits (integers, which floor is sharp at, it DOES hit whenever
    # rates come out exact).
    counts = df.groupBy(F.col(domain_col).alias("_dom")).agg(
        F.count(F.lit(1)).alias("_nd")
    )
    nd = F.col("_nd").cast("double")
    staged = counts.select(
        "_dom",
        "_nd",
        F.round(F.pow(nd, F.lit(alpha)) * F.lit(1e9)).cast("long").alias("_pa_fp"),
        F.round(F.pow(nd, F.lit(alpha - 1.0)) * F.lit(1e12))
        .cast("long")
        .alias("_pr_fp"),
    )
    totals = staged.agg(
        F.sum("_nd").alias("_n"),
        F.sum("_pa_fp").alias("_z_fp"),  # exact bigint sum: order-free
    )
    rates = (
        staged.join(F.broadcast(totals))
        .select(
            "_dom",
            F.least(
                F.lit(float(NUM_BUCKETS)),
                F.round(
                    F.lit(budget_frac)
                    * F.col("_n")
                    / (F.col("_z_fp") / F.lit(1e9))
                    * (F.col("_pr_fp") / F.lit(1e12))
                    * F.lit(NUM_BUCKETS)
                ),
            )
            .cast("int")
            .alias("rate_bound"),
        )
    )
    return (
        df.join(F.broadcast(rates), df[domain_col] == rates["_dom"])
        .filter(hash_bucket(F.col(key_col)) < F.col("rate_bound"))
        .drop("_dom")
    )


def collocations(
    df: DataFrame,
    min_count: int = 5,
    top_k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """PMI-style collocation mining: rank adjacent pairs by the pointwise
    likelihood ratio ``n_ab * T / (n_a * n_b)`` (T = total bigram count) —
    monotone in PMI but computed in EXACT integer arithmetic
    (``lr_fp = (n_ab * T * 1e6) div (n_a * n_b)``), so the ranking is
    bit-identical across engines with no log/pow ULP hazard. The product
    ``n_ab * T * 1e6`` is routed through DECIMAL(38,0) (HUGEINT on the
    DuckDB oracle side): it exceeds int64 once ``n_ab * T > ~9.2e12``,
    which modest corpora reach — under ANSI mode the bigint form ERRORS
    there rather than wrapping. The quotient itself is bounded by
    ``T * 1e6 / n_ab`` and cast back to bigint. ``min_count`` drops the
    unstable low-frequency tail (classic PMI pathology: hapax pairs
    score highest).

    Scale: one bigram aggregate + one unigram aggregate (both map-side
    combined); the min_count-filtered bigram side is collocation-sized,
    so both stat joins broadcast it against the unigram vocabulary."""
    from ..core.session import spread
    from ..functions.text import ws_tokens

    bc = bigram_counts(df, text_col=text_col)
    total = bc.agg(F.sum("n").alias("_t"))
    uni = (
        spread(df)
        .select(F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("_nu"))
    )
    cand = bc.filter(F.col("n") >= min_count).join(F.broadcast(total))
    out = (
        cand.join(uni.withColumnRenamed("token", "token_a"), "token_a")
        .withColumnRenamed("_nu", "_na")
        .join(uni.withColumnRenamed("token", "token_b"), "token_b")
        .withColumnRenamed("_nu", "_nb")
        .select(
            "token_a",
            "token_b",
            F.col("n").alias("n_pair"),
            F.expr(
                "(CAST(n AS DECIMAL(38,0)) * _t * 1000000) div (_na * _nb)"
            ).alias("lr_fp"),
        )
    )
    return out.orderBy(
        F.col("lr_fp").desc(), F.col("token_a").asc(), F.col("token_b").asc()
    ).limit(top_k)


def curriculum_buckets(
    df: DataFrame,
    n_buckets: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-curriculum bucketing: rank the corpus by quality score
    (fixed-pointed, ties broken by id — a total order, so ntile is
    deterministic) and cut it into ``n_buckets`` equal-count phases with
    per-phase document and token budgets. The schedule table a curriculum
    trainer consumes: phase 1 = highest quality.

    Scale note: Spark executes an unpartitioned ntile window on a single
    partition — acceptable here only because the windowed projection is
    NARROW (id, q_fp, n_tokens: ~24 B/row); at 100 TB swap the exact
    ntile for an approx-quantile cut of q_fp (percentile_approx bounds,
    then a broadcast range lookup), trading exact equal counts for a
    fully parallel plan."""
    from ..functions.text import quality_score, ws_tokens

    from pyspark.sql import Window

    # quality_score is already floor-scaled to 1e-4; re-multiplying gives
    # k +/- 1 ulp, so ROUND (never floor — floor(k - ulp) = k-1) recovers
    # the exact integer in any engine
    q_fp = F.round(quality_score(F.col(text_col)) * 10_000).cast("long")
    staged = df.select(
        F.col(id_col).alias("_id"),
        q_fp.alias("q_fp"),
        F.size(ws_tokens(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    w = Window.orderBy(F.col("q_fp").desc(), F.col("_id").asc())
    return (
        staged.withColumn("phase", F.ntile(n_buckets).over(w))
        .groupBy("phase")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.max("q_fp").alias("q_max"),
            F.min("q_fp").alias("q_min"),
        )
    )


def curriculum_buckets_approx(
    df: DataFrame,
    n_buckets: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    accuracy: int = 10_000,
) -> DataFrame:
    """The 100 TB face of :func:`curriculum_buckets`: phase boundaries
    from ONE mergeable ``percentile_approx`` aggregate over the
    fixed-point quality (plus the id-hash tiebreak folded into the sort
    key so ties split deterministically), then a broadcast range lookup —
    no global window, no single-partition sort, fully parallel. Phase
    sizes are approximately equal (within the sketch's rank error at
    ``accuracy``) instead of exactly equal; same schema as the exact
    form, so the two are drop-in interchangeable."""
    from ..functions.text import quality_score, ws_tokens

    q_fp = F.round(quality_score(F.col(text_col)) * 10_000).cast("long")
    # composite sort key: quality in the high bits, id-hash bucket in the
    # low bits — ties inside one quality value spread uniformly, so a
    # corpus dominated by one score still cuts into n_buckets phases
    key = q_fp * NUM_BUCKETS + hash_bucket(F.col(id_col))
    staged = df.select(
        key.alias("_key"),
        q_fp.alias("q_fp"),
        F.size(ws_tokens(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = staged.agg(
        F.percentile_approx(
            F.col("_key"), F.array(*[F.lit(p) for p in probs]), F.lit(accuracy)
        ).alias("_cuts")
    )
    # phase = 1 + number of cut points BELOW the key, counted from the
    # TOP (phase 1 = highest quality, like the exact form)
    ranked = staged.join(F.broadcast(cuts))
    phase = (
        F.lit(n_buckets)
        - F.size(F.filter(F.col("_cuts"), lambda c: c < F.col("_key")))
    ).cast("int")
    return (
        ranked.withColumn("phase", phase)
        .groupBy("phase")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.max("q_fp").alias("q_max"),
            F.min("q_fp").alias("q_min"),
        )
    )
