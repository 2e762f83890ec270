"""Deduplication operators for training-data pipelines (SURVEY §7 P7).

Five dedup families, all shuffle-conscious:

* exact          — hash-groupBy on a normalized fingerprint (one shuffle)
* MinHash + LSH  — shingle -> K minhashes -> B bands -> bucket self-join on
                   band hash; candidate pairs verified by true Jaccard.
                   At 100 TB the band join touches only same-bucket pairs,
                   never the O(n^2) cross product.
* SimHash        — 64-bit bit-vote fingerprint; near-dups differ in few bits
* n-gram Jaccard — explode shingles -> self-join on shingle -> count
                   intersections (exact, for small/medium corpora or as the
                   verify stage behind LSH)
* embedding      — cosine-threshold pairs on a vector column

Hashing uses xxhash64 (JVM built-in, codegen'd). MinHash h_j(x) =
xxhash64(seed_j, shingle) with per-row min — equivalent to K independent
permutations for dedup purposes.
"""

from __future__ import annotations

import itertools
import math

from pyspark.sql import DataFrame, functions as F

from ..core.session import spread
from ..functions.text import fingerprint, has_min_tokens, word_shingles


def _with_caches(out: DataFrame, caches: list[DataFrame]) -> DataFrame:
    """Attach the persisted intermediates a plan depends on. Callers own the
    cache lifetime: materialize ``out``, then ``release_plan_caches(out)``.
    (Unpersisting inside the builder would evict before the lazy plan runs;
    never unpersisting leaks blocks across bench loops / long drivers.)"""
    out._spark_graft_caches = caches  # type: ignore[attr-defined]
    return out


def release_plan_caches(df: DataFrame) -> None:
    """Unpersist every cached intermediate attached by the dedup builders.

    Release is TERMINAL for plans that carry checkpoint handles
    (:class:`_CheckpointHandle`, e.g. ``dedup_components`` on the
    distributed path): a localCheckpoint truncates lineage, so once its
    blocks are freed the frame cannot recompute — re-using ``df`` after
    release raises instead of silently re-running the pipeline. Persisted
    intermediates merely recompute. Either way: materialize everything you
    need from ``df`` first, then release."""
    for c in getattr(df, "_spark_graft_caches", []):
        c.unpersist()


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct normalized content; keeper = min id. Single
    shuffle on the 16-byte fingerprint, map-side partial agg."""
    return (
        df.groupBy(fingerprint(F.col(text_col)).alias("fp"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def incremental_dedup(
    new_docs: DataFrame,
    seen_fingerprints: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-corpus (incremental) exact dedup: keep each NEW document that
    is (a) not already in the seen-fingerprint store and (b) the first copy
    (min id) of its content within the new batch — the shape every
    continuously-ingesting corpus needs (yesterday's 100 TB is a
    fingerprint-only snapshot, today's batch dedups against it without
    ever re-reading yesterday's text).

    ``seen_fingerprints`` needs one column ``fp`` (16-byte md5 hex, as
    written by :func:`exact_dedup` / this function — store the snapshot
    bucketed by ``fp`` and the anti join becomes shuffle-one-sided).

    Plan: fingerprint the new batch (narrow), window-free intra-batch
    dedup via groupBy(fp) min-id (single shuffle on the 16-byte key,
    map-side combine), then LEFT ANTI against the store on ``fp``. Both
    shuffles key on the fingerprint, so AQE reuses the partitioning.

    Returns (doc_id, fp, n_copies) — the surviving new rows."""
    fresh = (
        new_docs.select(
            F.col(id_col).alias("doc_id"), fingerprint(F.col(text_col)).alias("fp")
        )
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )
    return fresh.join(
        seen_fingerprints.select("fp"), "fp", "left_anti"
    ).select("doc_id", "fp", "n_copies")


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_words: int = 3,
) -> DataFrame:
    """(id, signature array<long>) — signature[j] = min over shingles of
    xxhash64(j, shingle). Empty-shingle docs get an empty signature and are
    excluded from LSH (nothing to compare)."""
    # Two-stage hashing, both materialized in their own projections:
    # 1. hash each shingle STRING once (the expensive part);
    # 2. derive the per-seed hash from that long via xxhash64(seed, base) —
    #    long-input hashing, no re-tokenization.
    # Inlining everything into the 64 per-seed lambdas re-tokenizes and
    # re-hashes strings 64x per row (measured 180s -> ~4s at sf0.1).
    staged = spread(df).select(
        F.col(id_col).alias("id"),
        F.transform(
            word_shingles(F.col(text_col), n=shingle_words),
            lambda s: F.xxhash64(s),
        ).alias("_base"),
    )
    base = F.col("_base")
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda j: F.array_min(F.transform(base, lambda b: F.xxhash64(j, b))),
    )
    return staged.select(
        "id",
        F.when(F.size(base) > 0, sig).otherwise(F.array().cast("array<bigint>")).alias(
            "signature"
        ),
    )


def minhash_lsh_candidates(
    signatures: DataFrame, bands: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """LSH banding: hash each band of the signature to a bucket; docs sharing
    any (band, bucket) become a candidate pair (id_a < id_b). The self-join
    shuffles on (band, bucket) — fine-grained keys, no cross product."""
    assert bands * rows_per_band <= 1024
    banded = signatures.filter(F.size("signature") > 0).select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.slice(
                                F.col("signature"), b * rows_per_band + 1, rows_per_band
                            ).cast("string")
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    a = banded.toDF("id_a", "band", "bucket")
    b = banded.toDF("id_b", "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_words: int = 3,
) -> DataFrame:
    """Candidate pairs from LSH, verified by estimated Jaccard = fraction of
    matching minhashes. Returns (id_a, id_b, est_jaccard >= threshold)."""
    # persist: the signature table feeds the band join AND both verify sides
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_words).persist()
    sigs.count()  # eager: an unmaterialized cache is recomputed by EVERY consumer branch
    cands = minhash_lsh_candidates(sigs, bands, num_hashes // bands)
    sa = sigs.toDF("id_a", "sig_a")
    sb = sigs.toDF("id_b", "sig_b")
    joined = cands.join(sa, "id_a").join(sb, "id_b")
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                lambda m: m,
            )
        )
        / F.size("sig_a")
    )
    out = joined.select(
        "id_a", "id_b", F.round(est, 4).alias("est_jaccard")
    ).filter(F.col("est_jaccard") >= threshold)
    return _with_caches(out, [sigs])


def minhash_dedup_pairs_md5(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_words: int = 3,
) -> DataFrame:
    """MinHash+LSH with md5 string-min hashing — slower than the xxhash64
    family (string hashing + lexicographic mins) but reproducible in ANY
    engine with md5, which makes the whole LSH construction
    oracle-checkable against DuckDB. Same banding/verify shape as
    :func:`minhash_dedup_pairs`."""
    rows_per_band = num_hashes // bands
    # guard on the cheap token count, not the shingle array: shingle-array
    # predicates get pushed below the spread repartition and re-run the
    # pipeline serially on the unspread input
    staged = (
        spread(df)
        .filter(has_min_tokens(F.col(text_col), shingle_words))
        .select(
            F.col(id_col).alias("id"),
            word_shingles(F.col(text_col), n=shingle_words).alias("_sh"),
        )
    )

    # seed loop unrolled in Python (scalar literals): the outer transform
    # over sequence(0, K-1) with a Column seed falls out of codegen — same
    # cliff measured 10x on the universal variant
    def _seed_min(j: int):
        return F.array_min(
            F.transform(
                F.col("_sh"), lambda s: F.md5(F.concat(F.lit(f"{j}|"), s))
            )
        )

    sig = F.array(*[_seed_min(j) for j in range(num_hashes)])
    sigs = staged.select("id", sig.alias("signature")).persist()
    sigs.count()  # eager materialization (see minhash_dedup_pairs)
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.array_join(
                                F.slice(F.col("signature"), b * rows_per_band + 1, rows_per_band),
                                ",",
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    a = banded.toDF("id_a", "band", "bucket")
    b = banded.toDF("id_b", "band", "bucket")
    cands = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sigs.toDF("id_a", "sig_a")
    sb = sigs.toDF("id_b", "sig_b")
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                lambda m: m,
            )
        )
        / F.size("sig_a")
    )
    out = (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", F.round(est, 4).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )
    return _with_caches(out, [sigs])


# ---------------------------------------------------------------- md5-derived
# Oracle-checkable hash families. xxhash64 is JVM-only, so the production
# variants above can't be reproduced in DuckDB; these derive all hash bits
# from md5 hex (available in every engine) through INTEGER-ONLY arithmetic —
# nibble extraction, base-16 folds, affine universal hashing — which is
# bit-exact across engines (float folds are not: DuckDB's list_reduce is a
# pairwise reduction, not a sequential fold).

MERSENNE31 = 2147483647  # 2^31 - 1; universal-hash modulus


def simhash_bits_md5(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", shingle_n: int = 2
) -> DataFrame:
    """(id, bits array<int> of length 64) — SimHash whose shingle hashes are
    the first 16 md5 hex digits packed into two 32-bit halves. Integer-only,
    so a DuckDB oracle reproduces every bit.

    r18 shape: explode the shingles and take the 64 per-bit votes as ONE
    codegen'd hash aggregation (64 literal-shift sums + a count) instead of
    64 interpreted HOF folds over a per-row array — guide §4.1 (built-in
    aggregations run in whole-stage codegen; array lambdas never do) and
    §2.3 (partial aggregation: spread() keeps each doc's shingles in one
    partition, so the map-side combine collapses to one 66-long row per doc
    before the exchange). bit_i = (2·c_i > n) is the same decision as the
    old vote fold: Σ(2b−1) = 2c − n > 0. Hex packing is one ``conv`` per
    half instead of an 8-nibble ascii fold — same integer bit-for-bit.

    Precondition (dedup-family contract): ``id_col`` values must be
    UNIQUE. The groupBy("id") vote aggregation merges all shingles that
    share an id into ONE combined simhash row, where the pre-r18 per-row
    array fold emitted one simhash per input row — feeding non-unique
    ids silently changes both the row count and the signatures."""
    # cheap token-count guard (see minhash_dedup_pairs_md5): an _md5s-size
    # predicate pushes below the repartition and md5-hashes serially
    staged = (
        spread(df)
        .filter(has_min_tokens(F.col(text_col), shingle_n))
        .select(
            F.col(id_col).alias("id"),
            F.explode(word_shingles(F.col(text_col), n=shingle_n)).alias("_sh"),
        )
        .select("id", F.md5("_sh").alias("_m"))
        .select(
            "id",
            F.conv(F.substring("_m", 1, 8), 16, 10).cast("bigint").alias("_lo"),
            F.conv(F.substring("_m", 9, 8), 16, 10).cast("bigint").alias("_hi"),
        )
    )
    counts = staged.groupBy("id").agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(F.shiftright(F.col("_lo"), i).bitwiseAND(F.lit(1))).alias(f"_c{i}")
            for i in range(32)
        ],
        *[
            F.sum(F.shiftright(F.col("_hi"), i).bitwiseAND(F.lit(1))).alias(
                f"_c{i + 32}"
            )
            for i in range(32)
        ],
    )
    bits = [
        F.when(F.col(f"_c{i}") * 2 > F.col("_n"), F.lit(1)).otherwise(F.lit(0))
        for i in range(64)
    ]
    return counts.select("id", F.array(*bits).alias("bits"))


def _bit_fold(bits_slice):
    """Pack a 0/1 int array into one bigint (left fold ``acc*2 + b``) —
    bit-identical to DuckDB's ``list_reduce`` over the same slice."""
    return F.aggregate(
        bits_slice, F.lit(0).cast("bigint"), lambda acc, x: acc * 2 + x
    )


def simhash_combo_m(
    n: int, blocks: int, max_hamming: int, target_bucket_size: int = 16
) -> int:
    """Derive the multi-index combination size m from the corpus size: the
    smallest m whose key space 2^(m*width) keeps expected bucket occupancy
    near ``target_bucket_size`` (the same move as embedding LSH's auto-P),
    capped at ``blocks - max_hamming`` (the pigeonhole correctness bound)."""
    width = 64 // blocks
    m_max = blocks - max_hamming
    need_bits = math.log2(max(n, 2) / max(target_bucket_size, 1))
    return max(1, min(m_max, math.ceil(max(need_bits, 1.0) / width)))


def simhash_dedup_pairs_md5(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 6,
    blocks: int = 8,
    combo_m: int | None = None,
    target_bucket_size: int = 16,
) -> DataFrame:
    """Near-dup pairs by md5-SimHash Hamming distance using multi-index
    pigeonhole blocking: the 64 fingerprint bits split into ``blocks``
    chunks, and every combination of ``combo_m`` chunks becomes one join
    key — C(blocks, m) keys per doc over a 2^(m*width) value space. A pair
    within Hamming <= max_hamming damages at most max_hamming chunks,
    leaving >= blocks - max_hamming clean, so it always shares a fully
    clean combo while random collisions shrink by 2^((m-1)*width): the key
    space WIDENS with m instead of being pinned at blocks * 2^width (the
    old shape whose collision candidates grew O(n^2 / 2048)).

    ``combo_m=None`` auto-derives m from a corpus count()
    (:func:`simhash_combo_m`); pass it explicitly to pin oracle constants.

    The fingerprint rides the self-join packed as two 32-bit halves
    (``fp_lo``/``fp_hi``, bigints) and pairs verify via bit_count(xor) —
    no 64-int bits array in the shuffle and no verify re-joins. Integer
    arithmetic only, so a DuckDB oracle reproduces every bit vote, combo
    key and Hamming distance bit-for-bit."""
    assert max_hamming < blocks and 64 % blocks == 0
    width = 64 // blocks
    if combo_m is None:
        combo_m = simhash_combo_m(df.count(), blocks, max_hamming, target_bucket_size)
    assert 1 <= combo_m <= blocks - max_hamming and combo_m * width <= 62
    combos = list(itertools.combinations(range(blocks), combo_m))

    bits_df = simhash_bits_md5(df, text_col, id_col)
    packed = bits_df.select(
        "id",
        _bit_fold(F.slice("bits", 1, 32)).alias("fp_lo"),
        _bit_fold(F.slice("bits", 33, 32)).alias("fp_hi"),
        *[
            _bit_fold(F.slice("bits", b * width + 1, width)).alias(f"_c{b}")
            for b in range(blocks)
        ],
    )

    def _combo_key(combo: tuple[int, ...]):
        key = F.col(f"_c{combo[0]}")
        for b in combo[1:]:
            key = key * (1 << width) + F.col(f"_c{b}")
        return key

    # persist: the bit-vote + packing pass feeds both self-join sides
    keyed = (
        packed.select(
            "id",
            "fp_lo",
            "fp_hi",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(ci).alias("combo"), _combo_key(c).alias("bkey")
                        )
                        for ci, c in enumerate(combos)
                    ]
                )
            ).alias("ck"),
        )
        .select("id", "fp_lo", "fp_hi", "ck.combo", "ck.bkey")
        .persist()
    )
    keyed.count()  # eager: an unmaterialized cache is recomputed per consumer branch
    ham = F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b"))) + F.bit_count(
        F.col("hi_a").bitwiseXOR(F.col("hi_b"))
    )
    out = (
        keyed.toDF("id_a", "lo_a", "hi_a", "combo", "bkey")
        .join(keyed.toDF("id_b", "lo_b", "hi_b", "combo", "bkey"), ["combo", "bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "lo_a", "hi_a", "lo_b", "hi_b")
        .distinct()
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    return _with_caches(out, [keyed])


def minhash_universal_coeffs(num_hashes: int, seed: int) -> tuple[list[int], list[int]]:
    """Deterministic affine coefficients (a_j, b_j) for universal hashing
    mod 2^31-1; shared verbatim by the Spark plan and the generated oracle
    SQL."""
    import numpy as np

    rng = np.random.default_rng(seed)
    a = [int(x) for x in rng.integers(1, MERSENNE31, num_hashes)]
    b = [int(x) for x in rng.integers(0, MERSENNE31, num_hashes)]
    return a, b


def minhash_dedup_pairs_universal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_words: int = 3,
    seed: int = 29,
) -> DataFrame:
    """MinHash+LSH with classic universal hashing: each shingle is md5-hashed
    ONCE, packed to a 32-bit base, and the K signature slots come from affine
    maps h_j = (a_j*base + b_j) mod 2^31-1 — integer-only and engine-portable,
    unlike the per-seed string hashing of :func:`minhash_dedup_pairs_md5`
    (K string hashes per shingle) or the JVM-only xxhash64 family. This is
    both the oracle-checkable AND the production-speed construction.

    Band buckets are the joined signature-slice strings themselves; hashing
    them buys nothing at these key widths. Signatures ride through the band
    join and est_jaccard is deterministic per pair, so band-collision
    duplicates collapse with a final distinct — no verify re-joins and no
    persist: the two join sides are the same canonical subplan, so the
    banded shuffle is built once and read twice (ReusedExchange,
    plan-asserted in tests), which also computes the md5+affine signature
    stage exactly once. Trade-off vs the verify-join shape (still used by
    :func:`minhash_dedup_pairs_md5`): the band shuffle carries the K-long
    signature (~bands x K x 8 B per doc) instead of slim band keys, in
    exchange for zero cluster-wide cache residency and two fewer join
    stages — the right call when signatures are a few hundred bytes."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    a_co, b_co = minhash_universal_coeffs(num_hashes, seed)
    p = F.lit(MERSENNE31)

    staged = (
        spread(df)
        .filter(has_min_tokens(F.col(text_col), shingle_words))
        .select(
            F.col(id_col).alias("id"),
            F.transform(
                word_shingles(F.col(text_col), n=shingle_words), lambda s: F.md5(s)
            ).alias("_md5s"),
        )
    )
    based = staged.select(
        "id",
        F.transform(
            # conv parses the 8 hex digits natively — bit-identical to the
            # old 8-nibble ascii fold at ~1/40th the expression nodes (r18)
            F.col("_md5s"), lambda h: F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % p
        ).alias("_bp"),
    )

    # The seed loop is unrolled in Python: 64 scalar-literal transforms. An
    # outer transform over sequence(0,63) with element_at(coeff_lit, j+1)
    # indexing falls out of codegen and measured 10x slower (51 s -> 5 s at
    # sf0.1) for identical semantics.
    def _affine(a_j: int, b_j: int):
        return lambda x: (F.lit(a_j) * x + F.lit(b_j)) % p

    sig = F.array(
        *[
            F.array_min(F.transform(F.col("_bp"), _affine(a_co[j], b_co[j])))
            for j in range(num_hashes)
        ]
    )
    sigs = based.select("id", sig.alias("signature"))
    banded = sigs.select(
        "id",
        "signature",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.array_join(
                            F.slice("signature", b * rows_per_band + 1, rows_per_band).cast(
                                "array<string>"
                            ),
                            ",",
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "signature", "bb.band", "bb.bucket")
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                lambda m: m,
            )
        )
        / F.size("sig_a")
    )
    # shuffle_hash hint: left alone Catalyst broadcasts one side (the banded
    # frame estimates small), which computes the signature stage TWICE and
    # ships it through the driver; with both sides shuffling on (band,
    # bucket) the two identical child plans collapse into one exchange
    # (ReusedExchange) — the signature stage runs exactly once, no persist.
    return (
        banded.toDF("id_a", "sig_a", "band", "bucket")
        .hint("shuffle_hash")
        .join(
            banded.toDF("id_b", "sig_b", "band", "bucket").hint("shuffle_hash"),
            ["band", "bucket"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(est, 4).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
        .distinct()
    )


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", num_bits: int = 64
) -> DataFrame:
    """64-bit SimHash over word shingles: bit i of the fingerprint is the
    majority vote of shingle-hash bit i. Pure built-ins — per-bit vote =
    sum over shingle hashes of (bit_i ? +1 : -1); the bit loop unrolls at
    plan-build time (shift amounts must be Python ints)."""
    # materialize shingle hashes once; the 64 per-bit votes then fold over a
    # column reference instead of re-tokenizing+re-hashing per bit
    staged = spread(df).select(
        F.col(id_col).alias("id"),
        F.transform(
            word_shingles(F.col(text_col), n=2), lambda s: F.xxhash64(s)
        ).alias("_hashes"),
    )
    hashes = F.col("_hashes")

    def _vote_fn(i):
        # two-arg merge lambda required by F.aggregate; close over i
        return lambda vacc, h: vacc + (
            F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1
        )

    fp = F.lit(0).cast("bigint")
    for i in range(num_bits):
        vote = F.aggregate(hashes, F.lit(0).cast("bigint"), _vote_fn(i))
        # two's-complement top bit: 1<<63 is long-min
        weight = (1 << i) if i < 63 else -(1 << 63)
        fp = fp + F.when(vote > 0, F.lit(weight).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return staged.select("id", fp.alias("simhash"))


def simhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    blocks: int = 4,
    combo_m: int | None = None,
    target_bucket_size: int = 16,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming, using
    multi-index pigeonhole blocking (see :func:`simhash_dedup_pairs_md5`):
    the 64-bit fingerprint splits into ``blocks`` chunks, and every
    combination of ``combo_m`` chunks joins as one key — any pair within
    distance max_hamming keeps >= blocks - max_hamming chunks clean and so
    shares a fully-clean combo. ``combo_m=None`` auto-derives from corpus
    size (at the defaults blocks=4 / max_hamming=3 the cap forces m=1, the
    classic one-chunk construction). The packed fingerprint rides the join;
    verify is a bit_count(xor). No O(n^2) comparison anywhere."""
    assert max_hamming < blocks and 64 % blocks == 0
    width = 64 // blocks
    if combo_m is None:
        combo_m = simhash_combo_m(df.count(), blocks, max_hamming, target_bucket_size)
    assert 1 <= combo_m <= blocks - max_hamming and combo_m * width <= 62
    combos = list(itertools.combinations(range(blocks), combo_m))
    mask = (1 << width) - 1
    # persist: the fingerprint pass feeds both sides of the combo self-join
    fps = simhash(df, text_col, id_col).persist()
    fps.count()  # eager materialization (see simhash_dedup_pairs_md5)

    def _chunk(b: int):
        return F.shiftright(F.col("simhash"), b * width).bitwiseAND(F.lit(mask))

    def _combo_key(combo: tuple[int, ...]):
        key = _chunk(combo[0])
        for b in combo[1:]:
            key = key * (1 << width) + _chunk(b)
        return key

    keyed = fps.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(ci).alias("combo"), _combo_key(c).alias("bkey"))
                    for ci, c in enumerate(combos)
                ]
            )
        ).alias("ck"),
    ).select("id", "simhash", "ck.combo", "ck.bkey")
    a = keyed.toDF("id_a", "fp_a", "combo", "bkey")
    b = keyed.toDF("id_b", "fp_b", "combo", "bkey")
    pairs = (
        a.join(b, ["combo", "bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "fp_a", "fp_b")
        .distinct()
    )
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    out = pairs.withColumn("hamming", ham).filter(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", "hamming")
    return _with_caches(out, [fps])


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
    cache: bool = True,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs >= threshold.

    Distinct-shingle explode -> self-join on shingle -> intersection counts;
    union = |A| + |B| - |A ∩ B|. The shingle join key is fine-grained, so
    skew is bounded by shingle frequency — stopword-only shingles are the
    hot keys, and one shingle shared by k docs contributes k^2 join rows to
    a single reducer.

    ``max_doc_freq`` is the stoplist: shingles appearing in more than that
    many documents are dropped BEFORE the self-join (bounding every join
    key to max_doc_freq^2 pairs), and Jaccard is computed over the filtered
    shingle space on both sides of the ratio — a document's size shrinks by
    exactly its dropped shingles, so stopword-boilerplate overlap stops
    inflating similarity. The number of dropped shingles is logged. At
    corpus scale this is the difference between a bounded reducer and one
    straggler owning ('the of the')^2."""
    import logging

    # r18 optimization note: a "carry size(array) through the explode"
    # rewrite (drop the per-doc `sizes` aggregation + both size-attach
    # joins) was built and MEASURED SLOWER (~2x at bench scale): naming
    # the shingle array as a column lets InferFiltersFromGenerate push
    # size(_sh) > 0 / isnotnull(_sh) below the spread() exchange, so the
    # whole word_shingles chain runs (twice) inside the single
    # pre-spread scan task — serializing exactly the stage spread()
    # exists to parallelize. The explode-of-expression shape keeps the
    # heavy compute above the exchange; the sizes branches reuse the
    # shingle subtree's exchange and are cheap relative to that hazard.
    sh = spread(df).select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), n=n))).alias("shingle"),
    )
    if max_doc_freq is not None:
        # r18: persist the EXPLODED table (one shingle-compute pass) instead
        # of the post-anti-join one — the old shape ran the tokenize/shingle
        # explode twice (stoplist derivation + anti-join input) and cached
        # the filtered rows. With sh0 cached, the stoplist groupBy stays
        # map-side-combinable (skew-safe: hot keys combine before the
        # shuffle, never concentrating on one reducer) and each downstream
        # consumer re-applies only the broadcast anti-join probe — a
        # near-free stream filter vs a full corpus-tokenize pass.
        sh0 = sh.persist()
        hot = (
            sh0.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_doc_freq)
            .select("shingle")
            .persist()
        )
        n_hot = hot.count()  # materializes sh0 + stoplist in one job
        logging.getLogger(__name__).info(
            "ngram_jaccard_pairs: stoplist dropped %d shingles with doc-freq > %d",
            n_hot,
            max_doc_freq,
        )
        # re-select: the USING join moves the key column first, and the
        # pair-join below renames positionally
        sh = sh0.join(F.broadcast(hot), "shingle", "left_anti").select("id", "shingle")
        caches = [hot, sh0]
    elif cache:
        # r18: the shingle table feeds THREE consumers (sizes + both join
        # sides) — un-persisted, each re-ran the tokenize/shingle explode;
        # one O(corpus-tokens) cache replaces two full compute passes in
        # every derivation (this builder backs ~10 registered faces).
        # ``cache=False`` opts out for callers whose downstream work is so
        # light that the columnar cache-encode outweighs two fused
        # re-derivations (measured: soft_dedup_weights).
        sh = sh.persist()
        sh.count()  # eager: the three consumers are INDEPENDENT stages of
        # one job and race a lazy cache — measured as the explode running
        # 2-3x anyway PLUS triple cache writes (CPU doubled)
        caches = [sh]
    else:
        caches = []
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.toDF("id_a", "shingle")
    b = sh.toDF("id_b", "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.toDF("id_a", "n_a")
    sb = sizes.toDF("id_b", "n_b")
    out = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                4,
            ),
        )
    )
    result = out.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )
    return _with_caches(result, caches)


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram *containment* pairs: C(A,B) = |A ∩ B| / min(|A|,|B|).

    Jaccard under-scores subset duplicates (a document embedded verbatim
    inside a much longer one has tiny union-normalized similarity);
    containment normalizes by the smaller set, so quote-expansions and
    boilerplate-wrapped copies surface. Same shingle self-join plan as
    :func:`ngram_jaccard_pairs` (one explode, one shingle-keyed join,
    bounded per-key fan-out with the optional stoplist)."""
    sh = spread(df).select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), n=n))).alias(
            "shingle"
        ),
    )
    if max_doc_freq is not None:
        # r18: cache the exploded table, not the filtered one — one
        # shingle-compute pass; consumers re-apply only the broadcast
        # anti-join probe (see ngram_jaccard_pairs)
        sh0 = sh.persist()
        hot = (
            sh0.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_doc_freq)
            .select("shingle")
            .persist()
        )
        hot.count()
        sh = sh0.join(F.broadcast(hot), "shingle", "left_anti").select("id", "shingle")
        caches = [hot, sh0]
    else:
        # same three-consumer shape as ngram_jaccard_pairs — cache once
        sh = sh.persist()
        caches = [sh]
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.toDF("id_a", "shingle")
    b = sh.toDF("id_b", "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.toDF("id_a", "n_a")
    sb = sizes.toDF("id_b", "n_b")
    out = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "containment",
            F.round(F.col("n_common") / F.least("n_a", "n_b"), 4),
        )
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment")
    )
    return _with_caches(out, caches)


def ngram_jaccard_pairs_prefix(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard pairs via *positional prefix filtering* — the
    ppjoin-family candidate pruning (Xiao et al., "Efficient Similarity
    Joins for Near Duplicate Detection", WWW'08; public algorithm).

    Identical output to :func:`ngram_jaccard_pairs`, different physical
    plan: order every document's shingles by global rarity (doc-freq asc,
    shingle asc — one canonical total order corpus-wide); a pair with
    J >= t MUST share a shingle inside each side's first
    ``m - ceil(t*m) + 1`` shingles, so only those prefixes enter the
    self-join. Prefix shingles are by construction the RAREST, so the
    per-key fan-out of the candidate join collapses (the hot stopword
    shingles that dominate the naive join never leave the suffix).
    Candidates are verified with an in-row ``array_intersect`` over the
    full (sorted) shingle arrays — no second corpus-wide shuffle.

    Scale shape: shuffle(shingle for doc-freq) + shuffle(id for arrays) +
    candidate join keyed on rare shingles + size filter
    ``min >= ceil(t * max)`` before dedup. At 100 TB this is the plan
    that survives; the naive shingle join's hot keys do not."""
    sh = spread(df).select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), n=n))).alias(
            "shingle"
        ),
    )
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    ranked = sh.join(dfreq, "shingle")
    # one array per doc, ordered by (doc-freq asc, shingle asc): struct sort
    toks = (
        ranked.groupBy("id")
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("_df"), F.col("shingle")))
                ),
                lambda s: s["shingle"],
            ).alias("toks")
        )
        .withColumn("m", F.size("toks"))
        .withColumn(
            "_plen", F.col("m") - F.ceil(F.lit(threshold) * F.col("m")) + 1
        )
    )
    toks = toks.persist()
    toks.count()  # three consumers below; eager so the explode runs once
    pref = toks.select(
        "id", "m", F.explode(F.slice("toks", 1, F.col("_plen"))).alias("shingle")
    )
    pa = pref.toDF("id_a", "m_a", "shingle")
    pb = pref.toDF("id_b", "m_b", "shingle")
    cand = (
        pa.join(pb, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        # length filter: J >= t forces min(|A|,|B|) >= ceil(t * max(|A|,|B|))
        .filter(
            F.least("m_a", "m_b") >= F.ceil(F.lit(threshold) * F.greatest("m_a", "m_b"))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    ta = toks.select(F.col("id").alias("id_a"), F.col("toks").alias("_ta"), F.col("m").alias("n_a"))
    tb = toks.select(F.col("id").alias("id_b"), F.col("toks").alias("_tb"), F.col("m").alias("n_b"))
    verified = (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("n_common", F.size(F.array_intersect("_ta", "_tb")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return _with_caches(verified, [toks])


def _driver_union_find(rows, spark) -> DataFrame:
    """Union-find with path compression, min id as root — identical output
    to the distributed propagation, without per-round Spark jobs."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    nodes = {v for pair in rows for v in pair}
    out = [(n, find(n)) for n in sorted(nodes)]
    return spark.createDataFrame(out, "id bigint, component bigint")


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star rewiring (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14): for every node u, connect each
    strictly-larger neighbor v > u to m = min(N(u) ∪ {u}). Output edges are
    always (larger, smaller), never self-loops (m <= u < v)."""
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mins = sym.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m")
    )
    return (
        sym.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star rewiring: orient each edge high→low; for every node u,
    connect u and each smaller neighbor to m = min(N_<(u))."""
    directed = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    mins = directed.groupBy("src").agg(F.min("dst").alias("m"))
    neighbors = (
        directed.join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    centers = mins.select(F.col("src"), F.col("m").alias("dst"))
    return (
        neighbors.union(centers)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


class _CheckpointHandle:
    """Unpersistable handle to a ``localCheckpoint``ed DataFrame's cached
    RDD. PySpark exposes no API to free checkpoint blocks (only async GC
    reclaims them); the block-holding RDD is reachable through the
    ``LogicalRDD`` plan node. Shares the ``unpersist()`` shape of
    DataFrame/Broadcast so it can ride ``_with_caches`` lists."""

    def __init__(self, df: DataFrame):
        try:
            self._rdd = df._jdf.queryExecution().analyzed().rdd()
        except Exception:
            self._rdd = None  # plan shape changed across versions: degrade to GC

    def unpersist(self) -> None:
        if self._rdd is not None:
            try:
                self._rdd.unpersist(False)
            except Exception:
                pass


def star_contraction(
    edges: DataFrame, max_iter: int = 50
) -> tuple[DataFrame, int]:
    """Alternating large-star/small-star contraction to a per-component
    star graph: returns ((id, component) labels, rounds used). Converges in
    O(log n) alternation rounds even on pathological high-diameter graphs
    (a chain of n nodes halves its height every round), vs the O(diameter)
    rounds of plain min-label propagation. Each round is two groupBy + two
    join shuffles over the (small) duplicate-pair graph; per-round persists
    truncate lineage so round k doesn't recompute rounds 1..k-1.

    Fixpoint detection: a (count, sum(src), sum(dst)) checksum gates the
    candidate rounds (necessary, one cheap agg per round), and a checksum
    match is then CONFIRMED by an exact set diff (``exceptAll``) before
    declaring convergence — two distinct edge sets can share all three
    checksum values, so equality alone is not sufficient. The exact diff
    runs at most once per call in practice (checksums almost never
    collide before the true fixpoint). Exhausting ``max_iter`` without a
    confirmed fixpoint warns and returns the best-effort labels.

    Lineage discipline: each round ``localCheckpoint(eager=True)``s — a
    persist() alone caches EXECUTION but the round-k logical plan still
    nests rounds 1..k-1 (the analyzer re-walks a plan that grows ~5x per
    round; measured minutes of pure driver analysis by round 10 on a
    256-node chain). Checkpointing truncates the plan to the materialized
    partitions, keeping every round's analysis O(1). Each round's blocks
    are explicitly unpersisted once the NEXT round is materialized (safe:
    eager checkpoint = fully computed; necessary: the checkpointed RDDs
    are otherwise only freed by async GC — measured 12 live cached RDD
    snapshots after an 11-round run without this). The final round rides
    the returned plan's cache list for ``release_plan_caches``.
    localCheckpoint is executor-local (not fault-tolerant); a long-lived
    production job on flaky clusters should set a reliable
    ``spark.sparkContext.setCheckpointDir`` and swap in
    ``.checkpoint()``."""
    cur = (
        edges.select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    cur_handle = _CheckpointHandle(cur)
    checksum = cur.agg(
        F.count("*").alias("n"), F.sum("src").alias("ss"), F.sum("dst").alias("sd")
    ).first()
    prev = (checksum["n"], checksum["ss"], checksum["sd"])
    rounds = 0
    converged = False
    for _ in range(max_iter):
        rounds += 1
        nxt = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        checksum = nxt.agg(
            F.count("*").alias("n"), F.sum("src").alias("ss"), F.sum("dst").alias("sd")
        ).first()
        state = (checksum["n"], checksum["ss"], checksum["sd"])
        if state == prev:
            # checksum equality is necessary but not sufficient; both sides
            # are distinct canonical sets of equal count, so one-sided
            # containment (empty exceptAll) proves set equality
            converged = nxt.exceptAll(cur).isEmpty()
        # nxt is fully materialized (eager) — the previous round's blocks
        # can go now; without this every round's snapshot stays cached
        cur_handle.unpersist()
        cur, cur_handle = nxt, _CheckpointHandle(nxt)
        prev = state
        if converged:
            break
    if not converged:
        import warnings

        warnings.warn(
            f"star_contraction exhausted max_iter={max_iter} without a "
            "confirmed fixpoint; component labels may be unconverged",
            RuntimeWarning,
            stacklevel=2,
        )
    # converged star graph: every non-root points straight at its root
    labels = (
        cur.select(F.col("src").alias("id"), F.col("dst").alias("component"))
        .union(
            cur.select(F.col("dst").alias("id"), F.col("dst").alias("component"))
        )
        .groupBy("id")
        .agg(F.min("component").alias("component"))
    )
    return _with_caches(labels, [cur_handle]), rounds


def dedup_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
    small_graph_threshold: int = 1_000_000,
) -> DataFrame:
    """Duplicate-cluster canonicalization: connected components over a
    near-dup pair list -> (id, component) with component = min id reachable,
    so every duplicate cluster gets one canonical keeper regardless of which
    dedup family (exact / MinHash / SimHash / embedding) produced the pairs.
    Labels are canonical (min id), so results are engine-comparable — the
    DuckDB oracle walks the same graph with a recursive CTE.

    The PAIR graph is tiny relative to the corpus (it holds near-dups, not
    documents), so below ``small_graph_threshold`` edges the labeling runs
    as driver-side union-find — one Spark job to gather the pairs instead
    of per-round jobs, same canonical output. Above it,
    :func:`star_contraction` runs the alternating large-star/small-star
    algorithm: O(log n) rounds regardless of component diameter, so a
    pathological chain graph (diameter n) no longer degenerates to n
    propagation rounds."""
    # persist + count, THEN branch: a take(threshold+1) here re-runs the
    # whole upstream dedup pipeline once per limit scale-up wave (1, 4, 16
    # ... partitions) — measured 3x the pipeline cost at 32 partitions.
    # One counted cache pass feeds whichever path runs.
    edges_dir = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")).persist()
    n_edges = edges_dir.count()
    # propagate the INPUT's cache handles (e.g. the jaccard builder's
    # shingle cache, r18) so releasing the component frame frees them too
    upstream = getattr(pairs, "_spark_graft_caches", [])
    if n_edges <= small_graph_threshold:
        rows = [(r.src, r.dst) for r in edges_dir.collect()]
        out = _driver_union_find(rows, pairs.sparkSession)
        return _with_caches(out, [edges_dir, *upstream])
    labels, _ = star_contraction(edges_dir, max_iter=max_iter)
    # star_contraction drops self-loops, so a node appearing ONLY in
    # self-pairs (id_a == id_b) would vanish from this branch while the
    # driver union-find labels it — re-add such ids as singletons so both
    # branches (and the oracle) agree. min() keeps the real component for
    # nodes that also have non-self edges (component <= id always).
    selfs = (
        edges_dir.filter(F.col("src") == F.col("dst"))
        .select(F.col("src").alias("id"), F.col("src").alias("component"))
    )
    out = (
        labels.select("id", "component")
        .union(selfs)
        .groupBy("id")
        .agg(F.min("component").alias("component"))
    )
    inner = getattr(labels, "_spark_graft_caches", [])
    return _with_caches(out, [edges_dir, *inner, *upstream])


def embedding_dup_pairs_lsh(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    dim: int | None = None,
    num_planes: int | None = 5,
    num_tables: int = 12,
    seed: int = 29,
    target_bucket_size: int = 64,
) -> DataFrame:
    """Embedding near-dup pairs routed through random-hyperplane LSH buckets:
    only pairs sharing a (table, bucket) are cosine-verified, replacing the
    O(n^2) cross product of :func:`embedding_dup_pairs` with bucket-local
    work — the scale path for 100 TB corpora. Candidate generation is a
    single projection + equi-join on (table, bucket); vectors are re-joined
    onto the deduped id pairs so the wide arrays never ride the bucket
    shuffle.

    Recall is the LSH collision bound (1-(1-(1-theta/pi)^P)^T): ~0.95+ at
    true near-dup thresholds (cos >= 0.9, P=8/T=8); at looser thresholds
    choose fewer planes / more tables (the defaults here target cos ~0.45,
    recall ~0.77). Keep :func:`embedding_dup_pairs` as the exact
    verify-stage on bounded slices.

    ``num_planes=None`` derives P from the corpus: with FIXED planes the
    bucket count is constant, so random-collision candidates grow O(n^2/2^P)
    — the quadratic creeps back at scale. P = log2(n/target_bucket_size)
    keeps expected bucket occupancy (and so candidates-per-row) flat as n
    grows; costs one count() job."""
    from .similarity import _hyperplanes, _planes_lit

    if dim is None:
        dim = df.select(F.size(vec_col).alias("d")).first()["d"]
    if num_planes is None:
        n = df.count()
        num_planes = max(4, math.ceil(math.log2(max(n, 1) / target_bucket_size)))
    all_planes = [_hyperplanes(dim, num_planes, seed + t) for t in range(num_tables)]
    planes_lit = _planes_lit(all_planes)
    weights = F.lit([float(1 << j) for j in range(num_planes)])
    as_double = F.col(vec_col).cast("array<double>")

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )

    tables = F.transform(
        planes_lit,
        lambda planes_t, t: F.struct(
            t.alias("table"),
            F.aggregate(
                F.transform(
                    planes_t,
                    lambda p, j: F.when(
                        _dot(p, F.col("vec")) >= 0, F.element_at(weights, j + F.lit(1))
                    ).otherwise(F.lit(0.0)),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            .cast("bigint")
            .alias("bucket"),
        ),
    )
    v = spread(df).select(
        F.col(id_col).alias("id"),
        as_double.alias("vec"),
        F.sqrt(F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x * x)).alias(
            "norm"
        ),
    ).filter(F.col("norm") > 0).persist()
    # zero-norm vectors are EXCLUDED above: cosine is undefined for them,
    # and under ANSI mode (the driver's default) the cos_sim division
    # raises DIVIDE_BY_ZERO instead of producing the NaN the pre-ANSI
    # engine silently filtered (r16 adversarial embeddings sweep).
    # persist v TOO (r18): it feeds the bucket projection AND both verify
    # join sides — un-persisted, va/vb each re-ran the scan + norm fold.
    # persist: the T*P projection pass feeds both sides of the bucket join
    bucketed = (
        v.select("id", F.explode(tables).alias("tb"))
        .select("id", "tb.table", "tb.bucket")
        .persist()
    )
    bucketed.count()  # eager: both join sides consume the projection pass
    # (computing `bucketed` populates v's cache en route — one job fills both)
    cands = (
        bucketed.toDF("id_a", "table", "bucket")
        .join(bucketed.toDF("id_b", "table", "bucket"), ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = v.toDF("id_a", "vec_a", "norm_a")
    vb = v.toDF("id_b", "vec_b", "norm_b")
    dot = F.aggregate(
        F.zip_with(F.col("vec_a"), F.col("vec_b"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    out = (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos_sim", F.round(dot / (F.col("norm_a") * F.col("norm_b")), 4))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )
    return _with_caches(out, [bucketed, v])


def embedding_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding near-dup pairs: cosine >= threshold over all i<j pairs.
    Brute-force form (exact); for corpus scale route candidates through
    similarity.lsh_ann_topk buckets first.

    Note: an unrolled 64-term element_at chain was tried and measured 4x
    SLOWER than the array fold (a giant generated method falls off the JIT
    inlining cliff); the HOF fold is the right shape here."""
    as_double = F.col(vec_col).cast("array<double>")
    norm = F.sqrt(
        F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    # zero-norm vectors excluded: cosine undefined; under ANSI mode the
    # division raises DIVIDE_BY_ZERO (r16 adversarial embeddings sweep —
    # an all-zero embedding crashed the whole face). Mirrored in
    # SQL_EMBEDDING_DUPS_EXACT's nrm > 0 predicates.
    v = df.select(
        F.col(id_col).alias("id"),
        as_double.alias("vec"),
        norm.alias("norm"),
    ).filter(F.col("norm") > 0)
    a = v.toDF("id_a", "vec_a", "norm_a")
    b = v.toDF("id_b", "vec_b", "norm_b")
    dot = F.aggregate(
        F.zip_with(F.col("vec_a"), F.col("vec_b"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cos_sim", F.round(dot / (F.col("norm_a") * F.col("norm_b")), 4))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents that share any
    word n-gram with a benchmark/eval set (the standard leakage guard a
    training pipeline runs before packing — e.g. 8-13-gram overlap
    removal). Returns every corpus doc as (doc_id, n_hits, contaminated):
    n_hits = how many of the doc's DISTINCT n-grams appear anywhere in the
    benchmark, contaminated = n_hits > 0.

    Scale shape: the benchmark shingle set is small by construction (eval
    suites are MBs against a 100 TB corpus) and is broadcast — the corpus
    side is one narrow shingle projection probed against the broadcast
    set, no shuffle; only the HIT rows (tiny) shuffle into the per-doc
    count, and the final left join back to corpus ids is AQE-broadcastable
    for realistic contamination rates."""
    from ..functions.text import word_shingles

    btext = bench_text_col or text_col
    bench_sh = (
        benchmark.select(
            F.explode(F.array_distinct(word_shingles(F.col(btext), n))).alias("shingle")
        )
        .distinct()
    )
    # spread BEFORE the shingle explode: a single-row-group parquet scan
    # otherwise runs the whole tokenize+shingle pass as one task (the
    # repetition_profile lesson — measured ~10x serial there)
    doc_sh = spread(corpus).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), n))).alias("shingle"),
    )
    hits = (
        doc_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        corpus.select(F.col(id_col).alias("doc_id"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def boilerplate_ngrams(
    df: DataFrame,
    n: int = 5,
    min_docs: int = 2,
    top_k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document repeated-passage detection: the n-gram spans that
    occur in many DISTINCT documents — boilerplate headers/footers,
    license blocks, templated text, benchmark leakage. Doc-level dedup
    never sees these (the surrounding documents differ); span-level
    df-counting does, and the hot spans are exactly what a cleaning pass
    strips or a decontamination pass audits.

    Per-doc distinct shingles (array_distinct before the explode, so a
    doc repeating its own header counts once), ONE map-side-combined
    aggregation keyed by the shingle — the exchange is bounded by the
    distinct shingle vocabulary, never corpus token count — then a
    deterministic top-k (docs desc, shingle asc; TakeOrderedAndProject)."""
    sh = spread(df).select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(word_shingles(F.col(text_col), n=n))
        ).alias("shingle"),
    )
    out = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )
    return out.orderBy(
        F.col("n_docs").desc(), F.col("shingle").asc()
    ).limit(top_k)


def soft_dedup_weights(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    scale: int = 1_000_000,
    broadcast: bool | None = None,
) -> DataFrame:
    """Soft deduplication: instead of dropping near-duplicates, weight
    every document by the inverse size of its duplicate cluster
    (``weight_fp = floor(scale / cluster_size)``), so a k-way duplicated
    page contributes ~one document of training mass in total while rare
    text keeps full weight — the keep-and-downweight alternative to hard
    dedup. Documents in no pair keep weight ``scale`` exactly.

    Composes :func:`dedup_components` (O(log n) star contraction / driver
    union-find on the tiny pair graph) with one cluster-size aggregate
    and a LEFT join back to the corpus; the corpus is scanned once and
    never shuffled when the weight side broadcasts. floor(scale / k) is
    exact in any engine (the double ratio only hits an integer when k
    divides scale).

    ``broadcast``: True forces a broadcast hint on the weight side,
    False forbids it (sort-merge hint), None (default) leaves the
    strategy to Catalyst/AQE. The pre-r13 version hinted
    unconditionally — the same landmine the r12 decade probe caught in
    LookupAnnotator: the weight table is PAIR-GRAPH-sized, so on a
    heavy-dup corpus (e.g. 50% dups at 100 TB) it is corpus-scaled and a
    forced broadcast goes superlinear the moment it outgrows an executor
    broadcast. With AQE the hint buys nothing a runtime size check
    doesn't: sparse pair graphs still broadcast, heavy ones sort-merge
    instead of falling over (probe table: SCALE_NOTES r13 heavy-dup
    probe)."""

    def _hint(frame: DataFrame) -> DataFrame:
        if broadcast:
            return F.broadcast(frame)
        if broadcast is False:
            return frame.hint("merge")
        return frame

    comp = dedup_components(pairs)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("_csize"))
    weights = comp.join(_hint(sizes), "component").select(
        F.col("id").alias("_wid"),
        F.floor(F.lit(scale) / F.col("_csize")).cast("long").alias("weight_fp"),
    )
    out = (
        docs.select(F.col(id_col))
        .join(_hint(weights), docs[id_col] == weights["_wid"], "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("weight_fp"), F.lit(scale).cast("long")).alias(
                "weight_fp"
            ),
        )
    )
    return _with_caches(out, getattr(comp, "_spark_graft_caches", []))


def exact_substring_spans(
    df: DataFrame,
    gram_words: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    unit: int = 1_000_000,
) -> DataFrame:
    """Exact duplicated-SUBSTRING detection (the RefinedWeb / "exact
    substring deduplication" shape): find every position where a
    ``gram_words``-token span recurs in >= ``min_docs`` distinct
    documents, merge overlapping/adjacent duplicated spans per document
    into maximal islands, and report per-doc duplication coverage —
    (doc, n_islands, dup_tokens, n_tokens, dup_frac_fp). The curation
    action (cut the spans, drop the doc) is the caller's; this computes
    the exact span map.

    Engine shape: one posexploded gram table; duplicated grams found
    with a map-side-combined distinct-doc count (exchange bounded by the
    distinct-gram vocabulary — the boilerplate_ngrams argument); a
    LEFT SEMI join marks duplicated positions; islands via the classic
    gaps-and-islands window PARTITIONED BY DOC (no global sort). The
    gram STRING rides the shuffle for oracle-exactness; production swaps
    it for xxhash64(gram) — identical plan, 8-byte keys (the
    minhash_lsh_md5-vs-xxhash discipline). Integer coverage arithmetic
    throughout: island coverage = (max_pos - min_pos) + L, dup_frac on a
    1/unit fixed-point grid via truncating div — bit-identical in any
    engine."""
    from pyspark.sql import Window

    from ..core.session import spread
    from ..functions.text import ws_tokens

    L = gram_words
    toks = spread(df).select(
        F.col(id_col).alias("_id"),
        ws_tokens(F.lower(F.col(text_col))).alias("_toks"),
    )
    staged = toks.select(
        "_id",
        F.size("_toks").alias("n_tokens"),
        F.explode(
            F.when(
                F.size("_toks") >= L,
                F.transform(
                    F.sequence(F.lit(1), F.size("_toks") - L + 1),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.array_join(F.slice("_toks", i, L), " ").alias("gram"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<pos:int,gram:string>>"))
        ).alias("pg"),
    ).select("_id", "n_tokens", "pg.pos", "pg.gram")
    # persist: the posexploded gram table feeds BOTH the duplicated-gram
    # derivation and the position-marking semi-join — un-persisted, the
    # tokenize + per-position slice/join pass ran twice (r18). The cache is
    # gram-table-sized (heavy: ~L x corpus bytes) but replaces an equally
    # heavy recompute; storage-starved clusters can trade it back for the
    # second pass. Caller releases via release_plan_caches.
    #
    # Lazy fill is RACE-FREE here, unlike the eager-count sites (r18
    # batch 5): dup_grams is the semi-join's BROADCAST build side (the
    # executed plan is BroadcastHashJoin LeftSemi BuildRight — see
    # plans/r18/substring_dedup_after.txt), and Spark runs the broadcast-
    # exchange job to completion BEFORE the probe stage starts, so the
    # build pass fills the cache and the probe reads InMemoryTableScan.
    # The stages are serialized by the broadcast dependency; an eager
    # count() would add one more job for the same single compute pass.
    # Caveat: if the dup-gram vocabulary ever outgrows the broadcast
    # threshold and the planner falls back to a shuffled join, the two
    # sides become independent stages of one job and the race returns —
    # flip to persist()+count() then (the grouped_quantiles discipline).
    staged = staged.persist()
    dup_grams = (
        staged.groupBy("gram")
        .agg(F.countDistinct("_id").alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("gram")
    )
    dup_pos = staged.join(dup_grams, "gram", "left_semi")
    w = Window.partitionBy("_id").orderBy("pos")
    islands = (
        dup_pos.withColumn("_prev", F.lag("pos").over(w))
        .withColumn(
            "_new",
            F.when(
                F.col("_prev").isNull() | (F.col("pos") - F.col("_prev") > L),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "island",
            F.sum("_new").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("_id", "n_tokens", "island")
        .agg((F.max("pos") - F.min("pos") + L).alias("_covered"))
    )
    return _with_caches(
        islands.groupBy("_id", "n_tokens")
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.sum("_covered").cast("long").alias("dup_tokens"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_islands",
            "dup_tokens",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.expr(f"(dup_tokens * {unit}) div n_tokens").alias("dup_frac_fp"),
        ),
        [staged],
    )
