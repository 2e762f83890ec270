#!/usr/bin/env python3
"""Bisect the minhash_lsh_md5 r3 regression: time the registered query vs
variants that drop/reorder the spread() stage. Run on a quiet machine."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from childhoodcancerdatainitiative_cbioportal_workflows_spark.core.session import get_spark
from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.dedup import (
    _with_caches,
    minhash_dedup_pairs_md5,
    release_plan_caches,
)
from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions.text import (
    has_min_tokens,
    word_shingles,
)

SF_DIR = "/root/testdata/sf0.1"


def md5_pairs_variant(df, mode: str, threshold=0.5, num_hashes=32, bands=8,
                      shingle_words=3, text_col="text", id_col="doc_id"):
    """mode: 'r2' = no spread, filter on shingle size; 'nospread' = no spread,
    token-count filter."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import dedup as D

    rows_per_band = num_hashes // bands
    if mode == "r2":
        staged = df.select(
            F.col(id_col).alias("id"),
            word_shingles(F.col(text_col), n=shingle_words).alias("_sh"),
        ).filter(F.size("_sh") > 0)
    else:
        staged = df.filter(has_min_tokens(F.col(text_col), shingle_words)).select(
            F.col(id_col).alias("id"),
            word_shingles(F.col(text_col), n=shingle_words).alias("_sh"),
        )

    def _seed_min(j: int):
        return F.array_min(
            F.transform(F.col("_sh"), lambda s: F.md5(F.concat(F.lit(f"{j}|"), s)))
        )

    sig = F.array(*[_seed_min(j) for j in range(num_hashes)])
    sigs = staged.select("id", sig.alias("signature")).persist()
    sigs.count()
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


def timeit(label, fn, spark, reps=3):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(F.col("doc_id") < 200)
    for i in range(reps):
        t0 = time.time()
        df = fn(docs)
        df.write.format("noop").mode("overwrite").save()
        release_plan_caches(df)
        print(f"  {label} run{i}: {time.time()-t0:.3f}s")


def main():
    spark = get_spark("bisect-md5")
    # warm
    spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(5).collect()
    timeit("current(r3)", lambda d: minhash_dedup_pairs_md5(d, threshold=0.5, num_hashes=32, bands=8), spark)
    timeit("r2-shape   ", lambda d: md5_pairs_variant(d, "r2"), spark)
    timeit("nospread   ", lambda d: md5_pairs_variant(d, "nospread"), spark)
    # interleave to cancel warmup bias
    timeit("current(r3)", lambda d: minhash_dedup_pairs_md5(d, threshold=0.5, num_hashes=32, bands=8), spark)
    timeit("r2-shape   ", lambda d: md5_pairs_variant(d, "r2"), spark)


def main_single(variant):
    spark = get_spark("bisect-md5-single")
    spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(5).collect()
    if variant == "r3":
        timeit("cold r3", lambda d: minhash_dedup_pairs_md5(d, threshold=0.5, num_hashes=32, bands=8), spark, reps=2)
    else:
        timeit(f"cold {variant}", lambda d: md5_pairs_variant(d, variant), spark, reps=2)


if __name__ == "__main__" and len(sys.argv) > 1:
    main_single(sys.argv[1])
elif __name__ == "__main__":
    main()
