"""Probe: does staging the token array cut the text-face projections?

Measures three shapes over sf0.1 documents with the noop sink:
  A) the current face shape — quality_score(text) + lang_id(text) +
     fingerprint(text) in one projection (each helper re-derives
     ws_tokens(text) internally);
  B) a hand-staged twin — tokens computed ONCE into a column, the same
     arithmetic expressed over the staged column;
  C) tokens-only baseline (lower bound: one tokenize pass).

If A ≈ B, Spark's subexpression elimination already collapses the
repeated ws_tokens subtrees and no refactor is warranted; if A >> B the
text faces should stage tokens explicitly. Run on a quiet box:
  python scripts/probe_token_staging.py [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from childhoodcancerdatainitiative_cbioportal_workflows_spark.core.session import (
    get_spark,
    load_table,
    spread,
)
from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions.text import (
    STOPWORDS,
    PUNCT_CLASS,
    fingerprint,
    lang_id,
    quality_score,
)


def _match_count_t(toks, words):
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, F.lower(t))))


def staged_exprs(text, toks):
    """quality_score + lang_id re-expressed over a staged toks column —
    bit-identical arithmetic, tokens evaluated once per row."""
    n = F.size(toks).cast("double")
    distinct_ratio = F.when(n > 0, F.size(F.array_distinct(toks)) / n).otherwise(
        F.lit(0.0)
    )
    sw_n = F.size(toks)
    sw = F.when(
        sw_n > 0, _match_count_t(toks, STOPWORDS["en"]) / sw_n
    ).otherwise(F.lit(0.0))
    punct = F.length(F.regexp_replace(text, f"[^{PUNCT_CLASS}]", "")).cast("double")
    punct_ratio = F.when(F.length(text) > 0, punct / F.length(text)).otherwise(
        F.lit(1.0)
    )
    len_score = F.least(n / F.lit(100.0), F.lit(1.0))
    raw = F.greatest(
        F.least(
            F.lit(0.25) * len_score
            + F.lit(0.25) * distinct_ratio
            + F.lit(0.35) * F.least(sw * 5, F.lit(1.0))
            + F.lit(0.15) * (1 - F.least(punct_ratio * 4, F.lit(1.0))),
            F.lit(1.0),
        ),
        F.lit(0.0),
    )
    quality = F.floor(raw * 10000) / 10000
    counts = {lg: _match_count_t(toks, ws) for lg, ws in STOPWORDS.items()}
    best = F.greatest(*counts.values())
    lang = F.lit("und")
    for lg in reversed(list(STOPWORDS)):
        lang = F.when((counts[lg] == best) & (best > 0), F.lit(lg)).otherwise(lang)
    return quality, lang


def bench(df, label, reps):
    times = []
    for _ in range(reps):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        times.append(time.time() - t0)
    print(f"{label}: min {min(times):.3f}s  all {[round(t, 3) for t in times]}")


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("probe-token-staging")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    d = spread(load_table(spark, sf_dir, "documents"))

    a = d.select(
        "doc_id",
        quality_score(F.col("text")).alias("quality"),
        lang_id(F.col("text")).alias("lang"),
        fingerprint(F.col("text")).alias("fp"),
    )
    staged = d.select(
        "doc_id",
        "text",
        F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "").alias("_toks"),
    )
    q, lg = staged_exprs(F.col("text"), F.col("_toks"))
    b = staged.select(
        "doc_id",
        q.alias("quality"),
        lg.alias("lang"),
        fingerprint(F.col("text")).alias("fp"),
    )
    c = staged.select("doc_id", F.size("_toks").alias("n"))

    for _ in range(1):  # warm the JIT on shape A once
        a.write.format("noop").mode("overwrite").save()
    bench(a, "A current (helpers re-derive tokens)", reps)
    bench(b, "B staged tokens", reps)
    bench(c, "C tokens only", reps)


if __name__ == "__main__":
    main()
