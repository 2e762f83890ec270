#!/usr/bin/env python3
"""Offline IVF index-build: train the coarse quantizer once and check the
centroid literals in, so query plans and generated oracle SQL stay
deterministic (no train-at-query-time nondeterminism).

Trains seeded k-means on the SF-stable embedding pool (vec_id < 500 exists
from sf0.001 up, identical vectors at every SF) and writes
``childhoodcancerdatainitiative_cbioportal_workflows_spark/llm/ivf_centroids.py``.
Re-run only when the testdata embeddings change."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from childhoodcancerdatainitiative_cbioportal_workflows_spark.core.session import (
    get_spark,
    load_table,
)
from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.similarity import (
    train_ivf_centroids,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
POOL_BOUND = 500
K = 16
SEED = 29
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "childhoodcancerdatainitiative_cbioportal_workflows_spark",
    "llm",
    "ivf_centroids.py",
)


def main() -> None:
    spark = get_spark("ivf-train")
    pool = load_table(spark, SF_DIR, "embeddings").filter(F.col("vec_id") < POOL_BOUND)
    cents = train_ivf_centroids(pool, k=K, seed=SEED)
    with open(OUT, "w") as f:
        f.write(
            '"""Trained IVF coarse-quantizer centroids (generated artifact).\n\n'
            f"k-means||, k={K}, seed={SEED}, maxIter=20, trained on the\n"
            f"SF-stable pool vec_id < {POOL_BOUND} of {SF_DIR}/embeddings.parquet,\n"
            "coordinates rounded to 6 decimals, centroids sorted\n"
            "lexicographically (cluster numbering is not deterministic;\n"
            "the sorted vector set is). Regenerate with\n"
            'scripts/train_ivf_centroids.py."""\n\n'
            "TRAINED_CENTROIDS: list[list[float]] = [\n"
        )
        for c in cents:
            f.write("    [" + ", ".join(repr(x) for x in c) + "],\n")
        f.write("]\n")
    print(f"wrote {len(cents)} centroids (dim {len(cents[0])}) to {OUT}")


if __name__ == "__main__":
    main()
