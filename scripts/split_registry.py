"""One-shot refactor: split __spark_entry__.py into the
childhoodcancerdatainitiative_cbioportal_workflows_spark.registry package
(per-family query modules + shared _common helpers), leaving
__spark_entry__.py as the thin stable driver face (entry/queries/
oracle_sql). Verified by scripts/check_registry_split.py: identical
queries()/oracle_sql() output before and after.
"""

import ast
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENTRY = os.path.join(REPO, "__spark_entry__.py")
PKG = os.path.join(
    REPO, "childhoodcancerdatainitiative_cbioportal_workflows_spark", "registry"
)

FAMILIES = {
    "tpch": [
        "tpch_q1_agg", "topk_revenue", "cube_agg", "rollup_agg",
        "grouping_sets", "unpivot_metrics", "except_intersect",
        "distinct_agg", "json_extract", "array_agg_lines", "salted_agg",
        "tpch_q5_shape", "tpch_q4_exists", "tpch_q17_avg_subquery",
        "tpch_q13_custdist",
    ],
    "relational": [
        "value_counts", "distinct_rows", "dup_detection",
        "join_dims_broadcast", "left_join_counts", "semi_join", "anti_join",
        "reconcile_counts", "top1_per_group", "dedup_preference",
        "pair_rows", "pivot_matrix", "union_concat", "topk_per_group",
        "running_window",
    ],
    "genomics": ["interval_join", "cnv_matrix", "scalar_gistic", "regex_extract"],
    "textops": [
        "token_counts", "text_profile", "explode_tokens", "pii_redact",
        "gopher_quality", "repetition_profile", "doc_quality",
        "rolling_fingerprint", "token_frequency", "bigram_top",
        "cooccurrence_top", "quality_lm", "winsorize_lengths",
        "histogram_profile", "percentile_profile", "contingency_profile",
        "correlation_profile",
    ],
    "dedup": [
        "dedup_exact", "normalize_dedup", "incremental_dedup",
        "decontaminate", "minhash_lsh", "minhash_lsh_md5", "simhash_pairs",
        "ngram_jaccard", "ngram_jaccard_stoplist", "ngram_jaccard_prefix",
        "containment_dedup", "dedup_components", "dedup_canonical",
        "embedding_dups", "embedding_dups_exact", "semantic_dedup",
    ],
    "embeddings": [
        "cosine_topk", "ann_lsh", "ann_ivf", "ann_ivf_trained",
        "kmeans_clusters", "random_projection", "quantize_embeddings",
    ],
    "corpus": [
        "dataset_split", "hash_sample", "domain_mix", "group_sample",
        "weighted_sample_k", "quality_weighted_sample", "chunk_documents",
        "encode_tokens", "vocab_build", "sequence_pack",
        "llm_corpus_pipeline", "curation_pipeline", "corpus_report",
        "tfidf_features", "bm25_search",
    ],
    "timeseries": [
        "events_hourly", "session_windows", "sliding_windows",
        "asof_enrich", "funnel_conversion", "resample_locf",
        "retention_cohorts", "trending_hourly", "twap_daily",
        "scd2_intervals", "decile_stats", "balance_resets",
        "score_calibration",
    ],
    "graph": ["triangle_count", "pagerank", "fuzzy_join"],
}


def main():
    src = open(ENTRY).read()
    tree = ast.parse(src)
    lines = src.split("\n")

    def seg(node):
        # include decorator lines / full span
        return "\n".join(lines[node.lineno - 1 : node.end_lineno])

    # --- parse the registry dict first: map registry key -> (fn, sql) names
    reg_node = next(
        n
        for n in tree.body
        if isinstance(n, ast.AnnAssign)
        and isinstance(n.target, ast.Name)
        and n.target.id == "_REGISTRY"
    )
    reg_entries = []  # (key, fn_name, sql_name|None)
    for k, v in zip(reg_node.value.keys, reg_node.value.values):
        key = k.value
        fn = v.elts[0].id
        sql = v.elts[1].id if isinstance(v.elts[1], ast.Name) else None
        reg_entries.append((key, fn, sql))

    # name -> family
    name2fam = {}
    for fam, keys in FAMILIES.items():
        for key in keys:
            name2fam[key] = fam
    missing = [k for k, _, _ in reg_entries if k not in name2fam]
    assert not missing, f"unmapped registry keys: {missing}"
    blockfam = {}  # top-level def/const name -> family
    for key, fn, sql in reg_entries:
        fam = name2fam[key]
        for n in (fn, sql):
            if n is None:
                continue
            prev = blockfam.get(n)
            assert prev in (None, fam), f"{n} claimed by {prev} and {fam}"
            blockfam[n] = fam

    # --- classify every top-level node in order
    common, fam_blocks, tail = [], {f: [] for f in FAMILIES}, []
    header_done = False
    for i, node in enumerate(tree.body):
        name = getattr(node, "name", None)
        if isinstance(node, ast.Assign) and isinstance(node.targets[0], ast.Name):
            name = node.targets[0].id
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            name = node.target.id
        if i == 0 and isinstance(node, ast.Expr):
            continue  # module docstring: rewritten per-file
        if name == "_REPO_DIR" or isinstance(node, ast.If):
            continue  # sys.path bootstrap stays only in __spark_entry__
        if name in ("entry", "queries", "oracle_sql", "_REGISTRY"):
            tail.append((name, node))
            continue
        if name in blockfam:
            fam_blocks[blockfam[name]].append(seg(node))
        else:
            common.append(seg(node))

    os.makedirs(PKG, exist_ok=True)

    # --- _common.py: header imports + every shared helper, original order
    common_src = (
        '"""Shared helpers for the query registry: the oracle-exactness\n'
        "utilities (_dsum decimal summation, the md5-nibble fold fragments)\n"
        "and the SQL-generator functions family modules call at import time.\n"
        "Split out of __spark_entry__.py (round 6); see that module's\n"
        'docstring for the registry contract."""\n\n'
        + "\n\n".join(common)
        + "\n"
    )
    # names _common must export (underscore names are skipped by import *)
    common_names = []
    for node in ast.parse(common_src).body:
        if isinstance(node, (ast.FunctionDef, ast.ClassDef)):
            common_names.append(node.name)
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name):
                    common_names.append(t.id)
        elif isinstance(node, (ast.Import, ast.ImportFrom)):
            for a in node.names:
                common_names.append((a.asname or a.name).split(".")[0])
    common_names = sorted(set(common_names) - {"annotations"})
    common_src += (
        "\n__all__ = [  # explicit: underscore helpers must survive import *\n"
        + "".join(f"    {n!r},\n" for n in common_names)
        + "]\n"
    )
    open(os.path.join(PKG, "_common.py"), "w").write(common_src)

    # --- per-family modules
    fam_doc = {
        "tpch": "TPC-H-shaped SQL-face queries: aggregates, subquery decorrelation, cubes/rollups/grouping sets, set ops.",
        "relational": "Core relational operators: counts, distinct, joins (broadcast/semi/anti/full), dedup, pivot, windows.",
        "genomics": "Genomic-shaped operators: binned interval join, CNV matrix, GISTIC scalar pipeline, regex extraction.",
        "textops": "Text analysis: token/quality/repetition profiling, fingerprints, n-gram stats, distribution profiles.",
        "dedup": "Deduplication families: exact/normalized, MinHash-LSH, SimHash, n-gram Jaccard, components, embedding near-dup.",
        "embeddings": "Embedding-space operators: cosine top-k, ANN (LSH/IVF), k-means, random projection, quantization.",
        "corpus": "LLM corpus pipeline: sampling/splits, chunk/encode/pack, vocab, BM25/TF-IDF, end-to-end curation.",
        "timeseries": "Event-time operators: windows, as-of, funnel, LOCF resample, retention, TWAP, SCD2, run-length resets.",
        "graph": "Graph + fuzzy-string operators: triangle counting, fixed-point PageRank, q-gram Levenshtein join.",
    }
    underscore = [n for n in common_names if n.startswith("_")]
    for fam, blocks in fam_blocks.items():
        mod = (
            f'"""{fam_doc[fam]}\n\nEach q_* returns a DataFrame; each SQL_* is its DuckDB oracle\n'
            '(value-exact at any SF). Split out of __spark_entry__.py (round 6)."""\n\n'
            "from ._common import *  # noqa: F401,F403\n"
            "from ._common import (  # noqa: F401\n"
            + "".join(f"    {n},\n" for n in underscore)
            + ")\n\n\n"
            + "\n\n\n".join(blocks)
            + "\n"
        )
        open(os.path.join(PKG, f"{fam}.py"), "w").write(mod)

    # --- __init__.py: re-export everything + the registry dict itself
    reg_src = seg(reg_node)
    init = (
        '"""Query registry package: 105 oracle-checked queries grouped by\n'
        "family. ``__spark_entry__`` (the stable driver face) re-exports\n"
        'everything here and serves ``queries()``/``oracle_sql()`` from\n'
        '``_REGISTRY``."""\n\n'
        "from __future__ import annotations\n\n"
        "from collections.abc import Callable\n\n"
        "from pyspark.sql import DataFrame, SparkSession\n\n"
        "from ._common import *  # noqa: F401,F403\n"
        "from ._common import (  # noqa: F401\n"
        + "".join(f"    {n},\n" for n in underscore)
        + ")\n"
        + "".join(f"from .{fam} import *  # noqa: F401,F403\n" for fam in FAMILIES)
        + "\n\n"
        + reg_src
        + "\n\n"
        + "__all__ = [  # q_/SQL_/helper names, so `import *` re-exports the full surface\n"
        + "    '_REGISTRY',\n"
        + "".join(f"    {n!r},\n" for n in common_names)
        + "".join(
            f"    {n!r},\n"
            for n in sorted(blockfam)
        )
        + "]\n"
    )
    open(os.path.join(PKG, "__init__.py"), "w").write(init)

    # --- new thin __spark_entry__.py
    m = re.search(r'^"""(.*?)"""', src, re.S)
    entry_doc = m.group(0)
    entry_src = f'''{entry_doc}

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# the driver may load this module by file path; make the sibling package
# importable regardless of cwd/sys.path
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

# the full query surface lives in the registry package (per-family modules);
# `import *` honors its __all__, so every q_*/SQL_*/helper name stays
# importable from this module for tests and external callers
from childhoodcancerdatainitiative_cbioportal_workflows_spark.registry import *  # noqa: E402,F401,F403
from childhoodcancerdatainitiative_cbioportal_workflows_spark.registry import (  # noqa: E402
    _REGISTRY,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_tpch_q1(spark, SF0001)  # noqa: F405


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {{name: fn for name, (fn, _) in _REGISTRY.items()}}


def oracle_sql() -> dict[str, str]:
    return {{name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}}
'''
    open(ENTRY, "w").write(entry_src)
    print("wrote", PKG, "and rewrote", ENTRY)


if __name__ == "__main__":
    main()
