"""Shared helpers for the query registry: the oracle-exactness
utilities (_dsum decimal summation, the md5-nibble fold fragments)
and the SQL-generator functions family modules call at import time.
Split out of __spark_entry__.py (round 6); see that module's
docstring for the registry contract."""

from __future__ import annotations

import os

import sys

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from childhoodcancerdatainitiative_cbioportal_workflows_spark.core.session import (
    load_table,
    spread,
)

from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
    interval_join,
    keep_first,
    dedup_with_preference,
    pair_rows,
    to_wide_matrix,
    reconcile_counts,
)

from childhoodcancerdatainitiative_cbioportal_workflows_spark.functions import (
    gistic_call,
    copy_number_to_log2,
    fingerprint,
    ws_tokens,
    stopword_ratio,
    lang_id,
)

SF0001 = "/root/testdata/sf0.001"

def _dsum(c, alias):
    """Order-independent double sum: sum through DECIMAL(18,4), emit DOUBLE."""
    return F.sum(c.cast("decimal(18,4)")).cast("double").alias(alias)

_NIBFOLD_SPLIT = (
    "list_reduce(list_transform(range(1,9), i -> "
    "(CASE WHEN ascii(h[i]) >= 97 THEN ascii(h[i])-87 ELSE ascii(h[i])-48 END)::BIGINT), "
    "(a,b) -> a*16+b)"
)

_DUCK_NIBFOLD = (
    "list_reduce(list_transform(range({a},{b}), i -> "
    "(CASE WHEN ascii(h[i]) >= 97 THEN ascii(h[i])-87 ELSE ascii(h[i])-48 END)::BIGINT), "
    "(a,b) -> a*16+b)"
)

def _duck_shingle_cte(n: int, doc_bound: int) -> str:
    """tokens -> n-word shingle lists (not distinct), mirroring
    functions.text.word_shingles."""
    return f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents WHERE doc_id < {doc_bound}
), sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= {n}
           THEN list_transform(range(1, len(toks) - {n - 2}),
                               i -> array_to_string(toks[i:i+{n - 1}], ' '))
           ELSE [] END AS shingles
  FROM t
), hx AS (
  SELECT doc_id, list_transform(shingles, s -> md5(s)) AS hs
  FROM sh WHERE len(shingles) > 0
)"""

def _sql_minhash_universal(
    doc_bound: int, num_hashes: int, bands: int, threshold: float, seed: int
) -> str:
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (
        minhash_universal_coeffs,
    )
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.dedup import (
        MERSENNE31,
    )

    a_co, b_co = minhash_universal_coeffs(num_hashes, seed)
    rpb = num_hashes // bands
    a_sql = "[" + ",".join(str(x) for x in a_co) + "]::BIGINT[]"
    b_sql = "[" + ",".join(str(x) for x in b_co) + "]::BIGINT[]"
    est = (
        "len(list_filter(list_zip(a.sig, b.sig), p -> p[1] = p[2]))"
        " / CAST(len(a.sig) AS DOUBLE)"
    )
    return f"""{_duck_shingle_cte(3, doc_bound)}, bp AS (
  SELECT doc_id,
         list_transform(hs, h -> {_DUCK_NIBFOLD.format(a=1, b=9)} % {MERSENNE31}) AS bps
  FROM hx
), co AS (
  SELECT {a_sql} AS ca, {b_sql} AS cb
), sigs AS (
  SELECT doc_id,
         list_transform(range(0, {num_hashes}),
           j -> list_aggregate(
                  list_transform(bps, x -> (ca[j+1] * x + cb[j+1]) % {MERSENNE31}),
                  'min')) AS sig
  FROM bp, co
), banded AS (
  SELECT doc_id, sig, b AS band,
         array_to_string(sig[b*{rpb}+1 : b*{rpb}+{rpb}], ',') AS bucket
  FROM sigs, unnest(range(0, {bands})) AS u(b)
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       ROUND({est}, 4) AS est_jaccard
FROM banded a JOIN banded b USING (band, bucket)
WHERE a.doc_id < b.doc_id AND ROUND({est}, 4) >= {threshold}
"""

def _sql_simhash_md5(doc_bound: int, max_hamming: int, blocks: int, combo_m: int) -> str:
    """Mirrors llm.dedup.simhash_dedup_pairs_md5's multi-index pigeonhole
    construction: packed per-block chunks, one join key per combination of
    combo_m chunks, bit_count(xor) Hamming verify on the packed 32-bit
    halves — integer-only, bit-exact across engines."""
    import itertools

    width = 64 // blocks
    combos = list(itertools.combinations(range(blocks), combo_m))

    def _key_expr(c: tuple[int, ...]) -> str:
        e = f"chunks[{c[0] + 1}]"
        for b in c[1:]:
            e = f"({e}) * {1 << width} + chunks[{b + 1}]"
        return e

    arms = "\n  UNION ALL ".join(
        f"SELECT doc_id, fp_lo, fp_hi, {ci} AS combo, {_key_expr(c)} AS bkey FROM pz"
        for ci, c in enumerate(combos)
    )
    ham = "bit_count(xor(a.fp_lo, b.fp_lo)) + bit_count(xor(a.fp_hi, b.fp_hi))"
    return f"""{_duck_shingle_cte(2, doc_bound)}, pk AS (
  SELECT doc_id,
         list_transform(hs, h -> {_DUCK_NIBFOLD.format(a=1, b=9)}) AS los,
         list_transform(hs, h -> {_DUCK_NIBFOLD.format(a=9, b=17)}) AS his
  FROM hx
), bits AS (
  SELECT doc_id,
         list_transform(range(0, 64), i -> CASE WHEN
           (CASE WHEN i < 32
                 THEN list_sum(list_transform(los, v -> ((v >> i) & 1) * 2 - 1))
                 ELSE list_sum(list_transform(his, v -> ((v >> (i - 32)) & 1) * 2 - 1))
            END) > 0 THEN 1 ELSE 0 END) AS bits
  FROM pk
), pz AS (
  SELECT doc_id,
         list_reduce(bits[1:32]::BIGINT[], (a,b) -> a*2+b) AS fp_lo,
         list_reduce(bits[33:64]::BIGINT[], (a,b) -> a*2+b) AS fp_hi,
         list_transform(range(0, {blocks}),
           b -> list_reduce(bits[b*{width}+1 : b*{width}+{width}]::BIGINT[],
                            (a,c) -> a*2+c)) AS chunks
  FROM bits
), keyed AS (
  {arms}
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST({ham} AS INTEGER) AS hamming
FROM keyed a JOIN keyed b USING (combo, bkey)
WHERE a.doc_id < b.doc_id AND {ham} <= {max_hamming}
"""

def _duck_plane_lit(plane: list[float]) -> str:
    return "[" + ",".join(repr(x) for x in plane) + "]::DOUBLE[]"

def _duck_bucket_expr(planes: list[list[float]]) -> str:
    """Integer bucket = sum of 2^j over planes with non-negative projection;
    matches the Spark double-weight sum exactly (distinct powers of two)."""
    terms = [
        "(CASE WHEN list_reduce(list_transform(list_zip("
        + _duck_plane_lit(p)
        + ", vec), x -> x[1]*x[2]), (a,b) -> a+b) >= 0 THEN "
        + str(1 << j)
        + " ELSE 0 END)"
        for j, p in enumerate(planes)
    ]
    return "(" + " + ".join(terms) + ")"

def _sql_ann_lsh(
    dim: int, k: int, num_planes: int, num_tables: int, seed: int, q_bound: int
) -> str:
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.similarity import (
        _hyperplanes,
    )

    arms = "\n  UNION ALL ".join(
        f"SELECT id, vec, {t} AS t, {_duck_bucket_expr(_hyperplanes(dim, num_planes, seed + t))} AS bucket FROM v"
        for t in range(num_tables)
    )
    return f"""
WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS vec FROM embeddings
           -- zero-norm excluded on both engines (r17 ANN sweep)
           WHERE list_reduce(list_transform(embedding::DOUBLE[], x -> x*x),
                             (a,b) -> a+b) > 0),
cb AS (
  {arms}
),
qb AS (SELECT id, t, bucket FROM cb WHERE id < {q_bound}),
pairs AS (
  SELECT DISTINCT qb.id AS q_id, cb.id AS c_id
  FROM cb JOIN qb ON cb.t = qb.t AND cb.bucket = qb.bucket
  WHERE qb.id <> cb.id
),
nv AS (SELECT id, vec,
       sqrt(list_reduce(list_transform(vec, x -> x*x), (a,b) -> a+b)) AS nrm FROM v),
sc AS (
  SELECT q_id, c_id,
         list_reduce(list_transform(list_zip(qv.vec, cv.vec), x -> x[1]*x[2]),
                     (a,b) -> a+b) / (qv.nrm * cv.nrm) AS cos
  FROM pairs JOIN nv cv ON cv.id = pairs.c_id JOIN nv qv ON qv.id = pairs.q_id
)
SELECT q_id, c_id, ROUND(cos, 4) AS cos_sim, CAST(rank AS INTEGER) AS rank FROM (
  SELECT q_id, c_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rank
  FROM sc
) WHERE rank <= {k}
"""

def _sql_embedding_dups_lsh(
    dim: int, threshold: float, num_planes: int, num_tables: int, seed: int
) -> str:
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.similarity import (
        _hyperplanes,
    )

    arms = "\n  UNION ALL ".join(
        f"SELECT id, vec, {t} AS t, {_duck_bucket_expr(_hyperplanes(dim, num_planes, seed + t))} AS bucket FROM v"
        for t in range(num_tables)
    )
    cos = (
        "list_reduce(list_transform(list_zip(av.vec, bv.vec), x -> x[1]*x[2]),"
        " (a,b) -> a+b) / (av.nrm * bv.nrm)"
    )
    return f"""
WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS vec FROM embeddings),
cb AS (
  {arms}
),
pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM cb a JOIN cb b ON a.t = b.t AND a.bucket = b.bucket
  WHERE a.id < b.id
),
nv AS (SELECT id, vec,
       sqrt(list_reduce(list_transform(vec, x -> x*x), (a,b) -> a+b)) AS nrm FROM v)
SELECT id_a, id_b, ROUND({cos}, 4) AS cos_sim
FROM pairs JOIN nv av ON av.id = pairs.id_a JOIN nv bv ON bv.id = pairs.id_b
-- zero-norm vectors excluded on both engines (cosine undefined; the
-- Spark operator filters norm > 0 — r16 adversarial embeddings sweep)
WHERE av.nrm > 0 AND bv.nrm > 0 AND ROUND({cos}, 4) >= {threshold}
"""

def _ivf_centroid_ids(n_pool: int = 500, k: int = 16, seed: int = 7) -> list[int]:
    """Deterministic coarse-quantizer sample, valid at every SF (ids 0..499
    exist from sf0.001 up); shared by the Spark plan and the oracle SQL."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return sorted(int(x) for x in rng.choice(n_pool, size=k, replace=False))

def _sql_ivf_body(nc_cte: str, k: int, nprobe: int, q_bound: int) -> str:
    """Shared IVF oracle: assignment/probe/pair/score/rank over whatever
    ``nc_cte`` supplies as the (cid, cvec, cnrm) quantizer table — the
    sampled and trained variants differ ONLY in that CTE (mirroring
    _ivf_topk_core on the Spark side)."""
    acos = (
        "list_reduce(list_transform(list_zip(nv.vec, nc.cvec), x -> x[1]*x[2]),"
        " (a,b) -> a+b) / (nv.nrm * nc.cnrm)"
    )
    return f"""
WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS vec FROM embeddings),
nv AS (SELECT * FROM (SELECT id, vec,
       sqrt(list_reduce(list_transform(vec, x -> x*x), (a,b) -> a+b)) AS nrm FROM v)
       WHERE nrm > 0),  -- zero-norm excluded on both engines (r17 sweep)
nc AS (SELECT * FROM ({nc_cte}) WHERE cnrm > 0),
assign AS (
  SELECT nv.id, nc.cid,
         row_number() OVER (PARTITION BY nv.id ORDER BY {acos} DESC, nc.cid) AS rn
  FROM nv CROSS JOIN nc
),
cand_lists AS (SELECT id, cid AS list_id FROM assign WHERE rn = 1),
qprobe AS (SELECT id AS q_id, cid AS list_id FROM assign
           WHERE id < {q_bound} AND rn <= {nprobe}),
pairs AS (
  SELECT DISTINCT q_id, cl.id AS c_id
  FROM qprobe JOIN cand_lists cl USING (list_id)
  WHERE cl.id <> q_id
),
sc AS (
  SELECT q_id, c_id,
         list_reduce(list_transform(list_zip(qv.vec, cv.vec), x -> x[1]*x[2]),
                     (a,b) -> a+b) / (qv.nrm * cv.nrm) AS cos
  FROM pairs JOIN nv cv ON cv.id = pairs.c_id JOIN nv qv ON qv.id = pairs.q_id
)
SELECT q_id, c_id, ROUND(cos, 4) AS cos_sim, CAST(rank AS INTEGER) AS rank FROM (
  SELECT q_id, c_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rank
  FROM sc
) WHERE rank <= {k}
"""

def _sql_ann_ivf(k: int, nprobe: int, q_bound: int) -> str:
    ids = ",".join(str(i) for i in _ivf_centroid_ids())
    nc = (
        "SELECT id AS cid, vec AS cvec,\n"
        "       sqrt(list_reduce(list_transform(vec, x -> x*x), (a,b) -> a+b)) AS cnrm\n"
        f"       FROM v WHERE id IN ({ids})"
    )
    return _sql_ivf_body(nc, k, nprobe, q_bound)

def _sql_ann_ivf_trained(k: int, nprobe: int, q_bound: int) -> str:
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.ivf_centroids import (
        TRAINED_CENTROIDS,
    )

    cent_rows = ",\n  ".join(
        f"({i}, [{', '.join(repr(x) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(TRAINED_CENTROIDS)
    )
    nc = (
        "SELECT cid, cvec,\n"
        "       sqrt(list_reduce(list_transform(cvec, x -> x*x), (a,b) -> a+b)) AS cnrm\n"
        "       FROM (VALUES\n"
        f"  {cent_rows}) AS c(cid, cvec)"
    )
    return _sql_ivf_body(nc, k, nprobe, q_bound)

_BM25_TERMS = ("join", "window", "stream", "vector")

_BM25_K1P1 = repr(1.2 + 1.0)  # exact double literal shared with the oracle

def _sql_bm25(terms: tuple[str, ...], k: int) -> str:
    tf_cols = ",\n         ".join(
        f"CAST(len(list_filter(tk, x -> x = '{t}')) AS BIGINT) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n         ".join(
        f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
        for i in range(len(terms))
    )
    norm_len = (
        "(1.0 - 0.75 + 0.75 * (CAST(dl AS DOUBLE) / "
        "(CAST(total_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))"
    )
    contribs = " + ".join(
        f"(CAST(CAST(floor(ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df{i} AS DOUBLE)"
        f" + 0.5) / (CAST(df{i} AS DOUBLE) + 0.5)) * 1000000) AS BIGINT) AS DOUBLE)"
        f" / 1000000.0) * (CAST(tf{i} AS DOUBLE) * {_BM25_K1P1}"
        f" / (CAST(tf{i} AS DOUBLE) + 1.2 * {norm_len}))"
        for i in range(len(terms))
    )
    matched = " + ".join(
        f"(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)" for i in range(len(terms))
    )
    return f"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS tk
  FROM documents
), base AS (
  SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl,
         {tf_cols}
  FROM d
), stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_dl,
         {df_cols}
  FROM base
), scored AS (
  SELECT doc_id,
         {contribs} AS score_raw,
         CAST({matched} AS INTEGER) AS matched_terms
  FROM base, stats
)
SELECT doc_id, floor(score_raw * 10000) / 10000 AS score, matched_terms
FROM scored WHERE matched_terms > 0
ORDER BY score DESC, doc_id
LIMIT {k}
"""

def _sql_kmeans_clusters() -> str:
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.ivf_centroids import (
        TRAINED_CENTROIDS,
    )

    cent_rows = ",\n  ".join(
        f"({i}, [{', '.join(repr(x) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(TRAINED_CENTROIDS)
    )
    acos = (
        "list_reduce(list_transform(list_zip(nv.vec, nc.cvec), x -> x[1]*x[2]),"
        " (a,b) -> a+b) / (nc.cnrm * nv.nrm)"
    )
    return f"""
WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS vec FROM embeddings),
nv AS (SELECT * FROM (SELECT id, vec,
       sqrt(list_reduce(list_transform(vec, x -> x*x), (a,b) -> a+b)) AS nrm FROM v)
       WHERE nrm > 0),  -- zero-norm excluded on both engines (r17 sweep)
nc AS (SELECT * FROM (
  SELECT cid, cvec,
         sqrt(list_reduce(list_transform(cvec, x -> x*x), (a,b) -> a+b)) AS cnrm
  FROM (VALUES
  {cent_rows}) AS c(cid, cvec)) WHERE cnrm > 0
), assign AS (
  SELECT nv.id, nc.cid, {acos} AS cos
  FROM nv CROSS JOIN nc
), ranked AS (
  SELECT id, cid, cos,
         row_number() OVER (PARTITION BY id ORDER BY cos DESC, cid) AS rn
  FROM assign
)
SELECT CAST(cid AS BIGINT) AS cluster_id,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       (CAST(SUM(CAST(floor(cos * 10000) AS BIGINT)) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE)) / 10000.0 AS mean_cos
FROM ranked WHERE rn = 1
GROUP BY cid
"""

def _sql_semantic_dedup(threshold: float) -> str:
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm.ivf_centroids import (
        TRAINED_CENTROIDS,
    )

    cent_rows = ",\n  ".join(
        f"({i}, [{', '.join(repr(x) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(TRAINED_CENTROIDS)
    )
    acos = (
        "list_reduce(list_transform(list_zip(nv.vec, nc.cvec), x -> x[1]*x[2]),"
        " (a,b) -> a+b) / (nc.cnrm * nv.nrm)"
    )
    pcos = (
        "list_reduce(list_transform(list_zip(va.vec, vb.vec), x -> x[1]*x[2]),"
        " (a,b) -> a+b) / (va.nrm * vb.nrm)"
    )
    return f"""
WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS vec FROM embeddings),
nv AS (SELECT * FROM (SELECT id, vec,
       sqrt(list_reduce(list_transform(vec, x -> x*x), (a,b) -> a+b)) AS nrm FROM v)
       WHERE nrm > 0),  -- zero-norm excluded on both engines (r17 sweep)
nc AS (SELECT * FROM (
  SELECT cid, cvec,
         sqrt(list_reduce(list_transform(cvec, x -> x*x), (a,b) -> a+b)) AS cnrm
  FROM (VALUES
  {cent_rows}) AS c(cid, cvec)) WHERE cnrm > 0
), assign AS (
  SELECT nv.id, nc.cid, {acos} AS cos
  FROM nv CROSS JOIN nc
), ranked AS (
  SELECT id, cid,
         row_number() OVER (PARTITION BY id ORDER BY cos DESC, cid) AS rn
  FROM assign
), cl AS (
  SELECT id, cid FROM ranked WHERE rn = 1
), pairs AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM cl a JOIN cl b ON a.cid = b.cid AND a.id < b.id
)
SELECT id_a, id_b, ROUND({pcos}, 4) AS cos_sim
FROM pairs JOIN nv va ON va.id = pairs.id_a JOIN nv vb ON vb.id = pairs.id_b
WHERE ROUND({pcos}, 4) >= {threshold}
"""

from childhoodcancerdatainitiative_cbioportal_workflows_spark.llm import (  # noqa: E402
    projection_sql as _projection_sql,
)

def _register_tables(spark: SparkSession, sf_dir: str, names: list[str]) -> None:
    for t in names:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)

_PAIRS_CTE_BODY = """WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents WHERE doc_id < 1000
), sh AS (
  SELECT doc_id,
         unnest(list_distinct(CASE WHEN len(toks) >= 3
           THEN list_transform(range(1, len(toks) - 1),
                               i -> array_to_string(toks[i:i+2], ' '))
           ELSE [] END)) AS shingle
  FROM t
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= 0.5"""

def _sql_pagerank() -> str:
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.operators import (
        pagerank_fixed_sql,
    )

    return pagerank_fixed_sql(_PAIRS_CTE_BODY, iters=3)

__all__ = [  # explicit: underscore helpers must survive import *
    'Callable',
    'DataFrame',
    'F',
    'SF0001',
    'SparkSession',
    '_BM25_K1P1',
    '_BM25_TERMS',
    '_DUCK_NIBFOLD',
    '_NIBFOLD_SPLIT',
    '_PAIRS_CTE_BODY',
    '_dsum',
    '_duck_bucket_expr',
    '_duck_plane_lit',
    '_duck_shingle_cte',
    '_ivf_centroid_ids',
    '_projection_sql',
    '_register_tables',
    '_sql_ann_ivf',
    '_sql_ann_ivf_trained',
    '_sql_ann_lsh',
    '_sql_bm25',
    '_sql_embedding_dups_lsh',
    '_sql_ivf_body',
    '_sql_kmeans_clusters',
    '_sql_minhash_universal',
    '_sql_pagerank',
    '_sql_semantic_dedup',
    '_sql_simhash_md5',
    'copy_number_to_log2',
    'dedup_with_preference',
    'fingerprint',
    'gistic_call',
    'interval_join',
    'keep_first',
    'lang_id',
    'load_table',
    'os',
    'pair_rows',
    'reconcile_counts',
    'spread',
    'stopword_ratio',
    'sys',
    'to_wide_matrix',
    'ws_tokens',
]
