"""End-to-end CNV pipeline test on synthetic fixtures (FIXTURES.md §3, §6),
cross-checked against an independent pandas implementation of the reference
semantics (cnv.py:238-711)."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pytest

from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.cnv import (
    cnv_pipeline,
    gene_list_format,
)
from childhoodcancerdatainitiative_cbioportal_workflows_spark.sources.tsv import (
    read_tsv,
    write_tsv,
)


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    root = tmp_path_factory.mktemp("cnv_fixtures")
    rng = np.random.default_rng(42)
    chroms = ["chr1"] * 6 + ["chr2"] * 3 + ["chrX"]

    # --- CNV JSON files, one per sample
    samples = [("P0001", "T01"), ("P0002", "T02"), ("P0003", "T03")]
    all_segments = []
    for pi, (participant, sample) in enumerate(samples):
        segs = []
        # CNV segmentation emits non-overlapping segments per sample &
        # chromosome (which also makes (gene, sample) pivot cells unique —
        # two disjoint segments cannot both cover >=50% of one gene)
        positions = []
        for chrom in ("chr1", "chr2", "chrX"):
            cursor = int(rng.integers(1_000, 50_000))
            for _ in range(14 if chrom == "chr1" else 7):
                length = int(rng.integers(10_000, 800_000))
                positions.append((chrom, cursor, length))
                cursor += length + int(rng.integers(1_000, 200_000))
        for chrom, start, length in positions:
            log2 = float(np.round(rng.normal(0, 1.2), 4))
            segs.append(
                {
                    "position": {
                        "chrom": chrom,
                        "start": start,
                        "end": start + length,
                        "length": length,
                    },
                    "cnv": {
                        "log2_copy_ratio": log2,
                        "cnv_supporting_points": int(rng.integers(5, 500)),
                        "cnv_supporting_reads": int(rng.integers(100, 9000)),
                        "log2_pval": float(rng.uniform(0, 0.1)),
                        "log2_copy_ratio_90per_ci_low": log2 - 0.1,
                        "log2_copy_ratio_90per_ci_high": log2 + 0.1,
                    },
                }
            )
            all_segments.append(
                dict(sample_id=sample, chrom=chrom, start=start, end=start + length, log2=log2)
            )
        doc = {"metadata": {"sample_name": f"{participant}-{sample}"}, "segments": segs}
        (root / f"{sample}.json").write_text(json.dumps(doc))

    # a segment on a chromosome with no genes -> maps to nothing; the
    # reconciliation must flag it (expected=1, observed=0). chrY carries no
    # gene fixture rows.
    lone_doc = json.loads((root / "T01.json").read_text())
    lone_doc["segments"].append(
        {
            "position": {"chrom": "chrY", "start": 500, "end": 10_500, "length": 10_000},
            "cnv": {
                "log2_copy_ratio": 0.5,
                "cnv_supporting_points": 10,
                "cnv_supporting_reads": 100,
                "log2_pval": 0.01,
                "log2_copy_ratio_90per_ci_low": 0.4,
                "log2_copy_ratio_90per_ci_high": 0.6,
            },
        }
    )
    (root / "T01.json").write_text(json.dumps(lone_doc))
    all_segments.append(
        dict(sample_id="T01", chrom="chrY", start=500, end=10_500, log2=0.5)
    )

    # --- GTF: genes incl. non-coding, readthrough, chrM, dup loci, multi-pos
    rows = []

    def gene(chrom, start, end, name, gtype="protein_coding", tag=""):
        attrs = f'gene_id "G{name}"; gene_type "{gtype}"; gene_name "{name}"; '
        if tag:
            attrs += f'tag "{tag}"; '
        rows.append([chrom, "HAVANA", "gene", start, end, ".", "+", ".", attrs])

    for i in range(60):
        chrom = chroms[int(rng.integers(0, len(chroms)))]
        start = int(rng.integers(1_000, 5_000_000))
        end = start + int(rng.integers(5_000, 400_000))
        gene(chrom, start, end, f"GENE{i}")
    gene("chr1", 10_000, 50_000, "NCRNA1", gtype="lncRNA")          # filtered
    gene("chr1", 10_000, 50_000, "RT1", tag="readthrough_gene")     # filtered
    gene("chrM", 100, 900, "MT1")                                    # filtered
    gene("chr2", 20_000, 90_000, "DUPLOC_A")                         # same locus
    gene("chr2", 20_000, 90_000, "DUPLOC_B")                         # -> keep one
    gene("chr3", 1_000, 2_000, "MULTI")                              # multi-pos:
    gene("chr3", 1_000, 9_000, "MULTI")                              # keep longest
    rows.append(["chr1", "HAVANA", "transcript", 1, 10, ".", "+", ".", 'gene_name "T" gene_type "protein_coding"'])

    gtf_path = root / "genes.gtf"
    with open(gtf_path, "w") as f:
        f.write("##description: test\n")
        for r in rows:
            f.write("\t".join(str(x) for x in r) + "\n")

    return {
        "root": str(root),
        "json_paths": [str(root / f"{s}.json") for _, s in samples],
        "gtf_path": str(gtf_path),
        "segments_pdf": pd.DataFrame(all_segments),
        "gtf_rows": rows,
    }


def _expected_gene_map(fix):
    """Independent pandas implementation of gene-list format + bedtools
    intersect -f 0.5 semantics."""
    rows = [r for r in fix["gtf_rows"] if r[2] == "gene"]
    g = pd.DataFrame(rows, columns=["chrom", "src", "feat", "start", "end", "s", "st", "f", "attrstr"])
    g = g[
        g.attrstr.str.contains("protein_coding")
        & ~g.attrstr.str.contains("readthrough_gene")
        & (g.chrom != "chrM")
    ].copy()
    g["gene_names"] = g.attrstr.str.extract(r'gene_name "([^"]+)"')
    g = g.sort_values(["chrom", "start", "end", "gene_names"]).drop_duplicates(
        ["chrom", "start", "end"], keep="first"
    )
    g["length"] = g.end - g.start
    g = g.sort_values(["chrom", "start", "length"], ascending=[True, True, False])
    g = g.drop_duplicates(["chrom", "gene_names"], keep="first")
    g["start"] = g.start - 1

    s = fix["segments_pdf"].copy()  # chrom carries 'chr' prefix already
    m = g.merge(s, on="chrom", suffixes=("_g", "_s"))
    ov = np.minimum(m.end_g, m.end_s) - np.maximum(m.start_g, m.start_s)
    m = m[(ov > 0) & (ov >= 0.5 * (m.end_g - m.start_g))].copy()
    m["overlap"] = ov
    return g, m


def test_cnv_pipeline_end_to_end(spark, fixtures):
    gtf = read_tsv(
        spark,
        fixtures["gtf_path"],
        names=[f"c{i}" for i in range(9)],
        comment="#",
    )
    results = cnv_pipeline(spark, fixtures["json_paths"], gtf)

    # segment parse: row count = all segments incl. the duplicated one
    segs = results["segment_data_raw"].toPandas()
    assert len(segs) == len(fixtures["segments_pdf"])
    assert not segs.chrom.str.contains("chr").any()  # stripped
    assert set(segs.columns) >= {"participant", "sample_id", "chrom", "start", "end"}

    # .seg projection columns exactly as the cBio contract
    seg_file = results["data_cna_seg"]
    assert seg_file.columns == ["ID", "chrom", "loc.start", "loc.end", "num.mark", "seg.mean"]

    g_expected, map_expected = _expected_gene_map(fixtures)

    # gene list formatting: filters + dedups match the pandas replica
    genes = gene_list_format(gtf).toPandas()
    assert set(genes.gene_names) == set(g_expected.gene_names)
    assert "NCRNA1" not in set(genes.gene_names)
    assert "RT1" not in set(genes.gene_names)
    assert "MT1" not in set(genes.gene_names)
    multi = genes[genes.gene_names == "MULTI"]
    assert len(multi) == 1 and int(multi.end.iloc[0]) == 9_000  # longest kept
    assert len(genes[(genes.chrom == "chr2") & (genes.start == 19_999)]) == 1  # one per locus

    # gene-level matrix parity with the brute-force expected pairs
    log2_wide = results["data_log2_cna"].toPandas().set_index("Hugo_Symbol")
    exp_pairs = {
        (r.gene_names, r.sample_id, round(float(r.log2), 4))
        for r in map_expected.itertuples()
    }
    got_pairs = set()
    for gene_name, row in log2_wide.iterrows():
        for sample, v in row.items():
            if v != "NA":
                got_pairs.add((gene_name, sample, round(float(v), 4)))
    assert got_pairs == exp_pairs

    # GISTIC matrix: spot-check bin edges on the expected values
    gistic = results["data_cna"].toPandas().set_index("Hugo_Symbol")
    for r in map_expected.itertuples():
        v = float(r.log2)
        want = 2 if v > 2 else 1 if v > 0.3 else -2 if v < -1 else -1 if v < -0.3 else 0
        assert int(gistic.loc[r.gene_names, r.sample_id]) == want

    # reconciliation: the chrY segment maps to no gene -> expected=1,
    # observed=0, mismatch flagged; mapped segments reconcile clean
    val = results["validate"].toPandas()
    vrow = val[(val.sample_id == "T01") & (val.chrom == "chrY")]
    assert len(vrow) == 1
    assert int(vrow.expected.iloc[0]) == 1 and int(vrow.observed.iloc[0]) == 0
    assert bool(vrow.mismatch.iloc[0])
    assert (~val.mismatch).any()


def test_write_tsv_contract(spark, fixtures, tmp_path):
    """TSV sink: single file, tab sep, header order, no quoting."""
    gtf = read_tsv(
        spark, fixtures["gtf_path"], names=[f"c{i}" for i in range(9)], comment="#"
    )
    results = cnv_pipeline(spark, fixtures["json_paths"], gtf)
    out = str(tmp_path / "data_cna.seg")
    write_tsv(results["data_cna_seg"], out)
    with open(out) as f:
        header = f.readline().rstrip("\n")
        first = f.readline()
    assert header == "ID\tchrom\tloc.start\tloc.end\tnum.mark\tseg.mean"
    assert '"' not in first
