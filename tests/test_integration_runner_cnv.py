"""Integration: the full CNV flow composed through the PipelineRunner —
the Prefect-replacement story end to end (stages, idempotent sinks, resume),
plus a TSV sink/scan round-trip."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.cnv import (
    gene_cnv_map,
    gene_list_format,
    parse_segments,
    segment_bed,
    to_seg_file,
    validate_gene_mapping,
)
from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.runner import (
    PipelineRunner,
    Stage,
)
from childhoodcancerdatainitiative_cbioportal_workflows_spark.sources.tsv import (
    read_tsv,
    write_tsv,
)


@pytest.fixture(scope="module")
def cnv_inputs(tmp_path_factory):
    root = tmp_path_factory.mktemp("cnv_int")
    rng = np.random.default_rng(9)
    json_paths = []
    for participant, sample in [("P1", "S1"), ("P2", "S2")]:
        cursor, segs = 10_000, []
        for _ in range(12):
            length = int(rng.integers(20_000, 300_000))
            segs.append(
                {
                    "position": {"chrom": "chr1", "start": cursor, "end": cursor + length, "length": length},
                    "cnv": {
                        "log2_copy_ratio": float(np.round(rng.normal(0, 1), 4)),
                        "cnv_supporting_points": int(rng.integers(5, 100)),
                        "cnv_supporting_reads": 100,
                        "log2_pval": 0.01,
                        "log2_copy_ratio_90per_ci_low": 0.0,
                        "log2_copy_ratio_90per_ci_high": 0.1,
                    },
                }
            )
            cursor += length + int(rng.integers(5_000, 50_000))
        p = root / f"{sample}.json"
        p.write_text(json.dumps({"metadata": {"sample_name": f"{participant}-{sample}"}, "segments": segs}))
        json_paths.append(str(p))

    gtf = root / "g.gtf"
    lines = ["##test"]
    cursor = 15_000
    for i in range(20):
        end = cursor + int(rng.integers(10_000, 120_000))
        lines.append(
            "\t".join(
                [
                    "chr1", "H", "gene", str(cursor), str(end), ".", "+", ".",
                    f'gene_type "protein_coding"; gene_name "G{i}"; ',
                ]
            )
        )
        cursor = end + int(rng.integers(5_000, 60_000))
    gtf.write_text("\n".join(lines) + "\n")
    return {"json_paths": json_paths, "gtf": str(gtf)}


def test_cnv_flow_through_runner(spark, cnv_inputs, tmp_path):
    def s_segments(ctx):
        return parse_segments(spark, cnv_inputs["json_paths"])

    def s_genes(ctx):
        gtf = read_tsv(spark, cnv_inputs["gtf"], names=[f"c{i}" for i in range(9)], comment="#")
        return gene_list_format(gtf)

    def s_map(ctx):
        return gene_cnv_map(ctx["genes"], segment_bed(to_seg_file(ctx["segments"])))

    def s_validate(ctx):
        return validate_gene_mapping(ctx["segments"], ctx["gene_map"])

    stages = [
        Stage("segments", s_segments),
        Stage("genes", s_genes),
        Stage("gene_map", s_map, deps=("genes", "segments")),
        Stage("validate", s_validate, deps=("segments", "gene_map")),
    ]
    runner = PipelineRunner(spark, str(tmp_path / "cnv_wd"))
    r1 = runner.run(stages)
    assert r1.computed == ["segments", "genes", "gene_map", "validate"]

    # resumed second run reads sinks, no recompute
    r2 = runner.run(stages)
    assert r2.resumed == ["segments", "genes", "gene_map", "validate"]

    gm = spark.read.parquet(str(tmp_path / "cnv_wd" / "gene_map"))
    assert gm.count() > 0
    assert set(gm.columns) >= {"Hugo_Symbol", "sample_id", "log2"}
    val = spark.read.parquet(str(tmp_path / "cnv_wd" / "validate"))
    assert val.filter(F.col("mismatch")).count() < val.count()  # mostly clean


def test_pedmatch_flow_through_runner(spark, tmp_path):
    """Pedmatch composed through the runner: pair -> prep -> fusion/cnv/snv
    stages with sinks, sharing the loaded-VCF stage."""
    from childhoodcancerdatainitiative_cbioportal_workflows_spark.plans.pedmatch import (
        af_table,
        cnv_germline_subtract,
        cnv_prep,
        fusion_germline_subtract,
        fusion_prep,
        pair_patients,
        prep_clinical_vcf,
        read_clinical_vcfs,
        snv_somatic,
    )
    import pandas as pd

    FMT = "GT:GQ:DP:MDP:MAF:FRO:QUAL2:FAO:AF:OTHER"

    def fv(gt, dp, fro, fao, af):
        return f"{gt}:99:{dp}:0:0:{fro}:50:{fao}:{af}:x"

    hdr = "##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n"
    t_rows = [
        ("chr1", 100, "F7_1", "A", "<SV>", "9", "PASS",
         "SVTYPE=Fusion;GENE_NAME=AA;EXON_NUM=1;ANNOTATION=a;READ_COUNT=5", FMT, fv("0/1", 30, 5, 25, 0.5)),
        ("chr1", 200, "F7_2", "A", "<SV>", "9", "PASS",
         "SVTYPE=Fusion;GENE_NAME=BB;EXON_NUM=2;ANNOTATION=b;READ_COUNT=6", FMT, fv("0/1", 30, 5, 25, 0.5)),
        ("chr2", 300, "MYC", "A", "<CNV>", "9", "PASS",
         "SVTYPE=CNV;Amplification;NUMTILES=3;END=4300;RAW_CN=6.0", FMT, fv("0/1", 30, 5, 25, 0.5)),
        ("chr3", 400, "sv1", "G", "T", "9", "PASS", "DP=x", FMT, fv("0/1", 25, 10, 15, 0.6)),
    ]
    n_rows = [("chr3", 400, "sv1", "G", "T", "9", "PASS", "DP=x", FMT, fv("0/0", 20, 10, 0, 0.0))]
    for fn, rows in (("T.vcf", t_rows), ("N.vcf", n_rows)):
        with open(tmp_path / fn, "w") as f:
            f.write(hdr)
            for r in rows:
                f.write("\t".join(str(x) for x in r) + "\n")
    manifest = spark.createDataFrame(
        pd.DataFrame(
            [
                ("X_tissue", "X", "tissue", "T.vcf"),
                ("X_blood", "X", "blood", "N.vcf"),
            ],
            columns=["sample_id", "participant_id", "sample_type", "file_name"],
        )
    )

    def s_pairs(ctx):
        return pair_patients(manifest)

    def s_vcf(ctx):
        return prep_clinical_vcf(read_clinical_vcfs(spark, str(tmp_path), manifest))

    def s_fusions(ctx):
        return fusion_germline_subtract(fusion_prep(ctx["vcf"]), ctx["pairs"])

    def s_cnv(ctx):
        return cnv_germline_subtract(cnv_prep(ctx["vcf"]), ctx["pairs"])

    def s_snv_af(ctx):
        return af_table(snv_somatic(ctx["vcf"], ctx["pairs"]))

    stages = [
        Stage("pairs", s_pairs),
        Stage("vcf", s_vcf),
        Stage("fusions", s_fusions, deps=("vcf", "pairs")),
        Stage("cnv", s_cnv, deps=("vcf", "pairs")),
        Stage("snv_af", s_snv_af, deps=("vcf", "pairs")),
    ]
    runner = PipelineRunner(spark, str(tmp_path / "ped_wd"))
    r1 = runner.run(stages)
    assert r1.computed == ["pairs", "vcf", "fusions", "cnv", "snv_af"]
    assert runner.run(stages).resumed == ["pairs", "vcf", "fusions", "cnv", "snv_af"]

    wd = str(tmp_path / "ped_wd")
    assert spark.read.parquet(f"{wd}/fusions").count() == 1
    cnv = spark.read.parquet(f"{wd}/cnv").toPandas()
    assert list(cnv.Hugo_Symbol) == ["MYC"]
    af = spark.read.parquet(f"{wd}/snv_af").toPandas()
    assert len(af) == 1 and af.t_alt_count.iloc[0] == "15"


def test_tsv_round_trip(spark, tmp_path):
    df = spark.createDataFrame(
        [("TP53", 1, 0.5, None), ("EG FR", 2, -1.25, "x\ty")],
        "gene string, k long, v double, note string",
    )
    out = str(tmp_path / "rt.tsv")
    write_tsv(df, out, columns=["gene", "k", "v", "note"], na_rep="NA")
    # inference is opt-in (scan cost); this generic read-back wants types
    back = read_tsv(spark, out, infer_schema=True).toPandas().sort_values("k")
    assert list(back.gene) == ["TP53", "EG FR"]
    assert list(back.v) == [0.5, -1.25]
    assert back.note.iloc[0] == "NA"       # null sentinel round-trips
    assert back.note.iloc[1] == "x\\ty"    # embedded tab escaped, row intact
    raw = open(out).read()
    assert "\x00" not in raw               # no NUL quote bytes in the file
