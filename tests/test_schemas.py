"""Schema-registry scans: inference is opt-in (it is a second full pass of
the data); pipeline formats declare types from core.schemas."""

from __future__ import annotations

from childhoodcancerdatainitiative_cbioportal_workflows_spark.core.schemas import (
    GTF_COLUMNS,
    GTF_SCHEMA,
    SEG_SCHEMA,
    VCF_ANNO_MANIFEST_SCHEMA,
)
from childhoodcancerdatainitiative_cbioportal_workflows_spark.sources import (
    read_csv_file,
    read_tsv,
)


def test_read_tsv_defaults_to_strings_no_inference(spark, tmp_path):
    p = str(tmp_path / "t.tsv")
    open(p, "w").write("a\tb\n1\t2.5\n3\t4.5\n")
    df = read_tsv(spark, p)
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["string", "string"]
    inferred = read_tsv(spark, p, infer_schema=True)
    assert [f.dataType.simpleString() for f in inferred.schema.fields] == ["int", "double"]


def test_seg_schema_scan(spark, tmp_path):
    p = str(tmp_path / "x.seg")
    open(p, "w").write(
        "ID\tchrom\tloc.start\tloc.end\tnum.mark\tseg.mean\n"
        "S1\t17\t100\t900\t42\t-1.25\n"
    )
    df = read_tsv(spark, p, schema=SEG_SCHEMA, header=True)
    row = df.collect()[0]
    assert row["loc.start"] == 100 and abs(row["seg.mean"] + 1.25) < 1e-12


def test_gtf_schema_positional(spark, tmp_path):
    p = str(tmp_path / "g.gtf")
    open(p, "w").write(
        "#!genebuild 2024\n"
        'chr1\tHAVANA\tgene\t100\t5000\t.\t+\t.\tgene_name "TP53";\n'
    )
    df = read_tsv(spark, p, schema=GTF_SCHEMA, comment="#")
    assert df.columns == GTF_COLUMNS
    row = df.collect()[0]
    assert row["start"] == 100 and row["end"] == 5000 and row["feature"] == "gene"


def test_manifest_schema_csv(spark, tmp_path):
    p = str(tmp_path / "m.csv")
    open(p, "w").write("sample,file_url,md5sum\nS1,s3://b/f.vcf.gz,abc\n")
    df = read_csv_file(spark, p, schema=VCF_ANNO_MANIFEST_SCHEMA, header=True)
    assert df.collect()[0]["sample"] == "S1"
