"""Declared input schemas for the reference's file formats (FIXTURES.md).

Schema inference is a SECOND full pass over the data — at 100 TB that
doubles ingest cost — so every pipeline scan declares its schema from this
registry and ``read_tsv`` treats inference as opt-in. Types mirror how the
reference reads/validates each format (citations in FIXTURES.md).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _struct(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t) for n, t in fields])


S, L, D = T.StringType(), T.LongType(), T.DoubleType()

# workflows/cnv.py:33-52; pedmatch adds participant_id/sample_type (:27)
CNV_MANIFEST_SCHEMA = _struct(
    ("sample_id", S), ("s3_url", S), ("file_name", S), ("md5sum", S), ("file_size", L)
)
PEDMATCH_MANIFEST_SCHEMA = _struct(
    ("sample_id", S), ("participant_id", S), ("sample_type", S),
    ("s3_url", S), ("file_name", S), ("md5sum", S), ("file_size", L),
)

# workflows/vcf_anno.py:535 (CSV manifest)
VCF_ANNO_MANIFEST_SCHEMA = _struct(("sample", S), ("file_url", S), ("md5sum", S))

# workflows/cnv.py:353-368 — headerless GTF, positional columns
GTF_SCHEMA = _struct(
    ("seqname", S), ("source", S), ("feature", S), ("start", L), ("end", L),
    ("score", S), ("strand", S), ("frame", S), ("attributes", S),
)
GTF_COLUMNS = [f.name for f in GTF_SCHEMA.fields]

# workflows/cnv.py:299-310 — .seg intermediate/output
SEG_SCHEMA = _struct(
    ("ID", S), ("chrom", S), ("loc.start", L), ("loc.end", L),
    ("num.mark", L), ("seg.mean", D),
)

# MAF columns the workflows touch (vcf_anno.py:318-319,429-463; mci:232-289;
# pedmatch:541,675-686). The reference reads MAFs with dtype=str and strips
# ``.0`` at the edges, so every column is declared string — numeric casts
# happen where the plans need arithmetic, not at scan time.
MAF_SCHEMA = _struct(
    ("Hugo_Symbol", S), ("Entrez_Gene_Id", S), ("NCBI_Build", S), ("Chromosome", S),
    ("Start_Position", S), ("End_Position", S), ("Reference_Allele", S),
    ("Tumor_Seq_Allele1", S), ("Tumor_Seq_Allele2", S), ("Variant_Classification", S),
    ("Variant_Type", S), ("HGVSp_Short", S), ("RefSeq", S), ("Tumor_Sample_Barcode", S),
    ("t_depth", S), ("n_depth", S), ("t_alt_count", S), ("t_ref_count", S),
    ("Protein_position", S), ("Annotation_Status", S),
)
