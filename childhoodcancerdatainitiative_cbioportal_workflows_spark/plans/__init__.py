from . import annotation, clinical_merge, cnv, pedmatch, vcf_anno  # noqa: F401
