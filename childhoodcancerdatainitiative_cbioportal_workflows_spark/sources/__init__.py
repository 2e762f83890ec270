from .tsv import read_tsv, read_csv_file, write_tsv  # noqa: F401
from .json_docs import read_cnv_json, CNV_JSON_SCHEMA  # noqa: F401
from .vcf import read_vcf, VCF_FIXED_COLUMNS  # noqa: F401
from .excel import read_excel  # noqa: F401
from .pyds import register_python_sources  # noqa: F401
from .sqldump import parse_sql_dump_counts  # noqa: F401
from .audit import audit_files, audit_summary  # noqa: F401
from .http import fetch_to_staging  # noqa: F401
from .bucketing import write_bucketed, write_partitioned, read_table  # noqa: F401
from .layout import interleave_bits, with_zvalue, write_zordered  # noqa: F401
