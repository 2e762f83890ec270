"""Input-contract validation.

Re-expresses the manifest contract checks of the reference
(``workflows/cnv.py:32-52``, ``workflows/pedmatch-clinical-vcf-workflow.py:26-46``):
required columns present, no nulls in required columns, no duplicate values
in declared-unique columns. The reference does this eagerly in pandas; here
each check is a single short-circuiting Spark job (``limit(1)``) so the scan
cost is bounded and filters push down to the source.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F


class ContractViolation(ValueError):
    pass


@dataclass(frozen=True)
class Contract:
    required: tuple[str, ...] = ()
    no_null: tuple[str, ...] = ()
    unique: tuple[str, ...] = ()
    # column -> allowed values (pedmatch sample_type in {tissue, blood})
    enums: dict = field(default_factory=dict)
    # Whether the no_null check also rejects empty strings. The reference's
    # pandas ``isnull()`` (cnv.py:38-40) does NOT flag '' — but its TSV
    # manifests arrive through read_csv, where an empty field IS NaN, so
    # '' never reaches the check there. Spark's csv reader keeps '' as ''
    # unless nullValue is set; treating '' as null here restores the same
    # effective gate. Set False for strict reference parity on sources
    # where '' is a legitimate value.
    empty_is_null: bool = True


def validate(df: DataFrame, contract: Contract) -> DataFrame:
    """Raise ContractViolation on the first failed check; return df unchanged.

    Mirrors reference semantics: missing column (cnv.py:33-36), null in a
    required column (cnv.py:38-40), duplicated unique column (cnv.py:42-52).
    Deviation: with the default ``empty_is_null=True`` the no-null check also
    rejects ``''`` (see :class:`Contract` for why that matches the reference's
    read_csv-mediated behavior); pass ``empty_is_null=False`` for a pure
    ``isnull()`` check.
    """
    missing = [c for c in contract.required if c not in df.columns]
    if missing:
        raise ContractViolation(f"manifest missing required columns: {missing}")

    null_checks = [c for c in contract.no_null if c in df.columns]
    if null_checks:
        def _is_bad(c: str):
            if contract.empty_is_null:
                return F.col(c).isNull() | (F.col(c) == "")
            return F.col(c).isNull()

        # one job for all columns: count nulls per column, stop at any > 0
        agg = df.select(
            *[
                F.sum(F.when(_is_bad(c), 1).otherwise(0)).alias(c)
                for c in null_checks
            ]
        ).first()
        bad = [c for c in null_checks if (agg[c] or 0) > 0]
        if bad:
            raise ContractViolation(f"null/empty values in required columns: {bad}")

    for c in contract.unique:
        if c not in df.columns:
            continue
        dup = (
            df.groupBy(c).count().filter(F.col("count") > 1).limit(1).count()
        )
        if dup:
            raise ContractViolation(f"duplicate values in unique column: {c}")

    for c, allowed in contract.enums.items():
        if c not in df.columns:
            continue
        bad = df.filter(~F.col(c).isin(list(allowed))).limit(1).count()
        if bad:
            raise ContractViolation(f"values outside enum for column: {c}")

    return df


CNV_MANIFEST = Contract(
    required=("sample_id", "s3_url", "file_name", "md5sum", "file_size"),
    no_null=("sample_id", "s3_url", "file_name", "md5sum"),
    unique=("sample_id", "file_name", "s3_url", "md5sum"),
)

PEDMATCH_MANIFEST = Contract(
    required=(
        "sample_id",
        "participant_id",
        "sample_type",
        "s3_url",
        "file_name",
        "md5sum",
        "file_size",
    ),
    no_null=("sample_id", "participant_id", "sample_type", "s3_url", "file_name"),
    unique=("sample_id", "file_name", "s3_url"),
    enums={"sample_type": ("tissue", "blood")},
)
