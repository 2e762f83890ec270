"""Annotation providers — the pluggable boundary that replaces the
reference's external annotators (Genome Nexus java pipeline at
``vcf_anno.py:312,334``; REST API at ``mci_clinical_variant_merge.py:58-160``).

Two implementations:

* :class:`LookupAnnotator` — broadcast left-join against a local annotation
  table. Hermetic (tests, offline runs) and the fast path when an
  annotation snapshot exists: at 100 TB a broadcast/sort-merge join beats
  per-row HTTP by orders of magnitude.
* :class:`BatchHttpAnnotator` — Arrow-batched ``mapInPandas`` with bounded
  per-partition concurrency, retry with backoff (mirrors the reference's
  3x/2-5-10s policy), and a pluggable ``fetch`` callable so tests never
  touch the network.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MAF_ANNOTATION_COLS = [
    "Hugo_Symbol",
    "Entrez_Gene_Id",
    "Variant_Classification",
    "Variant_Type",
    "HGVSp_Short",
    "RefSeq",
]


class LookupAnnotator:
    """Annotate variants by key lookup; unmatched rows -> FAILED.

    Reproduces the observable contract of the Genome Nexus annotator output
    (``Annotation_Status`` SUCCESS/FAILED per row, vcf_anno.py:447) without
    the subprocess.

    ``broadcast``: True forces a broadcast hint on the lookup side, False
    forbids it, None (default) leaves the strategy to Catalyst/AQE. The
    r11 version hinted unconditionally; the r12 decade probe
    (scripts/scale_round12.py) showed that turning superlinear the moment
    the annotation snapshot outgrows an executor broadcast (alpha 1.24
    at 100x sf0.1 — driver collect + per-task hash build of a
    multi-million-row table). With AQE the hint buys nothing a runtime
    size check doesn't: small snapshots still broadcast, big ones
    sort-merge instead of falling over."""

    def __init__(
        self, lookup: DataFrame, keys: list[str], broadcast: bool | None = None
    ):
        self.lookup = lookup
        self.keys = keys
        self.broadcast = broadcast

    def __call__(self, variants: DataFrame) -> DataFrame:
        # explicit match marker: deriving SUCCESS from the nullness of a
        # value column misreports a matched row whose first value is
        # legitimately NULL (e.g. Entrez_Gene_Id absent) as FAILED
        probe = self.lookup.withColumn("_matched", F.lit(True))
        if self.broadcast:
            probe = F.broadcast(probe)
        elif self.broadcast is False:
            probe = probe.hint("merge")
        out = variants.join(probe, on=self.keys, how="left")
        status = F.when(F.col("_matched").isNotNull(), F.lit("SUCCESS")).otherwise(
            F.lit("FAILED")
        )
        return out.withColumn("Annotation_Status", status).drop("_matched")


def match_consequence(
    annotation: dict, hgvs_protein: str | None, hgvs_coding: str | None
) -> tuple[str | None, str | None]:
    """The reference's HGVS matching cascade
    (mci_clinical_variant_merge.py:99-142): exact/containing protein match in
    transcriptConsequences, then transcriptConsequenceSummaries, then a
    del/dup/ins-truncated coding match. Returns (hgvs_short, classification)."""
    ann = annotation.get("annotation_summary", {}) or {}

    def scan(consequences):
        for cons in consequences or []:
            if hgvs_protein and hgvs_protein != "Not Reported":
                hgvsp = cons.get("hgvsp")
                if hgvsp and (hgvsp == hgvs_protein or hgvs_protein in hgvsp):
                    return cons.get("hgvspShort"), cons.get("variantClassification")
            else:
                if hgvs_coding and hgvs_coding in (cons.get("hgvsc") or ""):
                    return cons.get("hgvspShort"), cons.get("variantClassification")
        return None, None

    short, cls = scan(ann.get("transcriptConsequences"))
    if short is None:
        short, cls = scan(ann.get("transcriptConsequenceSummaries"))
    if short is None and hgvs_coding and any(k in hgvs_coding for k in ("del", "dup", "ins")):
        for k in ("del", "dup", "ins"):
            if k in hgvs_coding:
                trunc = hgvs_coding.split(k)[0] + k
                break
        for cons in ann.get("transcriptConsequences") or []:
            if trunc in (cons.get("hgvsc") or ""):
                return cons.get("hgvspShort"), cons.get("variantClassification")
    return short, cls


VARIANT_RESULT_FIELDS = [
    ("start", T.LongType()),
    ("end", T.LongType()),
    ("variant_type", T.StringType()),
    ("reference_allele", T.StringType()),
    ("variant_allele", T.StringType()),
    ("hgvs_short", T.StringType()),
    ("variant_classification", T.StringType()),
]


class BatchHttpAnnotator:
    """mapInPandas variant annotation.

    ``fetch(query: str) -> dict`` returns the raw annotation JSON for one
    ``chrom:hgvs_genome`` query (mci:47). The default fetch hits Genome
    Nexus over HTTP; pass a local callable for hermetic runs. Failures after
    ``retries`` attempts yield all-null fields (mci:146-160), which the
    caller filters as not-annotated."""

    def __init__(
        self,
        fetch: Callable[[str], dict] | None = None,
        reference_genome: str = "GRCh38",
        retries: int = 3,
        backoff: tuple[float, ...] = (2.0, 5.0, 10.0),
        throttle_s: float = 0.0,
    ):
        self.fetch = fetch or _default_http_fetch(reference_genome)
        self.retries = retries
        self.backoff = backoff
        self.throttle_s = throttle_s

    def __call__(self, df: DataFrame) -> DataFrame:
        import pandas as pd

        result_schema = T.StructType(
            [f for f in df.schema.fields]
            + [T.StructField(n, t) for n, t in VARIANT_RESULT_FIELDS]
        )
        fetch, retries, backoff, throttle = (
            self.fetch,
            self.retries,
            self.backoff,
            self.throttle_s,
        )

        def annotate_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
            for pdf in batches:
                results = []
                for row in pdf.itertuples(index=False):
                    data = None
                    for attempt in range(retries):
                        try:
                            data = fetch(row.query)
                            break
                        except Exception:
                            if attempt < retries - 1:
                                time.sleep(backoff[min(attempt, len(backoff) - 1)])
                    if throttle:
                        time.sleep(throttle)
                    if data is None:
                        results.append({n: None for n, _ in VARIANT_RESULT_FIELDS})
                        continue
                    ann = data.get("annotation_summary", {}) or {}
                    loc = ann.get("genomicLocation", {}) or {}
                    short, cls = match_consequence(
                        data,
                        getattr(row, "hgvs_protein", None),
                        getattr(row, "hgvs_coding", None),
                    )
                    results.append(
                        {
                            "start": loc.get("start"),
                            "end": loc.get("end"),
                            "variant_type": ann.get("variantType"),
                            "reference_allele": loc.get("referenceAllele"),
                            "variant_allele": loc.get("variantAllele"),
                            "hgvs_short": short,
                            "variant_classification": cls,
                        }
                    )
                res = pd.DataFrame(results, columns=[n for n, _ in VARIANT_RESULT_FIELDS])
                yield pd.concat([pdf.reset_index(drop=True), res], axis=1)

        return df.mapInPandas(annotate_batches, schema=result_schema)


def _default_http_fetch(reference_genome: str) -> Callable[[str], dict]:
    base = (
        "https://grch38.genomenexus.org"
        if reference_genome == "GRCh38"
        else "https://www.genomenexus.org"
    )
    fields = "hotspots,annotation_summary,my_variant_info,clinvar,signal,mutation_assessor"

    def fetch(query: str) -> dict:
        try:
            import requests
        except ImportError as exc:
            raise NotImplementedError(
                "HTTP annotation requires the requests package; pass a local "
                "fetch callable instead"
            ) from exc
        r = requests.get(f"{base}/annotation/{query}?fields={fields}", timeout=10)
        return r.json()

    return fetch
