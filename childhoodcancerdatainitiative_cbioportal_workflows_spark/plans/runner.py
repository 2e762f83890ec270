"""Staged pipeline runner — the thin orchestration layer replacing Prefect
(SURVEY §7 P6).

The reference's resume logic (``vcf_anno.py:542-634``) lists previously
downloaded/annotated files and anti-filters the manifest. The engine
generalizes that to: each stage writes an idempotent sink; a completed sink
(marked by Spark's ``_SUCCESS``) is not recomputed; downstream stages read
the sink instead of re-deriving the plan, which also truncates lineage at
stage boundaries (checkpoint semantics without the RDD checkpoint API).
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Stage:
    name: str
    # build(ctx) -> DataFrame; ctx maps stage name -> its (re)loaded output
    build: Callable[[dict[str, DataFrame]], DataFrame]
    # stages whose outputs this build reads from ctx
    deps: tuple[str, ...] = ()


@dataclass
class RunReport:
    computed: list[str] = field(default_factory=list)
    resumed: list[str] = field(default_factory=list)
    timings: dict[str, float] = field(default_factory=dict)


class PipelineRunner:
    """Execute stages in declaration order with parquet sinks + resume.

    - a stage with an existing ``_SUCCESS`` sink is resumed (skipped);
    - ``force`` recomputes everything from a given stage onward;
    - external-call retries live inside providers (plans/annotation.py),
      not here: Spark task retries already cover compute failures.
    """

    def __init__(self, spark: SparkSession, workdir: str):
        self.spark = spark
        self.workdir = workdir

    def _sink(self, name: str) -> str:
        return os.path.join(self.workdir, name)

    def _complete(self, name: str) -> bool:
        # probe through Hadoop's FileSystem, not os.path: workdir may be
        # S3/HDFS (the 100 TB deployment), where a driver-local exists()
        # always says no and resume silently never triggers
        jvm = self.spark._jvm
        path = jvm.org.apache.hadoop.fs.Path(
            os.path.join(self._sink(name), "_SUCCESS")
        )
        fs = path.getFileSystem(self.spark._jsc.hadoopConfiguration())
        return fs.exists(path)

    def run(self, stages: list[Stage], force_from: str | None = None) -> RunReport:
        report = RunReport()
        ctx: dict[str, DataFrame] = {}
        forcing = False
        recomputed: set[str] = set()
        for st in stages:
            if force_from == st.name:
                forcing = True
            missing = [d for d in st.deps if d not in ctx]
            if missing:
                raise ValueError(f"stage {st.name}: unresolved deps {missing}")
            # a recomputed upstream invalidates this stage's sink — resuming
            # it would silently serve results derived from the OLD upstream
            stale = any(d in recomputed for d in st.deps)
            if self._complete(st.name) and not forcing and not stale:
                ctx[st.name] = self.spark.read.parquet(self._sink(st.name))
                report.resumed.append(st.name)
                continue
            recomputed.add(st.name)
            t0 = time.time()
            out = st.build(ctx)
            out.write.mode("overwrite").parquet(self._sink(st.name))
            ctx[st.name] = self.spark.read.parquet(self._sink(st.name))
            report.computed.append(st.name)
            report.timings[st.name] = round(time.time() - t0, 3)
        return report
