"""Unit tests for bench.py's measurement statistics (r15 verdict task 1:
the official BENCH_r15 headline was a single contaminated warm pass; these
synthetic pass vectors pin the rules that make that impossible again).

No Spark session — bench's statistic/diagnosis layer is pure functions.
"""

from __future__ import annotations

import bench


class TestFaceStatistic:
    def test_three_passes_min_over_warm(self):
        # warmup 13.1 (JIT), warm 8.6 / 2.5 -> min over warm only
        assert bench.face_statistic([13.1, 8.6, 2.5]) == 2.5

    def test_three_passes_warmup_excluded_even_when_fastest(self):
        # a contaminated warm pair must NOT reach back to pass 0 when two
        # warm samples exist — min_warm stays warm-only for comparability
        assert bench.face_statistic([2.0, 3.0, 4.0]) == 3.0

    def test_single_warm_pass_takes_min_over_all(self):
        # the r15 hole: pass 1 carried 75s of box contention and was the
        # ONLY warm sample; pass 0 (3.1s JIT-inflated from 2.5s true) is
        # the better estimate by 75s
        assert bench.face_statistic([3.1, 78.9]) == 3.1

    def test_single_warm_pass_uses_warm_when_faster(self):
        # normal 2-pass shape: warm pass is JIT-matured and faster
        assert bench.face_statistic([13.1, 2.5]) == 2.5

    def test_single_pass_returns_lone_sample(self):
        assert bench.face_statistic([4.2]) == 4.2


class TestContentionReasons:
    QUIET = dict(
        pass_totals=[200.0, 150.0, 148.0],
        pass_loads=[[0.5, 0.4], [0.6, 0.5], [0.5, 0.5]],
        load1_start=0.1,
        load5_start=0.3,
        settled1=0.1,
        settled5=0.3,
        threshold=2.0,
    )

    def test_quiet_run_is_clean(self):
        assert bench.contention_reasons(**self.QUIET) == []

    def test_r15_shape_is_stamped(self):
        # the actual BENCH_r15 signature: warmup total 197 < timed 287,
        # loads ramping 5.1/6.91 -> 5.99/8.39, start load1 5.98 — under
        # the old 8.0 threshold this stamped contended:false
        reasons = bench.contention_reasons(
            pass_totals=[197.17, 287.02],
            pass_loads=[[5.1, 6.91], [5.99, 8.39]],
            load1_start=5.98,
            load5_start=4.0,
            settled1=5.98,
            settled5=4.0,
            threshold=2.0,
        )
        assert "start_load1" in reasons
        assert "warm_pass_slower_than_warmup" in reasons

    def test_warm_pass_slower_than_warmup_alone(self):
        args = dict(self.QUIET, pass_totals=[200.0, 210.0, 150.0])
        assert bench.contention_reasons(**args) == [
            "warm_pass_slower_than_warmup"
        ]

    def test_warm_pass_noise_within_margin_is_clean(self):
        # r16 advice: millisecond/noise-scale excess over the warmup
        # total must not stamp contended — the margin is >2% AND >1s
        for totals in ([200.0, 200.5, 150.0], [200.0, 203.9, 150.0],
                       [40.0, 40.8, 39.0]):
            args = dict(self.QUIET, pass_totals=totals)
            assert bench.contention_reasons(**args) == [], totals

    def test_warm_pass_clear_excess_still_flagged(self):
        # both margins exceeded on a small-total run: 11.5 > 10.2 and > 11
        args = dict(self.QUIET, pass_totals=[10.0, 11.5, 9.0])
        assert bench.contention_reasons(**args) == [
            "warm_pass_slower_than_warmup"
        ]

    def test_self_load_steady_state_is_clean(self):
        # the bench's own local[n] executors push load5 to ~6 on a quiet
        # box — identical every pass, so a steady plateau is NOT flagged
        # (a static bar would stamp every honest run contended)
        args = dict(
            self.QUIET,
            pass_loads=[[4.0, 6.0], [4.2, 6.5], [4.1, 6.2]],
        )
        assert bench.contention_reasons(**args) == []

    def test_pass_end_load5_ramp_flagged(self):
        # external work arriving mid-run lifts the warm pass-over-pass
        # ratio (self-load has plateaued by the end of the first warm pass)
        args = dict(
            self.QUIET, pass_loads=[[4.0, 5.0], [4.2, 6.0], [8.0, 10.5]]
        )
        assert bench.contention_reasons(**args) == ["pass_end_load5_ramp"]

    def test_warmup_to_first_warm_saturation_not_flagged(self):
        # load5's 5-min window is still saturating with SELF-load across
        # the first pass: 4.0 -> 6.4 is the clean-run arithmetic, not
        # contention — the warmup-end pair is excluded from the ramp
        args = dict(
            self.QUIET, pass_loads=[[0.5, 4.0], [4.2, 6.4], [4.1, 7.0]]
        )
        assert bench.contention_reasons(**args) == []

    def test_small_idle_box_ramp_needs_absolute_floor(self):
        # 0.2 -> 0.5 between warm ends is 2.5x but +0.3 absolute: noise
        args = dict(self.QUIET, pass_loads=[[0.1, 0.2], [0.2, 0.2], [0.2, 0.5]])
        assert bench.contention_reasons(**args) == []

    def test_settled_loads_checked(self):
        args = dict(self.QUIET, settled1=2.5, settled5=2.1)
        assert set(bench.contention_reasons(**args)) == {
            "settled_load1",
            "settled_load5",
        }


class TestVarianceFlags:
    def test_variance_regression_flagged(self):
        # min 1.2 hides an intermittent 6.0 (spill / GC): ratio 5, spread
        # 4.8s -> flagged with its [min, max]
        flags = bench.variance_flags({"face": [1.2, 6.0, 1.3]})
        assert flags == {"face": [1.2, 6.0]}

    def test_small_absolute_spread_not_flagged(self):
        # 0.05 -> 0.2 is 4x but 0.15s of scheduler noise
        assert bench.variance_flags({"face": [0.05, 0.2]}) == {}

    def test_big_slow_face_within_band_not_flagged(self):
        assert bench.variance_flags({"face": [10.0, 12.0, 11.0]}) == {}

    def test_single_sample_never_flagged(self):
        assert bench.variance_flags({"face": [5.0]}) == {}


class TestProcTreeCpu:
    def test_returns_positive_on_linux(self):
        c = bench._proc_tree_cpu()
        assert c > 0  # this test process has burned SOME cpu by now

    def test_monotonic_and_counts_own_work(self):
        # the counter must grow by roughly the CPU a busy loop burns —
        # load-immunity matters only if self-work IS counted
        import time as _time

        c0 = bench._proc_tree_cpu()
        t0 = _time.process_time()
        x = 0
        while _time.process_time() - t0 < 0.3:
            x += 1
        c1 = bench._proc_tree_cpu()
        assert c1 >= c0 + 0.2


class TestDefaultSelfhealRef:
    def test_picks_newest_local_artifact_at_sf(self):
        import os
        import re

        ref = bench._default_selfheal_ref(0.1)
        base = os.path.basename(ref)
        # newest round's local artifact, final preferred within a round
        rounds = [
            int(re.search(r"BENCH_r(\d+)", f).group(1))
            for f in os.listdir(os.path.dirname(bench.__file__))
            if re.match(r"BENCH_r\d+_local", f)
        ]
        assert base.startswith(f"BENCH_r{max(rounds):02d}_local") or base.startswith(
            f"BENCH_r{max(rounds)}_local"
        )
        assert base.endswith(".json")

    def test_unknown_sf_returns_empty(self):
        assert bench._default_selfheal_ref(123.456) == ""

    def test_suffix_priority_final_beats_midround(self, tmp_path, monkeypatch):
        # r17 advice: plain lexicographic tie-break preferred
        # *_local_midround ('m' > 'f') — the explicit suffix rank must
        # pick final > plain > midround within a round, and median-era
        # artifacts (no 'stat') must be skipped entirely
        import json as _json
        import os

        art = {"sf": 0.1, "queries": {"q": 1.0}, "stat": "min_warm"}
        names = [
            "BENCH_r20_local_midround.json",
            "BENCH_r20_local.json",
            "BENCH_r20_local_final.json",
        ]
        for n in names:
            (tmp_path / n).write_text(_json.dumps(art))
        # a NEWER round whose artifact is median-era must lose to r20
        (tmp_path / "BENCH_r21_local.json").write_text(
            _json.dumps({"sf": 0.1, "queries": {"q": 0.5}})
        )
        monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
        got = os.path.basename(bench._default_selfheal_ref(0.1))
        assert got == "BENCH_r20_local_final.json"


class TestSelfhealCandidates:
    REF = {"a": 2.0, "b": 1.0, "c": 0.0}

    def test_outlier_selected(self):
        assert bench.selfheal_candidates({"a": 8.5, "b": 1.1}, self.REF) == ["a"]

    def test_zero_reference_ignored(self):
        # a 0.0 reference value must not divide/flag everything
        assert bench.selfheal_candidates({"c": 5.0}, self.REF) == []

    def test_unknown_face_ignored(self):
        assert bench.selfheal_candidates({"new_face": 99.0}, self.REF) == []
