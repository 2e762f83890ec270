"""The certification ledger's POLICY functions are pure — test them like
operators. The rotation rule ("changed-since-cert must sit inside the
gate; never-certified are exempt; stalest certifications fill free
slots") decides what the driver certifies each round, so a bug here is
an evidence bug, not a tooling nit."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
)

from registry_ledger import (  # noqa: E402
    plan_rotation,
    regate_offenders,
    regate_waiver,
)


def test_regate_waiver_requires_verified_overflow(tmp_path):
    """The overflow waiver (r19) fires only on machine-checked evidence:
    current-round waiver file, changed set > gate, gate fully packed with
    changed faces, every offender listed with its CURRENT fingerprint.
    Each condition failing alone must keep enforcement armed — the r18
    waiver fired on the mere existence of a design-log file."""
    import json

    order = ["a", "b", "c"]
    current = {"a": "FA", "b": "FB", "c": "FC"}
    changed = {"a", "b", "c"}          # 3 changed > gate of 2
    offenders = ["c"]                   # the overflow face
    rounds = [18]

    def write(payload):
        (tmp_path / "REGATE_WAIVER.json").write_text(json.dumps(payload))

    # no file -> armed
    fired, why = regate_waiver(
        rounds, offenders, changed, order, current, gate=2, root=str(tmp_path)
    )
    assert not fired and "no REGATE_WAIVER" in why
    # correct file -> fires
    write({"round": 19, "faces": {"c": "FC"}})
    fired, why = regate_waiver(
        rounds, offenders, changed, order, current, gate=2, root=str(tmp_path)
    )
    assert fired and "overflow waiver r19" in why
    # stale round -> armed
    write({"round": 18, "faces": {"c": "FC"}})
    assert not regate_waiver(
        rounds, offenders, changed, order, current, gate=2, root=str(tmp_path)
    )[0]
    # stale fingerprint (face edited after the waiver was written) -> armed
    write({"round": 19, "faces": {"c": "OLD"}})
    assert not regate_waiver(
        rounds, offenders, changed, order, current, gate=2, root=str(tmp_path)
    )[0]
    # changed set fits the gate -> front-load instead of waiving
    write({"round": 19, "faces": {"c": "FC"}})
    assert not regate_waiver(
        rounds, offenders, {"c"}, order, current, gate=2, root=str(tmp_path)
    )[0]
    # gate slot wasted on an unchanged face -> armed
    fired, why = regate_waiver(
        rounds, offenders, {"a", "c", "x"}, order, current, gate=2,
        root=str(tmp_path),
    )
    assert not fired and "not maximally packed" in why


def test_regate_offenders_policy():
    order = ["a", "b", "c", "d"]
    stored = {
        "a": {"fpr": "A", "round": 3},   # unchanged, in gate
        "b": {"fpr": "B", "round": 3},   # changed, in gate -> fine
        "c": {"fpr": "C", "round": 3},   # changed, OUTSIDE gate -> offender
        "d": {"fpr": "D", "round": 0},   # never certified -> exempt
    }
    current = {"a": "A", "b": "B2", "c": "C2", "d": "D2"}
    assert regate_offenders(order, stored, current, gate=2) == ["c"]
    # a missing snapshot is conservative: offender when outside the gate
    assert regate_offenders(order, {}, current, gate=2) == ["c", "d"]


def test_plan_rotation_orders_never_changed_stalest():
    order = ["w", "x", "y", "z"]
    hist = {
        "w": {5: "green", 8: "green"},   # certified r8, rich history
        "x": {6: "green"},               # stalest (r6)
        "y": {},                         # never certified
        "z": {8: "green"},               # certified r8, thin history
    }
    got = plan_rotation(order, hist, changed={"z"}, gate=3)
    # never first, changed second, stalest fill; 'w' (freshest+richest)
    # falls below the gate
    assert got == ["y", "z", "x", "w"]


def test_plan_rotation_is_a_permutation():
    order = [f"q{i}" for i in range(60)]
    hist = {n: ({7: "green"} if i % 2 else {6: "green"}) for i, n in enumerate(order)}
    got = plan_rotation(order, hist, changed=set(), gate=50)
    assert sorted(got) == sorted(order)
    # gate leads with the stale half (r6-latest), stable within
    assert all(hist[n] == {6: "green"} for n in got[:30])


def test_synth_generators_deterministic():
    """The consolidated probe generators (scripts/_synth.py, r10 verdict
    task 6) must stay deterministic in (n, seed) — identical data shapes
    across rounds are what make round-over-round probe numbers
    comparable. Pins a value fingerprint of each pandas generator."""
    import _synth as s

    docs = s.synth_documents(50, 7)
    assert list(docs.columns) == ["doc_id", "text"]
    assert docs.equals(s.synth_documents(50, 7))

    emb = s.synth_embeddings(20, 8, 3)
    assert emb.equals(s.synth_embeddings(20, 8, 3))
    assert len(emb.embedding.iloc[0]) == 8

    ev1 = s.synth_events_daily(100, 11)
    assert ev1.equals(s.synth_events_daily(100, 11))
    assert list(ev1.columns) == ["event_id", "ts", "user_id",
                                 "event_type", "value"]

    ev2 = s.synth_events_stream(100, 9, 11)
    assert ev2.equals(s.synth_events_stream(100, 9, 11))
    assert ev2.ts.is_monotonic_increasing  # the stream-replay contract

    ed = s.synth_edges(200, 4, 5)
    assert ed.equals(s.synth_edges(200, 4, 5))
    assert (ed.id_a < ed.id_b).all()  # canonical order, no self-loops


def test_plan_two_rounds_projection():
    """The two-round schedule (r12): the first gate follows plan_rotation;
    the second assumes the first certifies green — so first-gate members
    (freshest certs in the simulated history) must not reappear, and the
    round-after gate drains the next-stalest bucket."""
    from registry_ledger import plan_two_rounds

    order = [f"q{i}" for i in range(8)]
    hist = {
        "q0": {},                 # never certified -> leads gate 1
        "q1": {3: "green"},
        "q2": {3: "green"},
        "q3": {4: "green"},
        "q4": {4: "green"},
        "q5": {5: "green"},
        "q6": {5: "green"},
        "q7": {5: "green"},
    }
    nxt, first, second, hist2 = plan_two_rounds(order, hist, {"q5"}, gate=3)
    assert nxt == 6
    assert first[:3] == ["q0", "q5", "q1"]  # never, changed, stalest
    # simulated: gate-1 members now r6-latest
    assert all(hist2[n].get(6) == "green" for n in first[:3])
    # gate 2 drains the remaining r3/r4 bucket, not the just-certified
    assert second[:3] == ["q2", "q3", "q4"]
    assert not set(second[:3]) & set(first[:3])


def test_gate_buckets_summary():
    from registry_ledger import gate_buckets

    hist = {
        "a": {},
        "b": {8: "green"},
        "c": {8: "green", 9: "red"},   # latest GREEN is what buckets
        "d": {9: "green"},
    }
    assert gate_buckets(["a", "b", "c", "d"], hist) == (
        "1 never-certified + 2 r08-latest + 1 r09-latest"
    )


def test_module_closure_reaches_transitive_deps():
    """Algo-3 groundwork (r12): the transitive closure must chase both
    absolute and RELATIVE package imports to fixpoint — the gap it
    closes is sources/bucketed.py being reachable from the bucketed
    faces only through plans/pedmatch_bucketed.py's `from ..sources`
    import, which algo 2's face-direct resolution never sees."""
    import os

    from registry_ledger import ROOT, _module_closure

    pkg = os.path.join(ROOT, "childhoodcancerdatainitiative_cbioportal_workflows_spark")
    start = {os.path.join(pkg, "plans", "pedmatch_bucketed.py")}
    closure = _module_closure(start)
    rel = {os.path.relpath(f, pkg) for f in closure}
    assert os.path.join("sources", "bucketed.py") in rel          # relative import
    assert os.path.join("plans", "pedmatch.py") in rel            # sibling module
    # fixpoint goes deeper than one hop: pedmatch.py's own deps appear
    assert any(f.startswith("functions") for f in rel), sorted(rel)
    # and the closure is a superset of the seed
    assert start <= closure


def test_fingerprints_stay_direct_reference():
    """Fingerprints deliberately stay algo 2 (direct references only):
    closure-sized fingerprints (~40 modules per face through
    registry/_common.py) would turn any core edit into an unsatisfiable
    163-face mandatory regate. The transitive gap is covered by the
    module-hash advisory instead — if this bumps, the stored snapshots
    must be migrated on a certified tree (--migrate-fpr-algo)."""
    from registry_ledger import FPR_ALGO

    assert FPR_ALGO == 2
