#!/usr/bin/env python3
"""Regenerate REGISTRY.md — the certification ledger — and ENFORCE the
rotation policy (r7 verdict task 2): a query whose implementation changed
since its last driver certification MUST sit inside the next gate.

The driver's CORRECTNESS gate samples only the FIRST 50 entries of the
insertion-ordered ``_REGISTRY``, so which queries hold a green driver row
is a function of each round's front-loading. This script makes that
history explicit AND mechanical:

* for every registered query it reports the rounds whose
  CORRECTNESS_r{N}.json certified it green, its latest driver status and
  its gate position (REGISTRY.md);
* it maintains REGISTRY_FPR.json — a per-query content fingerprint
  (face source + oracle SQL + every package module the face references,
  resolved through the function's globals and its in-body imports)
  snapshotted at the query's most recent certification;
* a query whose CURRENT fingerprint differs from its certified snapshot
  is "changed"; if any changed query is NOT in the first-50 gate the
  script prints the offenders and exits 1 — the rotation rule is a
  failing check, not a habit.

Run from the repo root at ROUND START, right after a new CORRECTNESS
artifact lands and BEFORE editing code (greens refresh their snapshot to
the current tree, which at that moment is the certified tree), and again
at round close after any registry reorder:

    python3 scripts/registry_ledger.py
"""

from __future__ import annotations

import glob
import hashlib
import inspect
import json
import os
import re
import subprocess
import sys
import types

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGE = "childhoodcancerdatainitiative_cbioportal_workflows_spark"
GATE = 50
FPR_STORE = os.path.join(ROOT, "REGISTRY_FPR.json")


def load_history() -> dict[str, dict[int, str]]:
    """query -> {round: 'green'|'red'|'err'} from every CORRECTNESS_r*.json."""
    hist: dict[str, dict[int, str]] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        for name, row in json.load(open(path)).items():
            if row.get("err"):
                status = "err"
            elif row.get("rows_match") and row.get("schema_match") and row.get(
                "hash_match"
            ):
                status = "green"
            else:
                status = "red"
            hist.setdefault(name, {})[rnd] = status
    return hist


# Bump when the fingerprint resolution below changes shape. Fingerprints
# stay DIRECT-reference only (algo 2): a transitive-closure fingerprint
# was built and rejected in r12 — typical closures span ~40 modules
# (registry/_common.py pulls in most of the package), so any core edit
# would flip all 163 faces into an unsatisfiable 50-slot mandatory
# regate. The transitive blind spot algo 2 leaves (an edit to e.g.
# sources/bucketed.py, reached only via plans/pedmatch_bucketed.py,
# flips no consumer) is covered instead by the ADVISORY in main(): a
# module-hash snapshot taken at round start flags every face whose
# _module_closure touches a since-edited module, and the ≤3-round full
# rotation bounds how long such a face can go without re-certification.
FPR_ALGO = 2


def _module_closure(
    files: set[str], graph: dict[str, set[str]] | None = None
) -> set[str]:
    """Transitive expansion of a referenced-module set: parse each module
    for package-internal imports (absolute AND relative) and chase to
    fixpoint. File-level granularity. Used by the transitive-impact
    advisory in main() — NOT by the fingerprint (see the FPR_ALGO note).
    ``graph`` memoizes file -> imported-files across calls."""
    import ast

    def _to_file(dotted: str) -> str | None:
        base = os.path.join(ROOT, dotted.replace(".", os.sep))
        for cand in (base + ".py", os.path.join(base, "__init__.py")):
            if os.path.exists(cand):
                return cand
        return None

    def _module_name(path: str) -> str:
        rel = os.path.relpath(path, ROOT)
        parts = rel[:-3].split(os.sep)  # strip .py
        if parts[-1] == "__init__":
            parts = parts[:-1]
        return ".".join(parts)

    def _imports_of(f: str) -> set[str]:
        if graph is not None and f in graph:
            return graph[f]
        out: set[str] = set()
        try:
            tree = ast.parse(open(f).read())
        except (OSError, SyntaxError):
            tree = None
        if tree is not None:
            mod_parts = _module_name(f).split(".")
            is_pkg = os.path.basename(f) == "__init__.py"
            targets: list[str] = []
            for node in ast.walk(tree):
                if isinstance(node, ast.Import):
                    targets += [a.name for a in node.names]
                elif isinstance(node, ast.ImportFrom):
                    if node.level == 0:
                        base = node.module or ""
                    else:
                        # relative: level 1 = this module's package
                        keep = (
                            len(mod_parts)
                            - (0 if is_pkg else 1)
                            - (node.level - 1)
                        )
                        if keep < 1:
                            continue
                        prefix = ".".join(mod_parts[:keep])
                        base = (
                            f"{prefix}.{node.module}" if node.module else prefix
                        )
                    if base:
                        targets.append(base)
                        # `from pkg import name` where name is a submodule
                        targets += [f"{base}.{a.name}" for a in node.names]
            for t in targets:
                if t.startswith(PACKAGE):
                    path = _to_file(t)
                    if path:
                        out.add(path)
        if graph is not None:
            graph[f] = out
        return out

    seen = set(files)
    frontier = [f for f in files if PACKAGE in f]
    while frontier:
        f = frontier.pop()
        for path in _imports_of(f):
            if path not in seen:
                seen.add(path)
                frontier.append(path)
    return seen


def _module_file(obj) -> str | None:
    mod = obj if isinstance(obj, types.ModuleType) else None
    if mod is None and (callable(obj) or inspect.isclass(obj)):
        mod = inspect.getmodule(obj)
    if mod is not None and getattr(mod, "__name__", "").startswith(PACKAGE):
        f = getattr(mod, "__file__", None)
        if f and os.path.exists(f):
            return f
    return None


def face_files(fn) -> set[str]:
    """The package modules a face DIRECTLY references: resolved through
    ``fn.__globals__`` (catches top-level imports like the relational
    helpers), in-body ``from package.x import`` statements (the registry
    faces' local import convention), and — algo 2 — each imported NAME
    chased to its DEFINING module, so a face importing
    ``hierarchy_rollup`` through the ``operators`` package re-export
    tracks ``operators/hierarchy.py``, not just
    ``operators/__init__.py``."""
    src = inspect.getsource(fn)
    files: set[str] = set()
    for name in fn.__code__.co_names:
        f = _module_file(fn.__globals__.get(name))
        if f:
            files.add(f)
    # In-body imports: hash the imported module file AND chase each
    # imported name to its defining module (re-export transparency).
    import ast
    import importlib

    try:
        tree = ast.parse(src)
    except SyntaxError:
        tree = None
    if tree is not None:
        for node in ast.walk(tree):
            if not isinstance(node, ast.ImportFrom) or node.level:
                continue
            if not (node.module or "").startswith(PACKAGE):
                continue
            path = os.path.join(ROOT, node.module.replace(".", os.sep) + ".py")
            pkg_init = os.path.join(
                ROOT, node.module.replace(".", os.sep), "__init__.py"
            )
            if os.path.exists(path):
                files.add(path)
            elif os.path.exists(pkg_init):
                files.add(pkg_init)
            try:
                mod = importlib.import_module(node.module)
            except Exception:
                continue
            for alias in node.names:
                f = _module_file(getattr(mod, alias.name, None))
                if f:
                    files.add(f)
    else:  # unparsable source: fall back to the algo-1 regex
        for m in re.findall(rf"from ({PACKAGE}[.\w]*) import", src):
            path = os.path.join(ROOT, m.replace(".", os.sep) + ".py")
            if os.path.exists(path):
                files.add(path)
    if FPR_ALGO >= 3:
        files = _module_closure(files)
    return files


def face_fingerprint(fn, sql: str | None) -> str:
    """Content hash of everything that determines a face's observable
    result: the face function's source, its (generated) oracle SQL
    VALUE, and the full text of every package module the face directly
    references (``face_files``). Coarse on purpose: an edit anywhere in
    a referenced operator module flips every face that uses it.
    DELIBERATELY NOT transitive (see the FPR_ALGO note): transitive
    edits are covered by the module-hash advisory in main() plus the
    ≤3-round full rotation, because closure-sized fingerprints (~40
    modules per face through registry/_common.py) would make any core
    edit flip all 163 faces — an unsatisfiable 50-slot mandatory
    regate."""
    h = hashlib.sha256()
    h.update(inspect.getsource(fn).encode())
    h.update((sql or "").encode())
    for f in sorted(face_files(fn)):
        with open(f, "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()


REGATE_WAIVER_FILE = "REGATE_WAIVER.json"


def regate_waiver(
    rounds_seen: list[int],
    offenders: list[str],
    changed: set[str],
    order: list[str],
    current: dict[str, str],
    gate: int = GATE,
    root: str | None = None,
) -> tuple[bool, str]:
    """Machine-verified overflow waiver for the 50-slot regate mandate.

    The r18 waiver's premise was FALSE (it claimed the driver re-certifies
    the full registry in optimization rounds; CORRECTNESS_r18 holds exactly
    the first-50 sample) and it fired on the mere existence of the round's
    OPTIMIZATION_r<NN>.md (r18 ADVICE: committing next round's design log at
    round start would disarm enforcement for the whole round). This
    replacement waives NOTHING on assertion — every condition is checked
    against the tree:

    1. ``REGATE_WAIVER.json`` exists and its ``round`` is the current
       not-yet-certified round (stale waivers don't carry forward);
    2. the changed-since-cert set STRICTLY exceeds the gate — front-loading
       every changed face is arithmetically impossible, the only situation
       that can excuse anything;
    3. the gate is maximally packed: all ``gate`` leading registry slots
       hold changed faces, so nothing is waived that could have been gated;
    4. every offender is listed in the file WITH its current fingerprint —
       an edit made after the waiver was written invalidates it.

    Returns (fired, reason). The waived faces still carry no driver row for
    the round; their certification evidence is the full-registry value-exact
    oracle-parity suite, and they lead the next rotation's mandatory slots.
    """
    nxt = (max(rounds_seen) + 1) if rounds_seen else 1
    path = os.path.join(root or ROOT, REGATE_WAIVER_FILE)
    if not os.path.exists(path):
        return False, f"no {REGATE_WAIVER_FILE}"
    try:
        waiver = json.load(open(path))
    except Exception as e:  # unreadable waiver excuses nothing
        return False, f"unreadable {REGATE_WAIVER_FILE}: {e}"
    if waiver.get("round") != nxt:
        return False, (
            f"waiver round {waiver.get('round')} != current uncertified "
            f"round {nxt}"
        )
    if len(changed) <= gate:
        return False, (
            f"changed-since-cert count {len(changed)} fits the {gate}-slot "
            "gate — front-load instead of waiving"
        )
    not_changed_in_gate = [n for n in order[:gate] if n not in changed]
    if not_changed_in_gate:
        return False, (
            "gate not maximally packed — these gate slots hold unchanged "
            f"faces while changed faces overflow: {not_changed_in_gate}"
        )
    listed: dict[str, str] = waiver.get("faces", {})
    for name in offenders:
        if listed.get(name) != current.get(name):
            return False, (
                f"offender '{name}' missing from the waiver or listed with "
                "a stale fingerprint — regenerate REGATE_WAIVER.json on the "
                "final tree"
            )
    return True, (
        f"overflow waiver r{nxt}: {len(changed)} changed faces exceed the "
        f"{gate}-slot gate; the gate is fully packed with changed faces and "
        f"all {len(offenders)} overflow offenders are listed with current "
        "fingerprints"
    )


def regate_offenders(
    order: list[str],
    stored: dict[str, dict],
    current: dict[str, str],
    gate: int = GATE,
) -> list[str]:
    """Pure policy check: queries whose current fingerprint differs from
    the certified snapshot (or that have no snapshot at all) and that
    are NOT inside the gate. These must be front-loaded before the next
    driver run.

    Exemption: a stored snapshot with ``round == 0`` is PRE-certification
    state — the face has never held a green driver row, so there is no
    certified behavior for an edit to invalidate; it simply remains in
    the never-certified pool that leads the next rotation's free slots
    (main() refreshes such snapshots to the current tree on each regen).
    A MISSING snapshot stays an offender: unknown provenance is treated
    conservatively."""
    offenders = []
    for i, name in enumerate(order):
        snap = stored.get(name)
        if snap is not None and snap.get("round", 0) == 0:
            continue
        changed = snap is None or snap.get("fpr") != current[name]
        if changed and i >= gate:
            offenders.append(name)
    return offenders


def plan_rotation(
    order: list[str],
    hist: dict[str, dict[int, str]],
    changed: set[str],
    gate: int = GATE,
) -> list[str]:
    """Compute the NEXT round's recommended registry order under the
    rotation policy: never-certified faces first (nothing to
    invalidate), then changed-since-cert (re-gate is mandatory), then
    stalest certifications (oldest latest-green round first, thinnest
    green history as tie-break), until the gate is full; below the
    gate, remaining faces sorted stalest-first so the round after is
    equally mechanical. Advisory: prints what a human previously
    hand-computed; the enforcement check stays regate_offenders."""
    greens = {
        n: sorted(r for r, s in hist.get(n, {}).items() if s == "green")
        for n in order
    }
    never = [n for n in order if not greens[n]]
    must = [n for n in order if n in changed and greens[n]]
    rest = [n for n in order if n not in never and n not in must]
    staleness = lambda n: (  # noqa: E731
        greens[n][-1], len(greens[n]), order.index(n)
    )
    rest_sorted = sorted(rest, key=staleness)
    head = never + must
    fill = rest_sorted[: max(0, gate - len(head))]
    tail = [n for n in rest_sorted if n not in fill]
    return head + fill + tail


def plan_two_rounds(
    order: list[str],
    hist: dict[str, dict[int, str]],
    changed: set[str],
    gate: int = GATE,
) -> tuple[int, list[str], list[str], dict[str, dict[int, str]]]:
    """Project the next TWO gates (r12 verdict task 4): the policy order
    for the coming round, then — assuming that whole gate certifies
    green — the round after. A stale bucket larger than one gate (38
    r09-latest faces vs 50 slots in r12) cannot be rotated in a single
    round, so the two-round schedule is what makes the 'no certification
    older than three rounds' invariant PROVABLE instead of hoped-for.
    Returns (next_round_number, next_order, following_order,
    simulated_history)."""
    nxt = max((r for h in hist.values() for r in h), default=0) + 1
    first = plan_rotation(order, hist, changed, gate)
    hist2 = {n: dict(hist.get(n, {})) for n in order}
    for n in first[:gate]:
        hist2[n][nxt] = "green"
    second = plan_rotation(first, hist2, set(), gate)
    return nxt, first, second, hist2


def gate_buckets(names: list[str], hist: dict[str, dict[int, str]]) -> str:
    """Summarize a gate as certification-staleness buckets, e.g.
    '2 never-certified + 25 r08-latest + 20 r09-latest + 3 r11-latest'."""
    from collections import Counter

    c: Counter[int] = Counter()
    for n in names:
        greens = [r for r, s in hist.get(n, {}).items() if s == "green"]
        c[max(greens) if greens else 0] += 1
    return " + ".join(
        f"{c[r]} never-certified" if r == 0 else f"{c[r]} r{r:02d}-latest"
        for r in sorted(c)
    )


def _rotation_schedule_paragraph(
    order: list[str],
    hist: dict[str, dict[int, str]],
    changed: set[str],
) -> str:
    """The computed two-round rotation schedule for the ledger header —
    mechanical, so the paragraph can never go stale the way the
    hand-written r11 one did (it predated the r11 cert and named the
    wrong leaders)."""
    nxt, first, second, hist2 = plan_two_rounds(order, hist, changed)
    g1, g2 = first[:GATE], second[:GATE]
    changed_txt = (
        " (changed-since-cert: " + ", ".join(f"`{n}`" for n in sorted(changed)) + ")"
        if changed
        else ""
    )
    oldest2 = min(
        (max((r for r, s in hist2.get(n, {}).items() if s == "green"), default=0)
         for n in order if n not in g2),
        default=0,
    )
    return (
        "Planned rotation schedule (computed by `plan_two_rounds` — keep no "
        f"certification older than three rounds): the r{nxt} gate is "
        f"{gate_buckets(g1, hist)}{changed_txt}; assuming it certifies "
        f"green, the r{nxt + 1} gate is {gate_buckets(g2, hist2)} "
        f"(`{g2[0]}` … `{g2[-1]}`), after which no certification is older "
        f"than r{oldest2:02d}. `--plan-rotation` prints both orders."
    )


def main() -> int:
    sys.path.insert(0, ROOT)
    import __spark_entry__ as entry

    from childhoodcancerdatainitiative_cbioportal_workflows_spark.registry import (
        _REGISTRY,
    )

    order = list(entry.queries())
    oracles = entry.oracle_sql()
    hist = load_history()
    rounds_seen = sorted({r for h in hist.values() for r in h})

    current = {
        name: face_fingerprint(fn, sql) for name, (fn, sql) in _REGISTRY.items()
    }
    stored: dict[str, dict] = {}
    if os.path.exists(FPR_STORE):
        stored = json.load(open(FPR_STORE))
    mods_entry = stored.pop("__modules__", None)
    algo = stored.pop("__fpr_algo__", 1)
    if algo != FPR_ALGO:
        # One-time migration: the fingerprint ALGORITHM changed, not the
        # code — re-snapshot every face against the current tree,
        # preserving its certification round. Re-snapshotting absorbs any
        # genuine face edit made since certification (it would never be
        # flagged changed-since-cert), so it is gated behind an explicit
        # flag AND a clean working tree — run it at round start on the
        # certified tree only.
        if "--migrate-fpr-algo" not in sys.argv:
            print(
                f"fingerprint algo changed ({algo} -> {FPR_ALGO}) but "
                "migration re-snapshots EVERY stored fingerprint, "
                "absorbing any uncertified edits; rerun with "
                "--migrate-fpr-algo on the certified tree",
                file=sys.stderr,
            )
            return 1
        proc = subprocess.run(
            ["git", "-C", ROOT, "status", "--porcelain"],
            capture_output=True,
            text=True,
        )
        if proc.returncode != 0:
            # an empty stdout from a FAILED git call is not a clean tree
            print(
                "refusing --migrate-fpr-algo: cannot establish working-"
                f"tree cleanliness (git exited {proc.returncode}: "
                f"{proc.stderr.strip()})",
                file=sys.stderr,
            )
            return 1
        dirty = proc.stdout.strip()
        if dirty:
            print(
                "refusing --migrate-fpr-algo on a dirty working tree "
                "(the snapshot must be the certified tree):\n" + dirty,
                file=sys.stderr,
            )
            return 1
        print(
            f"fingerprint algo {algo} -> {FPR_ALGO}: re-snapshotting all "
            "faces against the current (clean) tree"
        )
        for name, snap in stored.items():
            if name in current:
                snap["fpr"] = current[name]
    for name in order:
        greens = [r for r, s in hist.get(name, {}).items() if s == "green"]
        latest_green = max(greens) if greens else 0
        if name not in stored:
            # first sighting: snapshot the current tree (for a brand-new
            # face this is pre-certification state; it re-snapshots at
            # its first green)
            stored[name] = {"fpr": current[name], "round": latest_green}
        elif latest_green > stored[name].get("round", 0):
            # newly certified since the last snapshot: the tree at regen
            # time is the certified tree (run this at round start!)
            stored[name] = {"fpr": current[name], "round": latest_green}
        elif stored[name].get("round", 0) == 0:
            # still never certified: the snapshot is pre-certification
            # state with nothing to invalidate — track the current tree
            stored[name] = {"fpr": current[name], "round": 0}
    stored = {n: stored[n] for n in order}  # drop unregistered leftovers

    # ---- transitive-impact advisory (the gap direct fingerprints leave,
    # found in r12: an edit to sources/bucketed.py flips no face because
    # every consumer reaches it through plans/*_bucketed.py). A module-
    # hash baseline is (re)taken on the same certified-tree assumption as
    # the face snapshots (first run after a new CORRECTNESS round); any
    # later run reports faces whose import CLOSURE touches a since-edited
    # module but whose own fingerprint did not flip. Advisory, not fatal:
    # closure-sized mandatory regates would overflow the gate (see the
    # FPR_ALGO note); the ≤3-round rotation bounds the exposure.
    latest_round = max(rounds_seen) if rounds_seen else 0
    cur_mods = {
        os.path.relpath(p, ROOT): hashlib.sha256(open(p, "rb").read()).hexdigest()
        for p in glob.glob(
            os.path.join(ROOT, PACKAGE, "**", "*.py"), recursive=True
        )
    }
    if mods_entry is None or latest_round > mods_entry.get("round", 0):
        mods_entry = {"round": latest_round, "hashes": cur_mods}
    baseline = mods_entry["hashes"]
    changed_mods = {
        r for r in set(cur_mods) | set(baseline)
        if cur_mods.get(r) != baseline.get(r)
    }

    with open(FPR_STORE, "w") as f:
        json.dump(
            {"__fpr_algo__": FPR_ALGO, "__modules__": mods_entry, **stored},
            f,
            indent=1,
        )

    changed = {
        n for n in order
        if stored[n]["fpr"] != current[n]
    }

    transitive_hits: list[tuple[str, bool]] = []  # (name, in_gate)
    if changed_mods:
        changed_paths = {os.path.join(ROOT, r) for r in changed_mods}
        igraph: dict[str, set[str]] = {}
        for i, name in enumerate(order):
            fn, _sql = _REGISTRY[name]
            if name in changed:
                continue  # already mandatory via its own fingerprint
            if _module_closure(face_files(fn), igraph) & changed_paths:
                transitive_hits.append((name, i < GATE))
    out_of_gate_transitive = [n for n, in_gate in transitive_hits if not in_gate]
    if out_of_gate_transitive:
        print(
            f"transitive-impact advisory: {len(out_of_gate_transitive)} "
            "face(s) outside the gate import a since-edited module "
            "through their closure (fingerprint unchanged): "
            + ", ".join(out_of_gate_transitive[:10])
            + (" …" if len(out_of_gate_transitive) > 10 else "")
            + f" — changed module(s): {', '.join(sorted(changed_mods))}",
            file=sys.stderr,
        )
    # Watch-list (r11 verdict task 6, now structural): embedding_dup_pairs
    # is the O(n^2) cross-join exact-dup BASELINE — certified on its own
    # face so the LSH path's recall stays measurable, but it must never be
    # composed into any other face, where corpus scale would make the
    # cross join the plan. The LSH-bucketed variant is the composable one.
    # Detection is structural, not textual (r12 advice): a face merely
    # MENTIONING the baseline in a docstring/comment must not fail the
    # ledger. co_names carries both a direct call (LOAD_GLOBAL) and an
    # in-body `from ..llm.dedup import embedding_dup_pairs`
    # (IMPORT_FROM), while 'embedding_dup_pairs_lsh' is a distinct name.
    # Recurse over nested code objects (r13 advice): a call inside a
    # nested def/lambda/comprehension lands in a *nested* code object's
    # co_names, which the top-level check would miss.
    def _all_co_names(code) -> set[str]:
        names = set(code.co_names)
        for const in code.co_consts:
            if isinstance(const, types.CodeType):
                names |= _all_co_names(const)
        return names

    crossjoin_baseline_faces = {"embedding_dups_exact"}
    for name, (fn, _sql) in _REGISTRY.items():
        if name in crossjoin_baseline_faces:
            continue
        if "embedding_dup_pairs" in _all_co_names(fn.__code__):
            print(
                f"watch-list violation: face '{name}' calls the O(n^2) "
                "embedding_dup_pairs baseline; compose "
                "embedding_dup_pairs_lsh instead (r11 verdict task 6)",
                file=sys.stderr,
            )
            return 1

    if "--plan-rotation" in sys.argv:
        nxt, proposal, following, hist2 = plan_two_rounds(order, hist, changed)
        print(f"# proposed r{nxt} order (first {GATE} = gate: "
              f"{gate_buckets(proposal[:GATE], hist)}):")
        for i, n in enumerate(proposal):
            if i == GATE:
                print("# --- gate boundary ---")
            print(f'    "{n}",')
        print(f"# projected r{nxt + 1} gate, assuming the r{nxt} gate "
              f"certifies green ({gate_buckets(following[:GATE], hist2)}):")
        for n in following[:GATE]:
            print(f'    "{n}",')
        return 0
    offenders = regate_offenders(order, stored, current)

    lines = [
        "# REGISTRY — driver-certification ledger",
        "",
        "Generated by `scripts/registry_ledger.py` — do not edit by hand.",
        "",
        f"Registered queries: **{len(order)}** ({len(oracles)} with a DuckDB "
        "oracle). The driver's CORRECTNESS gate samples the first "
        f"**{GATE}** entries of the insertion-ordered registry each round. "
        "Rotation policy (ENFORCED — this script exits 1 on violation): "
        "a query whose implementation changed since its last driver "
        "certification must sit inside the gate; never-certified queries "
        "have no certification to invalidate and lead the NEXT rotation's "
        "free slots; remaining slots go to the oldest certifications "
        "first. Changed-ness is a content fingerprint (REGISTRY_FPR.json) "
        "over the face source, its oracle SQL, and every package module "
        "the face references, snapshotted at certification time. All "
        "queries are additionally value-exact green locally every round "
        "via tests/test_oracle_parity.py.",
        "",
        f"Driver rounds recorded: {', '.join(f'r{r:02d}' for r in rounds_seen)}.",
        "",
        _rotation_schedule_paragraph(order, hist, changed),
        "",
        (
            "Transitive-impact advisory (module-hash baseline r"
            f"{mods_entry['round']:02d}): "
            + (
                "no package module edited since the baseline."
                if not changed_mods
                else (
                    f"{len(changed_mods)} module(s) edited — "
                    f"{sum(1 for _, g in transitive_hits if g)} affected "
                    "face(s) already inside the gate, "
                    f"{len(out_of_gate_transitive)} outside it"
                    + (
                        f" ({', '.join(out_of_gate_transitive[:12])}"
                        + (" …" if len(out_of_gate_transitive) > 12 else "")
                        + ")"
                        if out_of_gate_transitive
                        else ""
                    )
                    + " — fingerprint-unchanged faces reaching an edited "
                    "module only transitively; re-certified by rotation "
                    "within three rounds."
                )
            )
        ),
        "",
        "| # | query | green in rounds | latest driver status | changed since cert | in r-next gate |",
        "|---|---|---|---|---|---|",
    ]
    never = []
    for i, name in enumerate(order):
        h = hist.get(name, {})
        greens = [r for r, s in sorted(h.items()) if s == "green"]
        latest = max(h) if h else None
        latest_s = f"r{latest:02d}: {h[latest]}" if latest else "never sampled"
        in_gate = "yes" if i < GATE else ""
        gtxt = ", ".join(f"r{r:02d}" for r in greens) or "—"
        ctxt = "CHANGED" if name in changed else ""
        if not greens:
            never.append(name)
        lines.append(
            f"| {i} | `{name}` | {gtxt} | {latest_s} | {ctxt} | {in_gate} |"
        )
    lines += [
        "",
        f"Queries with no green driver row yet: **{len(never)}**"
        + (f" — {', '.join('`%s`' % n for n in never)}" if never else ""),
        "",
        f"Queries changed since their certification snapshot: **{len(changed)}**"
        + (
            f" — {', '.join('`%s`' % n for n in sorted(changed))}"
            if changed
            else ""
        ),
        "",
    ]
    out = os.path.join(ROOT, "REGISTRY.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(
        f"wrote {out}: {len(order)} queries, {len(never)} never-certified, "
        f"{len(changed)} changed-since-cert"
    )
    if offenders:
        fired, reason = regate_waiver(
            rounds_seen, offenders, changed, order, current
        )
        if fired:
            print(
                f"regate waived ({reason}); waived faces carry NO driver row "
                "this round — their evidence is the full-registry "
                "value-exact oracle-parity suite, and they lead the next "
                "rotation: " + ", ".join(offenders),
                file=sys.stderr,
            )
        else:
            print(
                "REGATE VIOLATION: changed since certification but NOT in the "
                f"first-{GATE} gate ({reason}): {', '.join(offenders)}",
                file=sys.stderr,
            )
            return 1
    # README drift guard (r8 verdict task 2): the hand-written counts in
    # README.md must track the registry; a mismatch is a failing check so
    # the numbers can't silently age again.
    readme = open(os.path.join(ROOT, "README.md")).read()
    m = re.search(r"\((\d+) queries, ALL (\d+) DuckDB-oracle-checked", readme)
    if not m or int(m.group(1)) != len(order) or int(m.group(2)) != len(order):
        print(
            f"README DRIFT: README.md query count {m.groups() if m else None} "
            f"!= registry {len(order)} — update README.md",
            file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
