"""Bench regression gate — compare two bench JSON files per query.

Usage:
    python tools/bench_gate.py NEW.json [OLD.json] [--ratio 1.5]
                               [--floor 0.15]

OLD defaults to the highest-numbered BENCH_r*.json in the repo root other
than NEW (the prior round). Exit 1 if any query regressed by more than
``--ratio`` AND by more than ``--floor`` seconds absolute (sub-0.15 s
deltas on a 32-thread local JVM are scheduling noise, not plans), or if a
query that passed before now fails (-1). A query that was ALREADY failing
in OLD is reported as a persistent failure, not a regression; one that
was failing and now passes gets a "fixed" note.

Accepts both the raw bench.py stdout line and the driver's wrapped
BENCH_r{N}.json ({"parsed": {...}}). Cold-pass columns are reported but
never gate: first-build artifact cost is environment-noisy (GC, JIT) and
tracked as data, not an alarm.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys


def _reconstruct_tail(tail: str) -> dict | None:
    """Best-effort parse of a driver 'tail' whose leading bytes were cut.

    The driver persists only the last N chars of bench stdout; when the
    final JSON line outgrew that, the leading ``{`` fell off (the r7
    artifact). The cut lands inside a dict of "name": sec pairs, so we
    re-open the object at the next complete key boundary and let the
    original closing braces close it. Returns None when nothing parses.
    """
    last = tail.strip().rsplit("\n", 1)[-1]
    try:
        doc = json.loads(last)
        return doc if isinstance(doc, dict) else None
    except ValueError:
        pass
    for m in list(re.finditer(r'"[A-Za-z0-9_]+"\s*:', last))[:8]:
        try:
            doc = json.loads('{"queries": {' + last[m.start():])
        except ValueError:
            continue
        if not isinstance(doc, dict) or not isinstance(
                doc.get("queries"), dict):
            continue
        # Field order in the bench line is queries, sf, cold_queries,
        # cold_total_sec: "sf" surviving means the cut was inside the
        # warm dict; its absence means we actually re-opened inside
        # cold_queries — relabel so the gate doesn't compare cold rows
        # as warm ones.
        if "sf" not in doc and "cold_total_sec" in doc:
            doc["cold_queries"] = {**doc.pop("queries"),
                                   **doc.get("cold_queries", {})}
            doc["queries"] = {}
        return doc
    return None


def load(path: str) -> dict:
    """Read a bench artifact: the raw bench.py stdout line, the driver's
    wrapped {"parsed": {...}} form, a wrapped form whose "parsed" is null
    (truncated tail — reconstructed when possible), or garbage (returned
    as an explicitly-marked empty doc, never an exception)."""
    with open(path) as f:
        doc = json.load(f)
    parsed = doc.get("parsed")
    if isinstance(parsed, dict):
        return parsed
    if "queries" in doc:
        return doc
    tail = doc.get("tail")
    if isinstance(tail, str) and tail:
        rec = _reconstruct_tail(tail)
        if rec is not None and (rec.get("queries")
                                or rec.get("cold_queries")):
            rec["_reconstructed"] = True
            return rec
    return {"queries": {}, "_unparseable": True}


def default_old(new_path: str) -> str | None:
    # Prior rounds live in the repo root regardless of where NEW was
    # written (the Makefile target writes NEW to /tmp).
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cands = sorted(
        p for p in glob.glob(os.path.join(root, "BENCH_r*.json"))
        if os.path.abspath(p) != os.path.abspath(new_path)
    )
    return cands[-1] if cands else None


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(
        prog="bench_gate.py",
        description="Per-query bench regression gate.")
    ap.add_argument("new", help="new bench JSON (bench.py stdout line or "
                                "driver-wrapped BENCH_r{N}.json)")
    ap.add_argument("old", nargs="?", default=None,
                    help="prior bench JSON (default: highest BENCH_r*.json "
                         "in the repo root other than NEW)")
    ap.add_argument("--ratio", type=float, default=1.5,
                    help="regression ratio threshold (default 1.5)")
    ap.add_argument("--floor", type=float, default=0.15,
                    help="absolute-seconds noise floor (default 0.15)")
    try:
        ns = ap.parse_args(argv)
    except SystemExit as e:  # keep in-process callers (tests) exception-free
        return e.code if isinstance(e.code, int) else 2
    ratio, floor = ns.ratio, ns.floor
    new_path = ns.new
    old_path = ns.old if ns.old is not None else default_old(new_path)
    if old_path is None:
        print(f"bench_gate: no prior BENCH_r*.json next to {new_path}; "
              "nothing to compare — PASS (first round)")
        return 0

    new, old = load(new_path), load(old_path)
    if new.get("_unparseable"):
        print(f"bench_gate: {new_path} is unparseable (no JSON line, no "
              "reconstructable tail) — FAIL: the new artifact is broken")
        return 1
    if old.get("_unparseable"):
        print(f"bench_gate: prior artifact {old_path} is unparseable — "
              "nothing to compare, PASS")
        return 0
    nq, oq = new.get("queries", {}), old.get("queries", {})

    regressions, notes = [], []
    for name, old_t in sorted(oq.items()):
        if name not in nq:
            notes.append(f"  dropped: {name} (was {old_t:.3f}s)")
            continue
        new_t = nq[name]
        if new_t < 0:
            if old_t < 0:
                notes.append(f"  still failing: {name} (failed in OLD too)")
            else:
                regressions.append(
                    f"  FAIL {name}: now errors (was {old_t:.3f}s)")
        elif old_t < 0:
            notes.append(f"  fixed: {name} (was failing, now {new_t:.3f}s)")
        elif new_t > old_t * ratio and new_t - old_t > floor:
            regressions.append(
                f"  REGRESSED {name}: {old_t:.3f}s -> {new_t:.3f}s "
                f"({new_t / old_t:.2f}x)")
    for name in sorted(set(nq) - set(oq)):
        notes.append(f"  new: {name} ({nq[name]:.3f}s)")

    print(f"bench_gate: {old_path} -> {new_path} "
          f"(total {old.get('value')}s -> {new.get('value')}s, "
          f"gate {ratio}x + {floor}s)")
    for label, doc in (("old", old), ("new", new)):
        if doc.get("_reconstructed"):
            print(f"  note: {label} artifact reconstructed from a "
                  f"truncated tail ({len(doc.get('queries', {}))} warm "
                  "queries recovered; leading fields lost)")
        l1, l1e, nc = (doc.get("load1"), doc.get("load1_end"),
                       doc.get("ncpu"))
        if isinstance(l1, (int, float)) and l1 >= 0:
            peak = max(l1, l1e if isinstance(l1e, (int, float)) else l1)
            loaded = (isinstance(nc, int) and nc > 0
                      and peak > max(2.0, nc * 0.5))
            flag = " — MACHINE LOADED, timings may be inflated" \
                if loaded else ""
            end = f" load1_end={l1e}" if l1e is not None else ""
            print(f"  env: {label} load1={l1}{end} ncpu={nc}{flag}")
    for n in notes:
        print(n)
    # Cold-pass report: bench.py emits cold_queries on a separate stdout
    # line + the BENCH_FULL.json sidecar only (the driver-parsed final
    # line is warm-only), so driver artifacts never carry cold_queries —
    # fall back to the sidecar EXPLICITLY rather than silently skipping.
    cold_doc, cold_src = new, new_path
    if "cold_queries" not in cold_doc:
        side = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH_FULL.json")
        if os.path.exists(side):
            try:
                with open(side) as f:
                    cold_doc, cold_src = json.load(f), side
            except ValueError:
                pass
    if "cold_queries" in cold_doc:
        note = ("" if cold_src == new_path
                else f" [from sidecar {cold_src}; may predate NEW]")
        print(f"  cold pass (informational): "
              f"{cold_doc.get('cold_total_sec')}s over "
              f"{len(cold_doc['cold_queries'])} materialized rows{note}")
    if regressions:
        print(f"{len(regressions)} per-query regression(s):")
        for r in regressions:
            print(r)
        return 1
    print(f"PASS — no query regressed past {ratio}x+{floor}s "
          f"({len(nq)} queries)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
