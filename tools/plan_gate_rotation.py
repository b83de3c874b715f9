#!/usr/bin/env python
"""Compute the next round's driver-gate window from the recorded
CORRECTNESS_r*.json history (r12: the rotation standing rules are
mechanical, the judge re-verifies the composition every round, and
hand-building the 50-name list is the one step that can silently go
wrong — see the r9 round, where the window simply wasn't rotated).

    python tools/plan_gate_rotation.py [--changed a,b,...] [--check]

Standing rules (VERDICT r10/r11, pinned in tests/test_registry_gate.py):

1. Names whose PLAN or ORACLE changed this round front the window
   (supplied via --changed — the history can't know them).
2. Then oracle-backed names ordered by staleness: oldest newest-driver-
   row round first, alphabetical within a round. A name with no driver
   row at all counts as round 0 (stalest possible).
3. Rows-only (no-oracle) names sort after EVERY oracle-backed name,
   both inside the 50-slot window (contiguous tail only) and behind it.

Output: the ordered window (with per-name provenance) plus the full
permutation tail summary. --check instead verifies that
registry._GATE_PRIORITY's induced order already IS the computed one
for the window slice, and exits nonzero with a diff if not — run it
at round start, paste the emitted list, re-run with --check.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, ".")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def newest_rows() -> dict[str, int]:
    """name -> newest round with a driver (or driver-format) row."""
    newest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        for name in data:
            newest[name] = max(newest.get(name, 0), rnd)
    return newest


def plan(changed: list[str]) -> list[tuple[str, str]]:
    """[(name, provenance)] for the full permutation, window first."""
    from cdc_kafka_project_spark.registry import ORACLES, all_queries

    names = list(all_queries())
    rows = newest_rows()
    changed_set = set(changed)
    unknown = changed_set - set(names)
    if unknown:
        raise SystemExit(f"--changed names not in registry: {sorted(unknown)}")

    def provenance(n: str) -> str:
        r = rows.get(n, 0)
        return f"r{r}" if r else "never-checked"

    fronted = [(n, f"changed-this-round ({provenance(n)})") for n in changed]
    oracle_rest = sorted(
        (n for n in names if n in ORACLES and n not in changed_set),
        key=lambda n: (rows.get(n, 0), n),
    )
    no_oracle = sorted(
        (n for n in names if n not in ORACLES and n not in changed_set),
        key=lambda n: (rows.get(n, 0), n),
    )
    out = fronted
    out += [(n, provenance(n)) for n in oracle_rest]
    out += [(n, f"{provenance(n)} (no oracle)") for n in no_oracle]
    return out


def main() -> int:
    args = sys.argv[1:]
    changed: list[str] = []
    if "--changed" in args:
        i = args.index("--changed")
        changed = [n for n in args[i + 1].split(",") if n]
        args = args[:i] + args[i + 2 :]
    check = "--check" in args

    ordered = plan(changed)
    window = ordered[:WINDOW]

    if check:
        from cdc_kafka_project_spark.registry import _GATE_PRIORITY, all_queries

        listed = set(_GATE_PRIORITY)
        current = [n for n in _GATE_PRIORITY if n in set(all_queries())]
        current += [n for n in all_queries() if n not in listed]
        want = [n for n, _ in window]
        got = current[:WINDOW]
        if got == want:
            print(f"OK: _GATE_PRIORITY window matches the computed "
                  f"rotation ({WINDOW} slots, {len(changed)} fronted)")
            return 0
        print("MISMATCH between _GATE_PRIORITY[:50] and the computed window:")
        for i, (w, g) in enumerate(zip(want, got)):
            if w != g:
                print(f"  slot {i}: computed {w!r} != registry {g!r}")
        return 1

    print(f"# next gate window ({WINDOW} slots; "
          f"{len(changed)} changed-this-round fronted)")
    for n, why in window:
        print(f'    "{n}",  # {why}')
    tail = ordered[WINDOW:]
    by_round: dict[str, int] = {}
    for _, why in tail:
        key = why.split()[0]
        by_round[key] = by_round.get(key, 0) + 1
    print(f"# tail ({len(tail)} names) newest-row distribution: "
          + ", ".join(f"{k}:{v}" for k, v in sorted(by_round.items())))
    return 0


if __name__ == "__main__":
    sys.exit(main())
