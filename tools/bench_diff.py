#!/usr/bin/env python3
"""Per-query bench regression table: previous round vs latest run.

Usage:
    python tools/bench_diff.py [OLD.json] [NEW.json]

Defaults: OLD = newest BENCH_r*.json in the repo root, NEW = last line
of BENCH_HISTORY.jsonl. Writes BENCH_DIFF.md and prints the table, so
each round's record shows exactly which queries got faster or slower
and by how much (the regression axis the judge grades round-over-round).
"""

from __future__ import annotations

import glob
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_round_file() -> str | None:
    rounds = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
    return rounds[-1] if rounds else None


def _latest_history() -> dict | None:
    path = os.path.join(ROOT, "BENCH_HISTORY.jsonl")
    if not os.path.exists(path):
        return None
    last = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                last = line
    return json.loads(last) if last else None


def _history_by_ts(prefix: str) -> dict | None:
    """``history:<ts-prefix>`` source: the BENCH_HISTORY entry whose ts
    starts with the prefix (driver round files that failed to parse are
    recoverable this way — bench.py appends every run to the history
    before printing the stdout line)."""
    path = os.path.join(ROOT, "BENCH_HISTORY.jsonl")
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            e = json.loads(line)
            if str(e.get("ts", "")).startswith(prefix):
                return e
    return None


def _load_source(arg: str) -> tuple[dict, str]:
    if arg.startswith("history:"):
        e = _history_by_ts(arg.split(":", 1)[1])
        if e is None:
            raise SystemExit(f"no BENCH_HISTORY entry matching {arg}")
        return e, arg
    with open(arg) as f:
        rec = json.load(f)
    # driver round files wrap the bench line under "parsed"
    if "queries" not in rec and isinstance(rec.get("parsed"), dict):
        rec = rec["parsed"]
    return rec, os.path.basename(arg)


def _config_line(tag: str, rec: dict) -> str:
    # compact stdout records carry n_queries instead of the full map
    n = len(rec.get("queries") or {}) or rec.get("n_queries", 0)
    nt = len(rec.get("queries_tail") or {}) or rec.get("n_queries_tail", 0)
    tail_s = f" (+{nt} tail @1 run)" if nt else ""
    return (
        f"> {tag}: {n} queries{tail_s}, sf={rec.get('sf')}, "
        f"{rec.get('runs_per_query', 1)} run(s)/query, "
        f"aggregation={rec.get('aggregation', 'single')}, "
        f"cdc_latency={rec.get('cdc_apply_latency_sec', 'n/a')}s"
        + (
            f" (min {rec['cdc_apply_latency_min_sec']}s)"
            if "cdc_apply_latency_min_sec" in rec else ""
        )
        + (
            f", total_min={rec['value_min']}s"
            if "value_min" in rec else ""
        )
        + (
            f", index_build={rec['index_build_sec']}s untimed"
            if "index_build_sec" in rec else ""
        )
        + (
            f", calib pre {rec['calib']['pre']['single_sec']}/"
            f"{rec['calib']['pre']['mt_sec']}s post "
            f"{rec['calib']['post']['single_sec']}/"
            f"{rec['calib']['post']['mt_sec']}s (1-core/32-core)"
            if isinstance(rec.get("calib"), dict) else ""
        )
    )


def _host_factor(old: dict, new: dict) -> float | None:
    """How much slower the NEW run's host was than the OLD run's, as
    measured by the fixed calibration probes (bench.py `_calibration`):
    geometric mean of the new/old ratios over the four probe readings
    (pre/post x single/mt). > 1 means the new host window was slower —
    raw new-side timings divided by this factor approximate a
    like-for-like comparison. None when either record predates the
    probe (r11 and earlier)."""
    oc, nc = old.get("calib"), new.get("calib")
    if not isinstance(oc, dict) or not isinstance(nc, dict):
        return None
    ratios = []
    for phase in ("pre", "post"):
        for k in ("single_sec", "mt_sec"):
            o = (oc.get(phase) or {}).get(k)
            n = (nc.get(phase) or {}).get(k)
            if o and n and o > 0 and n > 0:
                ratios.append(n / o)
    if not ratios:
        return None
    import math

    return math.exp(sum(math.log(r) for r in ratios) / len(ratios))


def main() -> int:
    old_src = sys.argv[1] if len(sys.argv) > 1 else _latest_round_file()
    if old_src is None:
        print("no BENCH_r*.json to diff against", file=sys.stderr)
        return 1
    old, old_path = _load_source(old_src)
    if len(sys.argv) > 2:
        new, new_name = _load_source(sys.argv[2])
    else:
        new = _latest_history()
        new_name = "BENCH_HISTORY.jsonl (latest)"
        if new is None:
            print("no BENCH_HISTORY.jsonl", file=sys.stderr)
            return 1

    oq, nq = old.get("queries", {}), new.get("queries", {})
    # per-query mins (present from round 7 on): the steal-robust
    # signal — a median regression is attributed to CODE only when the
    # min regressed too; otherwise it's the host's steal-time band
    # (round-6 verdict item 2: the r4 and r6 records were both
    # distorted this way)
    omin, nmin = old.get("queries_min") or {}, new.get("queries_min") or {}
    have_mins = bool(omin) and bool(nmin)
    lines = [
        f"# Bench diff — {old_path} → {new_name}",
        "",
        f"Total: {old.get('value')}s → {new.get('value')}s "
        f"(sf={new.get('sf')})",
        "",
        # both run configs, always (round-5 verdict item 6: never again
        # compare a single-run column against medians without saying so)
        _config_line("old", old),
        _config_line("new", new),
        "",
    ]
    factor = _host_factor(old, new)
    if factor is not None:
        adj = new.get("value")
        adj_s = f"{adj / factor:.1f}s" if adj else "n/a"
        lines += [
            f"> host factor (new/old calibration, geomean): "
            f"{factor:.2f} — the new run's host window was "
            f"{'slower' if factor > 1 else 'faster'}; "
            f"calib-adjusted new total ≈ {adj_s} "
            f"(raw {adj}s ÷ {factor:.2f}). Per-query deltas below are "
            f"RAW, but verdicts are CALIB-NORMALIZED (r15 verdict item "
            f"1): the old side is scaled by the host factor before the "
            f"median+min predicate, so a band-wide host shift cannot "
            f"mass-flag untouched queries.",
            "",
        ]

    # calib normalization (r16, r15 verdict item 1): scale the OLD
    # side's timings by the measured host factor so the regression
    # predicate compares like-for-like host windows. factor=None (no
    # calib on either side) degrades to the raw comparison.
    def _adj(v: float | None) -> float | None:
        return v * factor if (factor is not None and v is not None) else v
    if have_mins:
        lines += [
            "| query | old s | new s | delta | old min | new min | verdict |",
            "|---|---|---|---|---|---|---|",
        ]
    else:
        lines += ["| query | old s | new s | delta |", "|---|---|---|---|"]

    import importlib.util as _ilu

    _spec = _ilu.spec_from_file_location(
        "bench_common",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "bench_common.py"),
    )
    _bc = _ilu.module_from_spec(_spec)
    _spec.loader.exec_module(_bc)
    _regressed = _bc.regressed  # the ONE shared predicate

    n_regressed = 0
    log_speedups: list[float] = []
    log_speedups_raw: list[float] = []
    import math

    for name in sorted(set(oq) | set(nq)):
        o, n = oq.get(name), nq.get(name)
        if o is None:
            delta = "NEW"
            o_s = "—"
            n_s = f"{n:.3f}"
        elif n is None:
            delta = "REMOVED"
            o_s, n_s = f"{o:.3f}", "—"
        else:
            # a 0.000 old value can't express a percentage — don't
            # render a regression from it as "+0%"
            delta = f"{(n - o) / o * 100:+.0f}%" if o else "n/a (old=0)"
            o_s, n_s = f"{o:.3f}", f"{n:.3f}"
            if o > 0 and n > 0:
                log_speedups_raw.append(math.log(o / n))
                oa = _adj(o)
                if oa and oa > 0:
                    log_speedups.append(math.log(oa / n))
        if not have_mins:
            lines.append(f"| {name} | {o_s} | {n_s} | {delta} |")
            continue
        om, nm = omin.get(name), nmin.get(name)
        om_s = f"{om:.3f}" if om is not None else "—"
        nm_s = f"{nm:.3f}" if nm is not None else "—"
        if _regressed(_adj(o), n):
            if om is None or nm is None:
                # no min evidence for THIS query — keep the alarm (the
                # benign 'host band' label needs positive evidence that
                # the min held; missing data is not that)
                verdict = "REGRESSED (no min data)"
            elif _regressed(_adj(om), nm):
                verdict = "REGRESSED (code)"
            else:
                verdict = "host band"
        else:
            verdict = ""
        if verdict.startswith("REGRESSED"):
            n_regressed += 1
        lines.append(
            f"| {name} | {o_s} | {n_s} | {delta} | {om_s} | {nm_s} |"
            f" {verdict} |"
        )

    # Full-registry tail (r13 verdict item 2): single-run timings for
    # every name outside the headline set. One run = noisier evidence,
    # so tail verdicts are labelled 1-run and never fold into the
    # headline total; the tail's job is making a regression in the
    # unbenched ~122 names VISIBLE, not precisely attributing it.
    ot = old.get("queries_tail") or {}
    nt = new.get("queries_tail") or {}
    # r15: names promoted by bench.py's tail rotation carry 3-run
    # medians in queries_tail plus mins in queries_tail_min — when a
    # name has min evidence on BOTH sides, its verdict gets the
    # headline-grade median+min predicate; otherwise the 1-run label.
    otm = old.get("queries_tail_min") or {}
    ntm = new.get("queries_tail_min") or {}
    if ot or nt:
        n_rot = len(ntm)
        lines += [
            "",
            f"## Tail (1 run/query; {n_rot} rotated names at 3-run "
            f"median+min): "
            f"{old.get('tail_total_sec', 'n/a')}s → "
            f"{new.get('tail_total_sec', 'n/a')}s "
            f"({len(ot)} → {len(nt)} queries)",
            "",
            "| query | old s | new s | delta | verdict |",
            "|---|---|---|---|---|",
        ]
        for name in sorted(set(ot) | set(nt)):
            o, n = ot.get(name), nt.get(name)
            if o is None:
                o_s, n_s, delta = "—", f"{n:.3f}", "NEW"
            elif n is None:
                o_s, n_s, delta = f"{o:.3f}", "—", "REMOVED"
            else:
                o_s, n_s = f"{o:.3f}", f"{n:.3f}"
                delta = f"{(n - o) / o * 100:+.0f}%" if o else "n/a (old=0)"
            if not _regressed(_adj(o), n):
                verdict = ""
            elif name in otm and name in ntm:
                verdict = (
                    "REGRESSED (code; 3-run both sides)"
                    if _regressed(_adj(otm[name]), ntm[name]) else "host band"
                )
            else:
                verdict = "REGRESSED? (1-run pair — rerun to confirm)"
            lines.append(f"| {name} | {o_s} | {n_s} | {delta} | {verdict} |")
    # machine-readable summary (r15 verdict item 1): raw AND normalized
    # totals plus the normalized per-query geomean in ONE json line, so
    # the driver/judge can read the calib-corrected verdict without
    # parsing the markdown table.
    def _geo(logs: list[float]) -> float | None:
        return round(math.exp(sum(logs) / len(logs)), 4) if logs else None

    summary = {
        "metric": "bench_diff",
        "total_old_sec": old.get("value"),
        "total_new_sec": new.get("value"),
        "host_factor_new_over_old": round(factor, 4) if factor else None,
        "total_new_norm_sec": (
            round(new["value"] / factor, 3)
            if factor and new.get("value") else None
        ),
        "geomean_speedup_raw": _geo(log_speedups_raw),
        "geomean_speedup_norm": _geo(log_speedups),
        "n_headline_regressed_norm": n_regressed,
        "verdicts_calib_normalized": factor is not None,
    }
    lines += ["", "```json", json.dumps(summary), "```"]
    out = "\n".join(lines) + "\n"
    with open(os.path.join(ROOT, "BENCH_DIFF.md"), "w") as f:
        f.write(out)
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
