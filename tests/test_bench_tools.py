"""Pins for the bench tooling contracts (round-6 verdict item 2): the
regression verdict must attribute a slowdown to CODE only when both
the median and the steal-robust min regress, and the config line must
describe compact stdout records (n_queries, no per-query map)."""

import importlib.util
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench_diff():
    spec = importlib.util.spec_from_file_location(
        "bench_diff", os.path.join(ROOT, "tools", "bench_diff.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_config_line_falls_back_to_n_queries():
    bd = _bench_diff()
    full = {"queries": {"a": 1.0, "b": 2.0}, "sf": 0.1}
    compact = {"n_queries": 96, "sf": 0.1}
    assert "2 queries" in bd._config_line("old", full)
    # a compact stdout record (driver round file) has no map — the
    # count must come from n_queries, not render as 0
    assert "96 queries" in bd._config_line("new", compact)


def test_diff_verdict_separates_host_band_from_code(tmp_path, monkeypatch, capsys):
    bd = _bench_diff()
    import json
    import sys

    old = {
        "value": 3.0, "sf": 0.1, "runs_per_query": 3,
        "aggregation": "median",
        "queries": {"steal": 1.0, "real": 1.0, "fine": 1.0},
        "queries_min": {"steal": 0.9, "real": 0.9, "fine": 0.9},
    }
    old["queries"]["nomin"] = 1.0
    new = {
        "value": 5.5, "sf": 0.1, "runs_per_query": 3,
        "aggregation": "median",
        # steal: median regressed, min held -> host band
        # real: median AND min regressed -> code
        # fine: no regression
        # nomin: median regressed, min data absent -> alarm stays
        "queries": {"steal": 2.0, "real": 2.5, "fine": 1.0, "nomin": 2.0},
        "queries_min": {"steal": 0.92, "real": 2.3, "fine": 0.9},
    }
    po, pn = tmp_path / "old.json", tmp_path / "new.json"
    po.write_text(json.dumps(old))
    pn.write_text(json.dumps(new))
    monkeypatch.setattr(bd, "ROOT", str(tmp_path))
    monkeypatch.setattr(sys, "argv", ["bench_diff.py", str(po), str(pn)])
    assert bd.main() == 0
    out = capsys.readouterr().out
    steal_row = next(line for line in out.splitlines() if "| steal |" in line)
    real_row = next(line for line in out.splitlines() if "| real |" in line)
    fine_row = next(line for line in out.splitlines() if "| fine |" in line)
    assert "host band" in steal_row and "code" not in steal_row
    assert "REGRESSED (code)" in real_row
    assert "REGRESSED" not in fine_row and "host band" not in fine_row
    # a median regression with NO min evidence must keep the alarm —
    # the benign label requires positive proof that the min held
    nomin_row = next(line for line in out.splitlines() if "| nomin |" in line)
    assert "REGRESSED (no min data)" in nomin_row


def test_host_factor_from_calibration_probes(tmp_path, monkeypatch, capsys):
    """Round-12 calibration (round-11 verdict item 3): when both
    records carry the fixed-probe readings, the diff must surface the
    measured host factor (geomean of new/old over the four readings)
    and the calib-adjusted total, so a band-wide drift stops reading
    as a per-query regression hunt. Records without calib (r11 and
    earlier) must not grow the header."""
    bd = _bench_diff()

    old = {"calib": {"pre": {"single_sec": 1.0, "mt_sec": 2.0},
                     "post": {"single_sec": 1.0, "mt_sec": 2.0}}}
    new = {"calib": {"pre": {"single_sec": 1.5, "mt_sec": 3.0},
                     "post": {"single_sec": 1.5, "mt_sec": 3.0}},
           "value": 90.0}
    f = bd._host_factor(old, new)
    assert abs(f - 1.5) < 1e-9
    assert bd._host_factor({}, new) is None
    assert bd._host_factor(old, {}) is None

    import json
    import sys

    old_rec = {
        "value": 60.0, "sf": 0.1, "queries": {"a": 60.0},
        "queries_min": {"a": 55.0}, **old,
    }
    new_rec = {
        "sf": 0.1, "queries": {"a": 90.0},
        "queries_min": {"a": 85.0}, **new,
    }
    po, pn = tmp_path / "old.json", tmp_path / "new.json"
    po.write_text(json.dumps(old_rec))
    pn.write_text(json.dumps(new_rec))
    monkeypatch.setattr(bd, "ROOT", str(tmp_path))
    monkeypatch.setattr(sys, "argv", ["bench_diff.py", str(po), str(pn)])
    assert bd.main() == 0
    out = capsys.readouterr().out
    assert "host factor" in out and "1.50" in out
    # 90 / 1.5 = 60 — adjusted total matches the old run exactly
    assert "60.0s" in out
    # calib readings rendered in both config lines
    assert out.count("calib pre") == 2


def test_verdicts_are_calib_normalized(tmp_path, monkeypatch, capsys):
    """r16 (r15 verdict item 1): two consecutive driver rounds were
    dominated by host-speed shifts — the per-query verdicts must scale
    the OLD side by the measured host factor before applying the
    median+min predicate, and a one-line JSON summary must carry the
    raw and normalized totals plus the normalized geomean."""
    bd = _bench_diff()
    import json
    import sys

    calib_old = {"pre": {"single_sec": 1.0, "mt_sec": 1.0},
                 "post": {"single_sec": 1.0, "mt_sec": 1.0}}
    calib_new = {"pre": {"single_sec": 1.5, "mt_sec": 1.5},
                 "post": {"single_sec": 1.5, "mt_sec": 1.5}}
    old = {
        "value": 2.0, "sf": 0.1, "runs_per_query": 3,
        "aggregation": "median", "calib": calib_old,
        # band: 1.0 -> 1.45 raw (+45%, would trip the raw predicate on
        # both median and min) but EXACTLY the 1.5x host factor -> must
        # NOT be flagged once normalized.
        # real: 1.0 -> 3.0 (2x even after the 1.5x normalization).
        "queries": {"band": 1.0, "real": 1.0},
        "queries_min": {"band": 0.95, "real": 0.95},
        "queries_tail": {"t_band": 1.0},
        "queries_tail_min": {"t_band": 0.95},
        "tail_total_sec": 1.0,
    }
    new = {
        "value": 4.45, "sf": 0.1, "runs_per_query": 3,
        "aggregation": "median", "calib": calib_new,
        "queries": {"band": 1.45, "real": 3.0},
        "queries_min": {"band": 1.40, "real": 2.9},
        "queries_tail": {"t_band": 1.45},
        "queries_tail_min": {"t_band": 1.40},
        "tail_total_sec": 1.45,
    }
    po, pn = tmp_path / "old.json", tmp_path / "new.json"
    po.write_text(json.dumps(old))
    pn.write_text(json.dumps(new))
    monkeypatch.setattr(bd, "ROOT", str(tmp_path))
    monkeypatch.setattr(sys, "argv", ["bench_diff.py", str(po), str(pn)])
    assert bd.main() == 0
    out = capsys.readouterr().out
    band = next(line for line in out.splitlines() if "| band |" in line)
    real = next(line for line in out.splitlines() if "| real |" in line)
    tband = next(line for line in out.splitlines() if "| t_band |" in line)
    assert "REGRESSED" not in band  # host-factor-sized shift: not code
    assert "REGRESSED (code)" in real
    assert "REGRESSED" not in tband  # tail rotated pair normalized too
    # the one-line JSON summary with raw + normalized totals
    js = next(line for line in out.splitlines()
              if line.startswith('{"metric": "bench_diff"'))
    s = json.loads(js)
    assert abs(s["host_factor_new_over_old"] - 1.5) < 1e-6
    assert abs(s["total_new_norm_sec"] - 4.45 / 1.5) < 1e-3
    assert s["n_headline_regressed_norm"] == 1
    assert s["verdicts_calib_normalized"] is True
    # normalized geomean: band contributes 1.5/1.45, real 1.5/3.0
    import math
    want = math.exp((math.log(1.5 / 1.45) + math.log(1.5 / 3.0)) / 2)
    assert abs(s["geomean_speedup_norm"] - want) < 1e-3


def test_tail_section_diffs_full_registry(tmp_path, monkeypatch, capsys):
    """r13 verdict item 2: names outside the headline set are benched
    once each (queries_tail) and bench_diff must render them — with
    1-run-pair verdicts that never claim code-level attribution."""
    bd = _bench_diff()
    import json
    import sys

    old = {
        "value": 1.0, "sf": 0.1, "runs_per_query": 3,
        "aggregation": "median",
        "queries": {"head": 1.0}, "queries_min": {"head": 0.9},
        "queries_tail": {"t_slow": 1.0, "t_fine": 1.0},
        "tail_total_sec": 2.0,
    }
    new = {
        "value": 1.0, "sf": 0.1, "runs_per_query": 3,
        "aggregation": "median",
        "queries": {"head": 1.0}, "queries_min": {"head": 0.9},
        "queries_tail": {"t_slow": 2.0, "t_fine": 1.0, "t_new": 0.5},
        "tail_total_sec": 3.5,
    }
    po, pn = tmp_path / "old.json", tmp_path / "new.json"
    po.write_text(json.dumps(old))
    pn.write_text(json.dumps(new))
    monkeypatch.setattr(bd, "ROOT", str(tmp_path))
    monkeypatch.setattr(sys, "argv", ["bench_diff.py", str(po), str(pn)])
    assert bd.main() == 0
    out = capsys.readouterr().out
    assert "## Tail (1 run/query" in out
    slow = next(line for line in out.splitlines() if "| t_slow |" in line)
    fine = next(line for line in out.splitlines() if "| t_fine |" in line)
    newq = next(line for line in out.splitlines() if "| t_new |" in line)
    assert "REGRESSED?" in slow and "1-run pair" in slow
    assert "(code)" not in slow  # 1-run evidence never claims code
    assert "REGRESSED" not in fine
    assert "NEW" in newq
    # config line advertises the tail count
    assert "(+2 tail @1 run)" in out and "(+3 tail @1 run)" in out
