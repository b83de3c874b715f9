"""Pins for the replica-sweep tooling's self-healing chunk runner
(tools/check_correctness.py::chunk_sweep, r12).

Why this exists: at the 100x replica a chunk JVM 26 queries deep died
on dedup_simhash_pairs — which PASSES standalone in a fresh JVM — and
took 14 innocent unreported names down with it (r11 healed the same
shape with manual "fill runs"). The retry pass re-runs every FAILed or
unreported name once in its own fresh child; only a name failing BOTH
times counts as a failure. These tests script the child runner so the
retry semantics are pinned without spawning JVMs.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def chunk_sweep():
    spec = importlib.util.spec_from_file_location(
        "check_correctness", os.path.join(ROOT, "tools", "check_correctness.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.chunk_sweep


def test_all_green_no_retry(chunk_sweep):
    calls = []

    def run(batch):
        calls.append(list(batch))
        return {n: "pass" for n in batch}

    final, retried = chunk_sweep(["a", "b", "c", "d"], 2, run)
    assert final == {n: "pass" for n in "abcd"}
    assert retried == []
    assert calls == [["a", "b"], ["c", "d"]]


def test_jvm_death_heals_unreported_names(chunk_sweep):
    """Chunk dies after its first name: the dead name and the
    unreported tail each get one standalone re-run; a standalone pass
    clears them."""
    calls = []

    def run(batch):
        calls.append(list(batch))
        if batch == ["a", "b", "c"]:
            return {"a": "pass"}  # died before b and c
        return {n: "pass" for n in batch}

    final, retried = chunk_sweep(["a", "b", "c"], 3, run)
    assert final == {"a": "pass", "b": "pass", "c": "pass"}
    assert retried == ["b", "c"]
    assert calls == [["a", "b", "c"], ["b"], ["c"]]


def test_chunk_fail_heals_on_standalone_pass(chunk_sweep):
    """The observed 100x shape: a name FAILs inside an accumulated
    chunk but passes alone — the standalone verdict wins."""

    def run(batch):
        if len(batch) > 1:
            return {"a": "pass", "b": "fail"}
        return {"b": "pass"}

    final, retried = chunk_sweep(["a", "b"], 2, run)
    assert final == {"a": "pass", "b": "pass"}
    assert retried == ["b"]


def test_double_fail_stays_failed(chunk_sweep):
    def run(batch):
        return {n: ("fail" if n == "b" else "pass") for n in batch}

    final, retried = chunk_sweep(["a", "b"], 2, run)
    assert final == {"a": "pass", "b": "fail"}
    assert retried == ["b"]


def test_standalone_death_is_failure(chunk_sweep):
    """A name whose own fresh JVM dies is a real resource defect."""

    def run(batch):
        if batch == ["a", "b"]:
            return {"a": "pass"}  # died on b
        return {}  # standalone b dies too

    final, retried = chunk_sweep(["a", "b"], 2, run)
    assert final == {"a": "pass", "b": "fail"}
    assert retried == ["b"]


def test_rows_only_names_never_retried(chunk_sweep):
    calls = []

    def run(batch):
        calls.append(list(batch))
        return {n: ("rows" if n == "b" else "pass") for n in batch}

    final, retried = chunk_sweep(["a", "b"], 2, run)
    assert final == {"a": "pass", "b": "rows"}
    assert retried == []
    assert calls == [["a", "b"]]


def test_gclocker_retry_budget_reaches_the_jvm(spark):
    """r12 hardening pin: at the 100x replica, serving JVMs died on
    GCLocker retry exhaustion (humongous sort-array allocations vs
    Arrow JNI critical sections across 32 task threads). get_spark
    must keep raising the retry budget — and since the option only
    matters at JVM launch, assert it actually reached the live JVM's
    command line, not just the conf."""
    opts = spark.conf.get("spark.driver.extraJavaOptions", "")
    assert "GCLockerRetryAllocationCount" in opts
    assert "-XX:+UnlockDiagnosticVMOptions" in opts
    pid = spark.sparkContext._jvm.java.lang.ProcessHandle.current().pid()
    cmdline = open(f"/proc/{pid}/cmdline", "rb").read().decode().split("\0")
    assert any("GCLockerRetryAllocationCount" in c for c in cmdline)
