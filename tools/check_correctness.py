#!/usr/bin/env python
"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every registered query at a given sf_dir on Spark AND its oracle
SQL on DuckDB, then compares row count, column names, and values
(order-insensitive: columns sorted by name, rows sorted by all
columns). Use while iterating so the per-round CORRECTNESS file holds
no surprises.

    python tools/check_correctness.py [sf_dir] [query ...]
        [--chunk N] [--skip a,b,...] [--digest]

--digest (round-10 verdict item 2b): compare an exact ROW COUNT plus a
deterministic ORDER-BY-prefix sample (top-PREFIX_K rows under a total
order over every output column, NULLS FIRST both sides) instead of
materializing the full output into the hash path. For the handful of
output-heavy names (multi-million-row outputs at the 100x replica —
sessionize & co), full-output toPandas() killed the chunk JVM; the
prefix is TakeOrderedAndProject on the Spark side (per-partition
heaps, no global sort materialization) and ORDER BY ... LIMIT on the
oracle side. Weaker than the full hash (a mid-stream divergence with
identical count and prefix escapes) — the per-round record marks these
rows "digest".

--chunk N additionally self-heals chunk-JVM deaths (r12; narrowed
r13): any name that goes unreported or FAILs with an EXCEPTION-type
line ('spark/duckdb raised', JVM death) is re-run once in its own
fresh subprocess; only a name failing BOTH times counts as a failure
(a chunk 26 queries deep into 100x-scale work can OOM on a name that
is green standalone — r11 healed this with manual fill runs).
Deterministic oracle mismatches (values/columns/rowcount) are NEVER
retried — an intermittently nondeterministic query must not be
greenlit by one lucky re-run (r12 advisor, medium). Retry-pass
verdict echoes are prefixed 'RETRY ' so per-name verdict lines stay
countable (r12 advisor, low).
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")


def normalize(df):
    """pandas frame -> (colnames, list of row tuples, canonicalized)."""
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if str(col.dtype).startswith("datetime"):
            df[c] = col.astype("string")
        elif col.dtype == object:
            df[c] = col.apply(
                lambda v: str(v) if not isinstance(v, (str, bytes, type(None))) else v
            )
    rows = []
    for tup in df.itertuples(index=False, name=None):
        canon = []
        for v in tup:
            if isinstance(v, float):
                if math.isnan(v):
                    canon.append("NaN")
                else:
                    canon.append(repr(v))
            elif v is None or (isinstance(v, float) and pd.isna(v)):
                canon.append("NULL")
            else:
                try:
                    if pd.isna(v):
                        canon.append("NULL")
                        continue
                except (TypeError, ValueError):
                    pass
                canon.append(str(v))
        rows.append(tuple(canon))
    rows.sort()
    return list(df.columns), rows


def classify_fail_line(ln: str) -> str:
    """Verdict kind for a child FAIL line. Prefers the structured
    token the child now emits (FAIL-EXC / FAIL-MISMATCH — r13
    advisor: free text is unsafe because value-mismatch lines embed
    row data, and a document payload containing ' raised ' would
    misclassify a deterministic mismatch as a retry-eligible
    exception); legacy plain 'FAIL' lines from mixed-version children
    fall back to the old text scan."""
    tok = ln.split(None, 1)[0] if ln else ""
    if tok == "FAIL-EXC":
        return "fail-exc"
    if tok == "FAIL-MISMATCH":
        return "fail-mismatch"
    return (
        "fail-exc" if (" raised " in ln or " died" in ln)
        else "fail-mismatch"
    )


def chunk_sweep(
    names: list[str],
    chunk: int,
    run_batch,
) -> tuple[dict[str, str], list[str]]:
    """Chunked sweep with a one-shot retry pass (r12 self-healing,
    r13: mismatch FAILs are no longer healable).

    ``run_batch(batch, retry) -> dict[name, verdict]`` runs one fresh
    child over ``batch``; a missing name means the child died before
    reaching it. Verdicts are 'pass' / 'rows' / 'fail-exc'
    (exception-type: spark/duckdb raised, JVM death — resource shapes)
    / 'fail-mismatch' (oracle value/columns/rowcount divergence).

    Only unreported names and exception-type FAILs are healable: a
    chunk 26 queries deep into 100x-scale work can OOM on a name that
    is green in a fresh JVM (observed: dedup_simhash_pairs, r12). A
    VALUE mismatch is the gate's whole point — an intermittently
    nondeterministic query must not be greenlit by one lucky re-run
    (r12 advisor, medium), so mismatches are never retried and always
    fail the sweep. Returns (final verdicts, retried names).
    """
    final: dict[str, str] = {}
    for lo in range(0, len(names), chunk):
        batch = names[lo : lo + chunk]
        verdicts = run_batch(batch, False)
        done = len([n for n in batch if n in verdicts])
        if done < len(batch):
            print(
                f"NOTE  chunk JVM died after {done}/{len(batch)}"
                f" queries; {len(batch) - done} unreported name(s) go"
                f" to the retry pass"
            )
        final.update(verdicts)

    mismatched = sorted(
        n for n in names if final.get(n) == "fail-mismatch"
    )
    if mismatched:
        print(f"\nNOTE  {len(mismatched)} deterministic oracle"
              f" mismatch(es) — NOT retried, sweep fails:"
              f" {', '.join(mismatched)}")
    retry = [n for n in names
             if final.get(n) in (None, "fail-exc")]
    if retry:
        print(f"\nRETRY pass: {len(retry)} name(s) in fresh JVMs"
              f" ({', '.join(retry)})")
        for n in retry:
            v = run_batch([n], True).get(n)
            if v is None:
                # died even alone: a real resource defect
                print(f"FAIL  {n}: chunk JVM died standalone")
                v = "fail-exc"
            elif final.get(n) is not None and v != final[n]:
                print(f"NOTE  {n}: {final[n]} in chunk ->"
                      f" {v} standalone (chunk-JVM accumulation)")
            final[n] = v
    return final, retry


def main() -> int:
    import os

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    if not os.path.isdir(sf_dir):
        print(f"usage: python {sys.argv[0]} [sf_dir] [query ...] [--chunk N]")
        print(f"error: sf_dir is not a directory: {sf_dir!r}")
        return 2
    args = sys.argv[2:]
    chunk = 0
    if "--chunk" in args:
        i = args.index("--chunk")
        try:
            chunk = int(args[i + 1])
        except (IndexError, ValueError):
            print("error: --chunk requires an integer")
            return 2
        args = args[:i] + args[i + 2 :]
    skip: set[str] = set()
    if "--skip" in args:
        i = args.index("--skip")
        try:
            skip = set(args[i + 1].split(","))
        except IndexError:
            print("error: --skip requires a comma-separated name list")
            return 2
        args = args[:i] + args[i + 2 :]
    digest = "--digest" in args
    if digest:
        args = [a for a in args if a != "--digest"]
    only = set(args)

    if chunk > 0:
        # replica-scale sweeps: a single long-lived session dies even
        # with per-query clearCache — collect buffers and py4j-pinned
        # broadcast blocks accumulate until the fixed driver heap OOMs
        # (observed twice at the 100x replica, ~26 queries in each
        # time). Run the list in fresh subprocesses of `chunk` names
        # so accumulation is bounded and a JVM death costs one chunk.
        #
        # RETRY PASS (r12): a chunk-JVM death takes innocent names with
        # it — dedup_simhash_pairs FAILED 26 queries into a 100x chunk
        # but PASSES standalone in a fresh JVM; r11 healed this with a
        # manual "fill run". Any name that FAILs or goes unreported now
        # gets exactly one re-run in its own fresh subprocess; only a
        # name failing BOTH times counts as a failure. Retried verdicts
        # are tagged so the log shows which names needed healing.
        import subprocess

        from cdc_kafka_project_spark.registry import all_queries

        names = [
            n
            for n in all_queries()
            if (not only or n in only) and n not in skip
        ]
        extra = ["--digest"] if digest else []

        def run_batch(batch: list[str], retry: bool = False) -> dict[str, str]:
            """One fresh subprocess over ``batch``; {name: verdict}.
            A missing name means the JVM died before reaching it —
            per-name lines flush per query, so presence is the
            liveness signal. FAIL lines carry a structured token
            (FAIL-EXC = exception-type, healable; FAIL-MISMATCH =
            deterministic oracle divergence, never healed) — r13
            advisor: free-text scanning misclassified mismatches
            whose embedded row data contained ' raised '. Retry-pass
            echoes are prefixed 'RETRY ' so log consumers counting
            verdict lines see one final verdict per name (r12
            advisor, low)."""
            proc = subprocess.run(
                [sys.executable, sys.argv[0], sf_dir, *batch, *extra],
                capture_output=True,
                text=True,
            )
            lines = proc.stdout.splitlines()
            verdicts: dict[str, str] = {}
            batch_set = set(batch)
            prefix = "RETRY " if retry else ""
            for ln in lines:
                parts = ln.split()
                if ln.startswith(("PASS", "FAIL", "rows ")) and len(parts) > 1:
                    nm = parts[1].rstrip(":")
                    if nm in batch_set:
                        if ln[0] == "F":
                            verdicts[nm] = classify_fail_line(ln)
                        else:
                            verdicts[nm] = {"P": "pass", "r": "rows"}[ln[0]]
                    sys.stdout.write(prefix + ln + "\n")
            sys.stdout.flush()
            return verdicts

        final, _retried = chunk_sweep(names, chunk, run_batch)
        totals = [
            sum(1 for v in final.values() if v == "pass"),
            sum(1 for v in final.values() if v.startswith("fail")),
            sum(1 for v in final.values() if v == "rows"),
        ]
        print(f"\n{totals[0]} pass, {totals[1]} fail, {totals[2]} rows-only")
        return 1 if totals[1] or len(final) != len(names) else 0

    import duckdb

    from cdc_kafka_project_spark.registry import all_oracles, all_queries
    from cdc_kafka_project_spark.schemas import TESTDATA_TABLES
    from cdc_kafka_project_spark.session import get_spark

    spark = get_spark("check-correctness")
    con = duckdb.connect()
    # DuckDB's default memory_limit is ~80% of host RAM; alongside a
    # multi-GB Spark JVM that invites the kernel OOM killer on
    # replica-scale oracles (chunk kills observed at the 100x replica
    # on the shingle-join oracles). Cap it and let DuckDB spill.
    con.execute(
        f"SET memory_limit='{os.environ.get('SWEEP_DUCKDB_MEM', '24GB')}'"
    )
    # Cap spill disk too (r13, ahead of the 1000x probe): an oracle
    # that out-spills the sandbox must ERROR (and be recorded as an
    # exclusion candidate), not fill the root disk under every other
    # process on the host.
    con.execute(
        "SET temp_directory='"
        + os.environ.get("SWEEP_DUCKDB_TMP",
                         "/root/repo/spark-warehouse/duckdb_tmp")
        + "'"
    )
    con.execute(
        "SET max_temp_directory_size='"
        + os.environ.get("SWEEP_DUCKDB_TMP_MAX", "40GB")
        + "'"
    )
    for t in TESTDATA_TABLES:
        # driver testdata ships flat files; Spark-written replicas
        # (tools/make_scale_replica.py) are part-file directories
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    queries, oracles = all_queries(), all_oracles()
    n_pass = n_fail = n_rowsonly = 0
    PREFIX_K = 2000
    # Replica-scale disk discipline (r14): Spark retains every shuffle
    # file of a finished query until the session stops, so during the
    # DuckDB compare the two engines' spill coexists on one disk — at
    # the 300x shingle tiers Spark's ~36 GB of retained shuffles
    # starved the oracle into a disk-full IOException. With the flag
    # set (scale_env, factor >= 300) the session is STOPPED once the
    # engine rows are collected and lazily recreated for the next
    # name; at chunk 1 (the replica sweeps) that is one stop per JVM.
    stop_before_oracle = (
        os.environ.get("SWEEP_STOP_SPARK_BEFORE_ORACLE") == "1"
    )
    for name, fn in queries.items():
        if (only and name not in only) or name in skip:
            continue
        t0 = time.time()
        try:
            if spark is None:
                spark = get_spark("check-correctness")
            out = fn(spark, sf_dir)
            if digest and name in oracles:
                # exact count + ORDER-BY-prefix: TakeOrdered, never a
                # full-output collect (Spark nulls-first asc default
                # == the NULLS FIRST we force on the oracle side)
                n_spark = out.count()
                cols = sorted(out.columns)
                sdf = out.orderBy(*cols).limit(PREFIX_K).toPandas()
            else:
                sdf = out.toPandas()
        except Exception as e:
            # str(e) on a Py4JJavaError round-trips to the JVM — on a
            # dead gateway THAT raises too and would take the whole
            # sweep (and every remaining name's verdict) with it;
            # format defensively like check_staged_oracles.py does.
            try:
                first = str(e).splitlines()[0] if str(e) else ""
            except Exception:
                first = "<unprintable: JVM gateway down>"
            print(f"FAIL-EXC  {name}: spark raised "
                  f"{type(e).__name__}: {first or type(e).__name__}")
            n_fail += 1
            continue
        finally:
            # ~10 registered queries persist() intermediates (vocab /
            # bigram counts / CC edges) and nothing here unpersists
            # them — across a couple hundred queries the accumulated
            # blocks overflowed the 16g driver heap at the 100x
            # replica (dedup_ngram_jaccard OOMed ~26 queries in).
            # One cache per query, then gone — matches how the driver
            # gate runs each query in isolation.
            if spark is not None:
                try:
                    spark.catalog.clearCache()
                except Exception:
                    pass
                try:
                    if stop_before_oracle:
                        # engine rows are fully collected in sdf /
                        # n_spark; drop the JVM (and its retained
                        # shuffle/spill files) before the oracle
                        # needs the disk.  stop() gets its own
                        # try so a clearCache() failure (dead
                        # gateway) can't leave the old JVM process
                        # lingering with its /dev/shm shuffle files.
                        spark.stop()
                        spark = None
                except Exception:
                    # a JVM that died mid-query must not take the
                    # remaining names' verdicts with it; the next
                    # name recreates the session
                    spark = None
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            if digest:
                ob = ", ".join(
                    f'"{c}" ASC NULLS FIRST' for c in sorted(sdf.columns)
                )
                n_oracle = con.execute(
                    f"SELECT COUNT(*) FROM ({oracles[name]}) __q"
                ).fetchone()[0]
                odf = con.execute(
                    f"SELECT * FROM ({oracles[name]}) __q"
                    f" ORDER BY {ob} LIMIT {PREFIX_K}"
                ).df()
            else:
                odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL-EXC  {name}: duckdb raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        scols, srows = normalize(sdf)
        ocols, orows = normalize(odf)
        if digest and n_spark != n_oracle:
            print(f"FAIL-MISMATCH  {name}: rowcount {n_spark} != {n_oracle}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL-MISMATCH  {name}: columns {scols} != {ocols}")
            n_fail += 1
        elif len(srows) != len(orows):
            print(f"FAIL-MISMATCH  {name}: rowcount {len(srows)} != {len(orows)}")
            n_fail += 1
        elif srows != orows:
            diffs = [
                (a, b) for a, b in zip(srows, orows) if a != b
            ][:3]
            print(f"FAIL-MISMATCH  {name}: values differ; first diffs: {diffs}")
            n_fail += 1
        elif digest:
            print(
                f"PASS  {name}: {n_spark} rows"
                f" (digest: count + {len(srows)}-row prefix)"
                f" [{time.time()-t0:.1f}s]"
            )
            n_pass += 1
        else:
            print(f"PASS  {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    import pandas as pd  # noqa: F401

    sys.exit(main())
