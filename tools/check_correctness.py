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
        import re
        import subprocess

        from cdc_kafka_project_spark.registry import all_oracles, all_queries

        names = [
            n
            for n in all_queries()
            if (not only or n in only) and n not in skip
        ]
        oracles = all_oracles()
        totals = [0, 0, 0]
        died = False
        for lo in range(0, len(names), chunk):
            batch = names[lo : lo + chunk]
            extra = ["--digest"] if digest else []
            proc = subprocess.run(
                [sys.executable, sys.argv[0], sf_dir, *batch, *extra],
                capture_output=True,
                text=True,
            )
            out = proc.stdout
            lines = out.splitlines()
            sys.stdout.write(
                "".join(
                    ln + "\n"
                    for ln in lines
                    if ln.startswith(("PASS", "FAIL", "rows "))
                )
            )
            sys.stdout.flush()
            # Parse the child's summary with an anchored regex — a
            # free-text split-and-unpack broke whenever the wording
            # gained an extra number. No match => treat as died-mid-run.
            m = None
            for ln in reversed(lines):
                m = re.match(r"^(\d+) pass, (\d+) fail, (\d+) rows-only$", ln)
                if m:
                    break
            if m:
                totals[0] += int(m.group(1))
                totals[1] += int(m.group(2))
                totals[2] += int(m.group(3))
            else:
                # chunk process died mid-run (e.g. kernel OOM kill):
                # credit the per-query lines it DID flush. Unreported
                # names with an oracle are real (synthetic) failures;
                # unreported no-oracle names could only ever have been
                # rows-only, so count them there — crediting them as
                # failures overstated real oracle failures after a kill.
                p = sum(ln.startswith("PASS") for ln in lines)
                f = sum(ln.startswith("FAIL") for ln in lines)
                r = sum(ln.startswith("rows ") for ln in lines)
                reported = {
                    ln.split()[1].rstrip(":")
                    for ln in lines
                    if ln.startswith(("PASS", "FAIL", "rows "))
                    and len(ln.split()) > 1
                }
                unreported = [n for n in batch if n not in reported]
                un_oracle = [n for n in unreported if n in oracles]
                un_rows = [n for n in unreported if n not in oracles]
                print(
                    f"FAIL  chunk {lo//chunk}: died after"
                    f" {p + f + r}/{len(batch)} queries (rc {proc.returncode});"
                    f" {len(un_oracle)} unreported oracle-backed counted as"
                    f" synthetic FAIL, {len(un_rows)} unreported no-oracle"
                    f" counted as rows-only"
                )
                totals[0] += p
                totals[1] += f + len(un_oracle)
                totals[2] += r + len(un_rows)
                # a died chunk is a gate failure even when every
                # unreported name was no-oracle (the realistic tail
                # shape: the 5 no-oracle names sort last) — without
                # this flag such a crash exited 0
                died = True
        print(f"\n{totals[0]} pass, {totals[1]} fail, {totals[2]} rows-only")
        return 1 if totals[1] or died else 0

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
    for name, fn in queries.items():
        if (only and name not in only) or name in skip:
            continue
        t0 = time.time()
        try:
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
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {e}")
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
            spark.catalog.clearCache()
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
            print(f"FAIL  {name}: duckdb raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        scols, srows = normalize(sdf)
        ocols, orows = normalize(odf)
        if digest and n_spark != n_oracle:
            print(f"FAIL  {name}: rowcount {n_spark} != {n_oracle}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL  {name}: columns {scols} != {ocols}")
            n_fail += 1
        elif len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount {len(srows)} != {len(orows)}")
            n_fail += 1
        elif srows != orows:
            diffs = [
                (a, b) for a, b in zip(srows, orows) if a != b
            ][:3]
            print(f"FAIL  {name}: values differ; first diffs: {diffs}")
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
