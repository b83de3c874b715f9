#!/usr/bin/env python
"""Build a local scale-stress replica of an sf_dir (round-7 verdict
item 4): duplicate + re-key the driver testdata K-fold so the most
expensive queries get one datapoint ABOVE sf0.1 before the two-order-
of-magnitude extrapolation to cluster scale.

    python tools/make_scale_replica.py SRC_SF_DIR OUT_DIR K

Replica design (deterministic, no RNG):

* Fact/entity keys shift by ``i * 10**8`` per replica i — far above
  any organic key and clear of the 10**7 fixture-injection id zone —
  CONSISTENTLY across referencing columns (o_custkey shifts with
  c_custkey, l_orderkey with o_orderkey, ...), so join hit rates and
  FK integrity survive the scale-up.
* ``region``/``nation`` stay 1x: true dimension tables grow slower
  than facts, and keeping them broadcast-sized is exactly the shape
  the 100 TB design assumes.
* ``documents.text``: replica i > 0 suffixes every (2 + i % 3)-th
  word with the replica index. This keeps replicas genuinely DISTINCT
  documents (word-3-gram Jaccard vs the source lands under the 0.2
  near-dup threshold; no byte-identical pairs), so dedup tiers see a
  10x corpus, not a pathological 10-clique per document. n_chars is
  recomputed.
* ``embeddings.embedding``: replica i > 0 flips the sign of a DENSE
  pseudorandom half of the dimensions (``xxhash64(dim, i)`` parity) —
  norms preserved, replica-vs-source and replica-vs-replica cosines
  concentrate near 0 with a ~5-sigma gap to the 0.95 near-dup bar
  (measured: 0 same-source pairs >= 0.95, max 0.766 at 10x). Sparse
  masks fail in the tail — see LOCAL_SCALE_r08.md "replica v2" for
  the two designs this replaced and the measurements that killed
  them. The similarity tiers get a Kx corpus of honest vectors.
* ``events``: ids shift; timestamps keep their range (a 10x-denser
  stream over the same window — the realistic scale-up for
  sessionization and watermarks).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

OFFSET = 10**8

#: key columns shifted per replica, per table (referential closure)
KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

DIMS = ("region", "nation")


def build(
    src: str, out: str, k: int, tables: list[str] | None = None,
    link_rest: str | None = None,
) -> None:
    from pyspark.sql import functions as F

    from cdc_kafka_project_spark.catalog import load_table
    from cdc_kafka_project_spark.schemas import TESTDATA_TABLES
    from cdc_kafka_project_spark.session import get_spark

    spark = get_spark("scale-replica")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)

    # At k=1000 (the r13 sf100 probe) a single k-branch union is a
    # 1000-deep logical plan — Catalyst analysis cost grows superlinearly
    # and deep unionByName chains risk analyzer stack exhaustion. Write
    # the union in <=CHUNK-branch plans appended to the same directory
    # instead: identical rows, bounded plan size; each chunk carries its
    # share of the output files so the file-count scales with k.
    CHUNK = 100

    def one_replica(base, name, cols, i):
        rep = base
        for c in KEYS[name]:
            rep = rep.withColumn(c, F.col(c) + F.lit(i * OFFSET))
        if name == "documents" and i > 0:
            step = 2 + i % 3
            rep = rep.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split(F.trim("text"), r"\s+"),
                        lambda w, p: F.when(
                            p % step == 0, F.concat(w, F.lit(str(i)))
                        ).otherwise(w),
                    ),
                    " ",
                ),
            ).withColumn("n_chars", F.length("text"))
        if name == "embeddings" and i > 0:
            # flip a DENSE pseudorandom half of the dimensions
            # (xxhash64(dim, replica) parity): ~32 of 64 dims per
            # replica, masks pairwise independent, so both
            # replica-vs-source and replica-vs-replica cosines
            # concentrate near 0 with a ~5-sigma gap to the 0.95
            # near-dup bar. The earlier sparse periodic mask
            # (every (i+2)-th dim) flipped as few as 6 dims for
            # high i, and whenever those dims carried little mass
            # the pair stayed near cos 1 — measured 241
            # same-source pairs >= 0.95 at 10x, which polluted
            # the near-dup/semdedup fixture contract and
            # inflated candidate volumes in the stress timings.
            rep = rep.withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, j: F.when(
                        F.xxhash64(j, F.lit(i)) % 2 == 0, -x
                    ).otherwise(x),
                ),
            )
        return rep.select(cols)

    for name in TESTDATA_TABLES:
        if tables is not None and name not in tables:
            # Partial replica (r14): replicate only the named tables at
            # this factor; the rest become SYMLINKS into ``link_rest``
            # (an existing replica dir) so loaders that eagerly read
            # every table's schema still work. Only valid for probes
            # whose query set never touches the linked tables — the
            # same shape the `_cd` events fixture validated.
            if link_rest:
                dst = os.path.join(out, f"{name}.parquet")
                src_tbl = os.path.abspath(
                    os.path.join(link_rest, f"{name}.parquet")
                )
                # lexists: os.path.exists() is False for an existing
                # BROKEN symlink, and os.symlink would then raise
                # FileExistsError; also fail fast on a typo'd
                # --link-rest instead of leaving dangling links that
                # only surface at read time.
                if not os.path.exists(src_tbl):
                    raise FileNotFoundError(
                        f"--link-rest target missing: {src_tbl}"
                    )
                if not os.path.lexists(dst):
                    os.symlink(src_tbl, dst)
                print(f"{name}: symlink -> {src_tbl}", flush=True)
            continue
        base = load_table(spark, src, name)
        cols = base.columns
        tmp = os.path.join(out, f"__tmp_{name}")
        if os.path.exists(tmp):
            import shutil

            shutil.rmtree(tmp)
        if name in DIMS:
            # a handful of similar-sized files per table: enough scan
            # parallelism without a small-file swarm
            base.repartition(1).write.mode("overwrite").parquet(tmp)
        else:
            for lo in range(0, k, CHUNK):
                chunk = list(range(lo, min(lo + CHUNK, k)))
                reps = one_replica(base, name, cols, chunk[0])
                for i in chunk[1:]:
                    reps = reps.unionByName(one_replica(base, name, cols, i))
                # 8 files per 100 replicas (the shape the 10x/100x
                # replicas validated), floor 1
                n_files = max(1, round(8 * len(chunk) / CHUNK))
                reps.repartition(n_files).write.mode("append").parquet(tmp)
        # flatten the directory dataset to <name>.parquet (a directory
        # is fine: spark.read.parquet and duckdb read_parquet both
        # accept it; keep the driver's naming contract)
        final = os.path.join(out, f"{name}.parquet")
        if os.path.exists(final):
            import shutil

            shutil.rmtree(final)
        os.rename(tmp, final)
        # count from the written files (re-counting the union plan
        # would re-execute the per-replica transforms a second time)
        n_total = spark.read.parquet(final).count()
        print(f"{name}: {n_total} rows -> {final}", flush=True)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    tables = None
    link_rest = None
    for a in sys.argv[1:]:
        if a.startswith("--tables="):
            tables = [t for t in a.split("=", 1)[1].split(",") if t]
        elif a.startswith("--link-rest="):
            link_rest = a.split("=", 1)[1]
    if len(args) != 3 or not os.path.isdir(args[0]):
        print(
            "usage: python tools/make_scale_replica.py SRC_SF_DIR OUT_DIR K"
            " [--tables=t1,t2 --link-rest=EXISTING_REPLICA_DIR]"
        )
        return 2
    build(args[0], args[1], int(args[2]), tables=tables,
          link_rest=link_rest)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
