#!/usr/bin/env python
"""Replica-scale oracle checks with a STAGED DuckDB side (round-8
verdict item 3 / round-9 item 3).

Three registered oracles are single statements whose spill at the
30x/100x replicas exceeded the sandbox's free disk in round 8:
``pagerank_brand_copurchase`` (the distinct (order, brand) self-join
recomputed inside the unrolled rank CTEs) and ``dedup_components`` /
``dedup_near_keep`` (the word-3-gram shingle self-join feeding a
recursive CTE). The engine side completed everywhere; the limit was
purely DuckDB's one-pipeline spill.

This checker keeps the oracle INDEPENDENT — every relation is still
computed by DuckDB from the base parquet, never taken from Spark —
but materializes the fact-table-sized prefix as temp tables, so each
statement's spill is bounded by its own pipeline: the SQL analog of
"checkpoint the edge list, iterate on it", exactly the shape the
Spark side uses (graph.py persists ``e``; dedup.py checkpoints the
pair frame). The iteration / pair SQL is IMPORTED from the query
modules (``_pr_iteration_sql``, ``_PAIRS_SQL``) so the staged oracle
can never drift from the registered one.

    python tools/check_staged_oracles.py spark-warehouse/scale/sf3.0 [names...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")


def _connect(sf_dir: str, tables: tuple[str, ...]):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"SET memory_limit='{os.environ.get('SWEEP_DUCKDB_MEM', '24GB')}'"
    )
    # spill-disk cap, same rationale as check_correctness (r13): an
    # out-spilling staged oracle errors instead of filling the disk
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
    for t in tables:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _brand_basket(con) -> None:
    """Stage the distinct (order, brand) basket with the brand
    DICTIONARY-ENCODED to an int id (r15, the 1000x retry): at the
    sf100 replica the string-keyed ob temp table was the measured OOM
    (37.2 GiB at the temp cap, SWEEP_r14_1000x_b) — ~20 bytes of
    brand string per row where 4 suffice. ``bd`` (|brands| rows) maps
    ids back to strings for the tiny post-aggregation relations; the
    600M-row intermediates carry only int64+int32."""
    con.execute(
        """CREATE TEMP TABLE bd AS
           SELECT brand, CAST(row_number() OVER (ORDER BY brand) AS INTEGER)
                  AS bid
           FROM (SELECT DISTINCT p_brand AS brand FROM part)"""
    )
    con.execute(
        """CREATE TEMP TABLE ob AS
           SELECT DISTINCT l.l_orderkey AS okey, bd.bid
           FROM lineitem l
           JOIN part p ON l.l_partkey = p.p_partkey
           JOIN bd ON bd.brand = p.p_brand"""
    )


def _oracle_pagerank(sf_dir: str):
    from cdc_kafka_project_spark.queries.graph import (
        PR_ITERS,
        _pr_iteration_sql,
    )

    con = _connect(sf_dir, ("lineitem", "part"))
    _brand_basket(con)
    # the edge aggregate is |brands|^2 rows — decode ids back to brand
    # strings here so the iteration SQL (shared with the registered
    # oracle) sees the exact relations it expects
    con.execute(
        """CREATE TEMP TABLE e AS
           SELECT sa.brand AS src, sb.brand AS dst, w
           FROM (
               SELECT a.bid AS src_id, b.bid AS dst_id,
                      CAST(COUNT(*) AS BIGINT) AS w
               FROM ob a JOIN ob b ON a.okey = b.okey AND a.bid <> b.bid
               GROUP BY a.bid, b.bid
           ) JOIN bd sa ON sa.bid = src_id
             JOIN bd sb ON sb.bid = dst_id"""
    )
    con.execute(
        """CREATE TEMP TABLE nodes_t AS
           SELECT bd.brand FROM (SELECT DISTINCT bid FROM ob) n
           JOIN bd ON bd.bid = n.bid"""
    )  # from ob, not e: a brand with no co-purchase edge still ranks
    con.execute("DROP TABLE ob")
    con.execute(
        """CREATE TEMP TABLE wout AS
           SELECT src, CAST(SUM(w) AS BIGINT) AS wout FROM e GROUP BY src"""
    )
    return con.execute(
        f"""
        WITH nodes AS (SELECT brand FROM nodes_t),
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
        r0 AS (
            SELECT brand, floor(1.0 / nn.n * 1e6 + 0.5) / 1e6 AS r
            FROM nodes CROSS JOIN nn
        ),
        {",".join(_pr_iteration_sql(i) for i in range(1, PR_ITERS + 1))}
        SELECT brand, r AS pagerank FROM r{PR_ITERS} ORDER BY brand
        """
    ).df()


def _stage_shingle_inter(sf_dir: str):
    """Materialize the word-3-gram shingle set, per-doc sizes, and the
    pair-intersection counts — with the intersection self-join SHARDED
    by shingle-hash range (r15 verdict item 2).

    The r14 wall was DuckDB's SINGLE-STATEMENT string-shingle
    self-join + aggregation: its one pipeline's live spill hit the
    40/50 GB temp caps at the 300x replica (37.2/46.5 GiB OOM,
    SWEEP_r14_300x) while the engine side completed. Sharding fixes
    the spill profile, not the math: each shingle belongs to exactly
    one hash shard, so a pair's intersection count is the SUM of its
    per-shard partial counts — the INSERT loop bounds live spill to
    one shard's join (~1/N of the corpus) and frees it per statement,
    and the final combine is one hash agg over int64 triples. Same
    relational semantics as the registered single-statement oracle
    (dedup_ngram_jaccard / _PAIRS_SQL), still computed entirely by
    DuckDB from base parquet.

    Returns a connection holding ``sh-free`` temp tables
    ``sizes_t(doc_id, n_sh)`` and ``inter_f(doc_a, doc_b, n_inter)``.
    Shard count: SWEEP_JACCARD_SHARDS (default 16)."""
    n_shards = int(os.environ.get("SWEEP_JACCARD_SHARDS", "16"))
    con = _connect(sf_dir, ("documents",))
    con.execute(
        r"""CREATE TEMP TABLE sh_t AS
        WITH words AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
            FROM documents WHERE trim(text) <> ''
        )
        SELECT DISTINCT doc_id,
               ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
        FROM words, unnest(generate_series(1, len(ws) - 2)) AS t(i)
        WHERE len(ws) >= 3"""
    )
    con.execute(
        """CREATE TEMP TABLE sizes_t AS
           SELECT doc_id, COUNT(*) AS n_sh FROM sh_t GROUP BY doc_id"""
    )
    con.execute(
        """CREATE TEMP TABLE inter_part
           (doc_a BIGINT, doc_b BIGINT, n_inter BIGINT)"""
    )
    for s in range(n_shards):
        con.execute(
            f"""INSERT INTO inter_part
            SELECT a.doc_id, b.doc_id, CAST(COUNT(*) AS BIGINT)
            FROM (SELECT doc_id, shingle FROM sh_t
                  WHERE hash(shingle) % {n_shards} = {s}) a
            JOIN (SELECT doc_id, shingle FROM sh_t
                  WHERE hash(shingle) % {n_shards} = {s}) b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2"""
        )
    con.execute("DROP TABLE sh_t")
    con.execute(
        """CREATE TEMP TABLE inter_f AS
           SELECT doc_a, doc_b, CAST(SUM(n_inter) AS BIGINT) AS n_inter
           FROM inter_part GROUP BY doc_a, doc_b"""
    )
    con.execute("DROP TABLE inter_part")
    return con


def _stage_pairs(sf_dir: str):
    """Materialize the word-3-gram Jaccard edge set (the registered
    oracles' _PAIRS_SQL semantics) as a temp table, via the sharded
    intersection builder."""
    con = _stage_shingle_inter(sf_dir)
    con.execute(
        """CREATE TEMP TABLE pairs_t AS
           SELECT i.doc_a, i.doc_b
           FROM inter_f i
           JOIN sizes_t sa ON sa.doc_id = i.doc_a
           JOIN sizes_t sb ON sb.doc_id = i.doc_b
           WHERE i.n_inter
                 / CAST(sa.n_sh + sb.n_sh - i.n_inter AS DOUBLE) >= 0.2"""
    )
    con.execute("DROP TABLE inter_f")
    return con


def _oracle_ngram_jaccard(sf_dir: str):
    """Staged twin of the registered dedup_ngram_jaccard oracle: same
    jaccard expression over the sharded intersection tables."""
    con = _stage_shingle_inter(sf_dir)
    return con.execute(
        """SELECT i.doc_a, i.doc_b,
                  i.n_inter
                  / CAST(sa.n_sh + sb.n_sh - i.n_inter AS DOUBLE) AS jaccard
           FROM inter_f i
           JOIN sizes_t sa ON sa.doc_id = i.doc_a
           JOIN sizes_t sb ON sb.doc_id = i.doc_b
           WHERE i.n_inter
                 / CAST(sa.n_sh + sb.n_sh - i.n_inter AS DOUBLE) >= 0.2"""
    ).df()


def _oracle_levenshtein_verify(sf_dir: str):
    """Staged twin of dedup_levenshtein_verify: candidate pairs from
    the sharded builder, then the identical length-bound prefilter +
    levenshtein verify expression as the registered oracle."""
    con = _stage_pairs(sf_dir)
    return con.execute(
        r"""SELECT doc_a, doc_b, edit_distance,
               floor((raw_sim) * 1e6 + 0.5) / 1e6 AS edit_similarity
        FROM (
            SELECT c.doc_a, c.doc_b,
                   CAST(levenshtein(ta.text, tb.text) AS BIGINT)
                       AS edit_distance,
                   1.0 - levenshtein(ta.text, tb.text)
                       / CAST(greatest(length(ta.text), length(tb.text), 1)
                              AS DOUBLE) AS raw_sim
            FROM pairs_t c JOIN documents ta ON ta.doc_id = c.doc_a
                           JOIN documents tb ON tb.doc_id = c.doc_b
            WHERE 1.0 - abs(length(ta.text) - length(tb.text))
                      / CAST(greatest(length(ta.text), length(tb.text), 1)
                             AS DOUBLE) >= 0.5
        ) WHERE raw_sim >= 0.5"""
    ).df()


_RECURSE = """
    WITH RECURSIVE
    bi AS (
        SELECT doc_a AS s, doc_b AS d FROM pairs_t
        UNION ALL SELECT doc_b, doc_a FROM pairs_t
    ),
    nodes AS (SELECT DISTINCT s FROM bi),
    reach(src, dst) AS (
        SELECT s, s FROM nodes
        UNION
        SELECT r.src, b.d FROM reach r JOIN bi b ON b.s = r.dst
    )
"""


def _oracle_components(sf_dir: str):
    con = _stage_pairs(sf_dir)
    return con.execute(
        _RECURSE
        + """
        SELECT src AS doc_id, CAST(MIN(dst) AS BIGINT) AS component
        FROM reach GROUP BY src
        """
    ).df()


def _oracle_near_keep(sf_dir: str):
    con = _stage_pairs(sf_dir)
    return con.execute(
        _RECURSE
        + """,
        comp AS (SELECT src, MIN(dst) AS component FROM reach GROUP BY src)
        SELECT d.doc_id FROM documents d
        WHERE d.doc_id NOT IN (SELECT src FROM comp WHERE src <> component)
        """
    ).df()


def _oracle_brand_lift(sf_dir: str):
    from cdc_kafka_project_spark.queries.relational_ext import (
        MIN_COPURCHASE_SUPPORT,
    )

    con = _connect(sf_dir, ("lineitem", "part"))
    _brand_basket(con)
    # bd orders bid by brand string, so `a.bid < b.bid` == the
    # registered oracle's `a.brand < b.brand` pair orientation
    return con.execute(
        f"""
        WITH n AS (SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n_orders
                   FROM ob),
        cb AS (
            SELECT bid, CAST(COUNT(*) AS BIGINT) AS c FROM ob GROUP BY bid
        ),
        pairs AS (
            SELECT a.bid AS bid_a, b.bid AS bid_b,
                   CAST(COUNT(*) AS BIGINT) AS c_ab
            FROM ob a JOIN ob b ON a.okey = b.okey AND a.bid < b.bid
            GROUP BY a.bid, b.bid
        )
        SELECT ba.brand AS brand_a, bb.brand AS brand_b, c_ab,
               floor(CAST(c_ab AS DOUBLE) * n.n_orders
                     / (ca.c * cb2.c) * 1e6 + 0.5) / 1e6 AS lift
        FROM pairs
        JOIN cb ca ON ca.bid = pairs.bid_a
        JOIN cb cb2 ON cb2.bid = pairs.bid_b
        JOIN bd ba ON ba.bid = pairs.bid_a
        JOIN bd bb ON bb.bid = pairs.bid_b
        CROSS JOIN n
        WHERE c_ab >= {MIN_COPURCHASE_SUPPORT}
        """
    ).df()


STAGED = {
    "pagerank_brand_copurchase": _oracle_pagerank,
    "brand_copurchase_lift": _oracle_brand_lift,
    "dedup_components": _oracle_components,
    "dedup_near_keep": _oracle_near_keep,
    # r15: the exact-Jaccard family's single-statement oracle was the
    # measured >=300x wall (SWEEP_r14_300x); the sharded builder
    # bounds per-statement spill so these two get two-engine rows at
    # the 300x tier (dedup_components/dedup_near_keep inherit the
    # sharded _stage_pairs above).
    "dedup_ngram_jaccard": _oracle_ngram_jaccard,
    "dedup_levenshtein_verify": _oracle_levenshtein_verify,
}


def main() -> int:
    from cdc_kafka_project_spark.registry import all_queries
    from cdc_kafka_project_spark.session import get_spark
    from tools.check_correctness import normalize

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(STAGED)
    unknown = [n for n in names if n not in STAGED]
    if unknown:
        print(f"error: no staged oracle for {unknown}; have {list(STAGED)}")
        return 2

    spark = get_spark("check-staged-oracles")
    queries = all_queries()
    rc = 0
    # same replica-scale disk discipline as check_correctness (r14):
    # with the flag set, stop the JVM after the engine rows are
    # collected so its retained shuffle files don't starve the staged
    # oracle's spill; lazily recreate for the next name.
    stop_before_oracle = (
        os.environ.get("SWEEP_STOP_SPARK_BEFORE_ORACLE") == "1"
    )
    for name in names:
        t0 = time.time()
        if spark is None:
            spark = get_spark("check-staged-oracles")
        # The engine side must not take down the whole process: an
        # unhandled Spark error here skipped every remaining staged
        # name (r14: the first 1000x staged run died on a spill-disk
        # exhaustion in name 1 and names 2-4 never printed a verdict).
        try:
            sdf = queries[name](spark, sf_dir).toPandas()
        except Exception as e:
            # str(e) on a Py4JJavaError round-trips to the JVM — on a
            # dead gateway THAT raises too and takes the process down
            # (observed at the 300x staged tier); format defensively.
            try:
                first = str(e).splitlines()[0] if str(e) else ""
            except Exception:
                first = "<unprintable: JVM gateway down>"
            print(f"FAIL  {name}[staged]: spark raised "
                  f"{type(e).__name__}: {first or type(e).__name__}")
            rc = 1
            continue
        finally:
            try:
                spark.catalog.clearCache()
            except Exception:
                pass
            try:
                # stop() in its own try: a clearCache() failure (dead
                # gateway) must not leave the old JVM lingering with
                # its /dev/shm shuffle files — the very contention
                # SWEEP_STOP_SPARK_BEFORE_ORACLE exists to prevent.
                if stop_before_oracle:
                    spark.stop()
                    spark = None
            except Exception:
                spark = None  # next name recreates the session
        t_spark = time.time() - t0
        try:
            odf = STAGED[name](sf_dir)
        except Exception as e:
            print(f"FAIL  {name}[staged]: duckdb raised {type(e).__name__}: {e}")
            rc = 1
            continue
        scols, srows = normalize(sdf)
        ocols, orows = normalize(odf)
        if scols != ocols:
            print(f"FAIL  {name}[staged]: columns {scols} != {ocols}")
            rc = 1
        elif len(srows) != len(orows):
            print(f"FAIL  {name}[staged]: rowcount {len(srows)} != {len(orows)}")
            rc = 1
        elif srows != orows:
            diffs = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            print(f"FAIL  {name}[staged]: values differ; first: {diffs}")
            rc = 1
        else:
            print(
                f"PASS  {name}[staged]: {len(srows)} rows "
                f"[spark {t_spark:.1f}s, total {time.time()-t0:.1f}s]"
            )
    return rc


if __name__ == "__main__":
    sys.exit(main())
