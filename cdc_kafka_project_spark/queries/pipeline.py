"""The curation pipeline END-TO-END as one declarative plan.

Every stage below is an already-oracle-proven operator; this module
registers their composition — the thing a user actually runs nightly:

    raw corpus
      -> holdout split (eval set kept aside)
      -> quality gate           (C4/Gopher-style heuristics)
      -> normalized exact dedup (canonical-form digest groups)
      -> decontamination        (word-4-gram overlap vs eval)
      -> train/val/test assignment (portable md5 buckets)

Composability is the point: Catalyst sees ONE logical plan — filters
merge into the scan, stage boundaries cost nothing by themselves, and
the whole pipeline remains a hash-checkable pure function of the
corpus. The oracle rebuilds the identical pipeline as a single DuckDB
CTE chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from cdc_kafka_project_spark.catalog import load_table
from cdc_kafka_project_spark.functions import spread
from cdc_kafka_project_spark.operators import dedup as dd
from cdc_kafka_project_spark.operators import text as text_ops
from cdc_kafka_project_spark.queries.dedup import _DECON_N, _DECON_SETUP
from cdc_kafka_project_spark.queries.text_analysis import _STOPS_SQL
from cdc_kafka_project_spark.registry import query

_QUALITY_KEEP_SQL = rf"""
    (CASE WHEN n_tok < 5 THEN 'too_few_tokens'
          WHEN alpha / greatest(n_chars, 1) < 0.5 THEN 'low_alpha_ratio'
          WHEN nonspace / CAST(n_tok AS DOUBLE) > 15.0 THEN 'long_tokens'
          WHEN stop_hits / CAST(n_tok AS DOUBLE) < 0.02
              THEN 'low_stopword_ratio'
     END) IS NULL
"""

_PIPELINE_ORACLE = rf"""
    WITH {_DECON_SETUP},
    qstats AS (
        SELECT doc_id, source, text,
               length(text) AS n_chars,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tok,
               length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
               length(text) - length(regexp_replace(text, '[^ ]', '', 'g'))
                   AS nonspace,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(list_filter(
                        list_transform(regexp_split_to_array(trim(text), '\s+'),
                                       x -> lower(x)),
                        x -> x IN ({_STOPS_SQL}))) END AS stop_hits
        FROM train
    ),
    q AS (SELECT doc_id, source, text FROM qstats WHERE {_QUALITY_KEEP_SQL}),
    k AS (
        SELECT doc_id, source, text FROM (
            SELECT q.*, row_number() OVER (
                PARTITION BY md5(trim(regexp_replace(lower(text),
                                      '[^\p{{L}}\p{{N}}]+', ' ', 'g')))
                ORDER BY doc_id) AS rn
            FROM q
        ) WHERE rn = 1
    ),
    ksh AS (SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ws) - {_DECON_N} + 2),
                      i -> array_to_string(ws[i : i + {_DECON_N} - 1], ' ')))
               AS shingle
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
              FROM k WHERE trim(text) <> ''))),
    khits AS (SELECT DISTINCT doc_id FROM ksh
              WHERE shingle IN (SELECT shingle FROM esh)),
    final AS (SELECT doc_id, source FROM k
              WHERE doc_id NOT IN (SELECT doc_id FROM khits))
    SELECT doc_id, source,
           CASE WHEN substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc'
                THEN 'train'
                WHEN substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
                THEN 'val'
                ELSE 'test' END AS split
    FROM final
"""


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query("curation_pipeline", oracle=_PIPELINE_ORACLE)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full corpus-curation pipeline as one plan: holdout split ->
    quality gate -> normalized exact dedup (min doc_id representative)
    -> eval decontamination -> portable 80/10/10 split assignment.
    Output: the surviving training corpus with split labels.

    Scale shape: the quality gate and normalization are scan-fused
    projections; dedup shuffles digests; decontamination broadcasts the
    (tiny) eval shingle set; split assignment is map-only. One corpus
    scan feeds the gate+dedup leg, one more the shingle leg — nothing
    quadratic, nothing driver-side.
    """
    df, _ = build_curation_pipeline(spark, sf_dir)
    return df


def build_curation_pipeline(
    spark: SparkSession, sf_dir: str, observed: bool = False
):
    """Build the pipeline plan; with ``observed=True`` attach an
    ``Observation`` after each stage (rows flowing through that point),
    returning ``(df, {stage: Observation})``.

    observe() rides the existing plan — per-stage row counts cost ZERO
    extra scans or actions, which is the only monitoring discipline
    that survives 100 TB (re-running ``.count()`` per stage would
    quadruple the I/O). Metrics materialize when the caller's one
    action runs.
    """
    from pyspark.sql import Observation

    obs: dict[str, Observation] = {}

    def tap(df: DataFrame, stage: str) -> DataFrame:
        if not observed:
            return df
        obs[stage] = Observation(stage)
        return df.observe(obs[stage], F.count(F.lit(1)).alias("rows"))

    docs = _t(spark, sf_dir, "documents")
    train = tap(spread(docs).filter(F.col("doc_id") % 97 != 0), "input")
    ev = docs.filter(F.col("doc_id") % 97 == 0)

    # The gate is the predicate itself (quality_reason_expr), fused
    # into the corpus scan — same move as the streaming twin
    # (streaming/curation.py). The earlier join-back against
    # quality_filter's doc_id list re-scanned the corpus and became a
    # full sort-merge self-join once the keep list outgrew the
    # broadcast threshold (observed live at the 100x replica).
    reason, _ = text_ops.quality_reason_expr("text")
    q = tap(train.filter(reason.isNull()), "quality_gate")

    w = Window.partitionBy(
        F.md5(dd.normalize_for_dedup(F.col("text")))
    ).orderBy("doc_id")
    k = tap(
        q.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn"),
        "dedup",
    )

    # one-pass decontamination (r11): the narrow output columns ride
    # the shingle explode and the eval shingles LEFT-broadcast-join in,
    # so the gate + dedup window + shingle leg all fuse over ONE train
    # scan — 2 executed scans of documents total (train leg + the tiny
    # filter-pushed eval leg), down from 3 (the anti-join shape
    # re-derived the train leg for the output pass)
    clean = tap(
        dd.decontaminate(k, ev, n=_DECON_N, keep_cols=("source",)),
        "decontaminate",
    )
    out = text_ops.hash_split_portable(
        clean, "doc_id", {"train": 8, "val": 1, "test": 1}
    ).select("doc_id", "source", "split")
    return out, obs


FUNNEL_MIN_CHARS = 100


@query(
    "curation_funnel_report",
    oracle=f"""
    WITH nonempty AS (
        SELECT doc_id, text, n_chars FROM documents WHERE trim(text) <> ''
    ),
    longdocs AS (
        SELECT * FROM nonempty WHERE n_chars >= {FUNNEL_MIN_CHARS}
    ),
    survivors AS (
        SELECT MIN(doc_id) AS doc_id FROM longdocs GROUP BY md5(trim(text))
    ),
    funnel AS (
        SELECT 1 AS stage_idx, 'raw' AS stage,
               CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
        UNION ALL
        SELECT 2, 'nonempty', CAST(COUNT(*) AS BIGINT) FROM nonempty
        UNION ALL
        SELECT 3, 'min_chars_{FUNNEL_MIN_CHARS}', CAST(COUNT(*) AS BIGINT)
        FROM longdocs
        UNION ALL
        SELECT 4, 'exact_dedup', CAST(COUNT(*) AS BIGINT) FROM survivors
    ),
    raw AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_raw FROM documents)
    SELECT stage_idx, stage, n_docs,
           floor(CAST(n_docs AS DOUBLE) / n_raw * 1e6 + 0.5) / 1e6
               AS pct_of_raw
    FROM funnel CROSS JOIN raw
    ORDER BY stage_idx
    """,
)
def curation_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation funnel monitoring: document counts surviving each gate
    (raw → nonempty → length floor → exact dedup), with share-of-raw —
    the per-run data card every large-scale curation job emits next to
    its output (a stage suddenly dropping 40% is how pipeline
    regressions get caught). The monitoring twin of
    `curation_pipeline`, which hash-checks the surviving ROWS.

    Scan discipline (r11): ONE executed scan of documents, down from
    4 — every stage count is a conditional aggregate over the same
    pass (the gates are nested predicates, so stage k's condition is
    stage k-1's AND one more term), and the dedup stage is a
    count(DISTINCT digest) restricted to the surviving rows. The 4-row
    report then unpivots from the single aggregate row via a literal
    stack, with share-of-raw computed against the same row's raw
    count — no second scan for the denominator.
    """
    docs = load_table(spark, sf_dir, "documents")
    is_nonempty = F.trim("text") != ""
    is_long = is_nonempty & (F.col("n_chars") >= FUNNEL_MIN_CHARS)
    counts = docs.select(
        is_nonempty.alias("__ne"),
        is_long.alias("__lg"),
        F.when(is_long, F.md5(F.trim("text"))).alias("__fp"),
    ).agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.count(F.when(F.col("__ne"), 1)).alias("n_nonempty"),
        F.count(F.when(F.col("__lg"), 1)).alias("n_long"),
        F.countDistinct("__fp").alias("n_dedup"),
    )
    funnel = counts.select(
        F.expr(
            f"""stack(4,
              1, 'raw',                        n_raw,
              2, 'nonempty',                   n_nonempty,
              3, 'min_chars_{FUNNEL_MIN_CHARS}', n_long,
              4, 'exact_dedup',                n_dedup)
              AS (stage_idx, stage, n_docs)"""
        ),
        F.col("n_raw").cast("double").alias("__n_raw"),
    )
    return funnel.select(
        "stage_idx",
        "stage",
        "n_docs",
        (
            F.floor(
                F.col("n_docs").cast("double") / F.col("__n_raw") * 1e6
                + F.lit(0.5)
            )
            / 1e6
        ).alias("pct_of_raw"),
    ).orderBy("stage_idx")
