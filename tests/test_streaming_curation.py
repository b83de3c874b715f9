"""Streaming curation: the batch gate/dedup/decon semantics under
readStream, with watermark-bounded dedup state and per-micro-batch
decontamination."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from cdc_kafka_project_spark.streaming.curation import run_streaming_curation

SCHEMA = "doc_id long, text string, ingest_ts timestamp"

GOOD = (
    "the quick brown fox jumps over the lazy dog and then the dog "
    "sleeps for a while in the sun with the cat"
)
GOOD2 = (
    "a completely different story about the sea and the ships that "
    "sail on it every day with the wind in their sails"
)
JUNK = "xxxx1234!!!"  # fails the gate (too few tokens / no stopwords)
CONTAMINATED = (
    "this text quotes the held out benchmark answer verbatim so it "
    "must be removed from the training corpus before it leaks"
)


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m, 0)


def test_streaming_curation_gates_dedups_and_decontaminates(spark, tmp_path):
    src = tmp_path / "docs"
    src.mkdir()
    work = str(tmp_path / "work")

    eval_docs = spark.createDataFrame(
        [(9001, CONTAMINATED)], "doc_id long, text string"
    )

    batch1 = [
        (1, GOOD, _ts(0)),
        (2, JUNK, _ts(1)),          # gated out
        (3, GOOD, _ts(2)),          # duplicate of 1 -> deduped
        (4, CONTAMINATED + " extra words to pass the quality gate with "
            "the usual stopwords in them", _ts(3)),  # decontaminated
    ]
    spark.createDataFrame(batch1, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    run_streaming_curation(
        spark, str(src), SCHEMA, work, eval_docs=eval_docs, watermark="10 minutes"
    )
    got1 = {
        r.doc_id for r in spark.read.parquet(work + "/curated").collect()
    }
    assert got1 == {1}

    # batch 2: a replayed duplicate INSIDE the watermark horizon stays
    # suppressed; a genuinely new doc passes
    batch2 = [
        (5, GOOD, _ts(4)),          # dup of 1, within horizon -> dropped
        (6, GOOD2, _ts(5)),
    ]
    spark.createDataFrame(batch2, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    run_streaming_curation(
        spark, str(src), SCHEMA, work, eval_docs=eval_docs, watermark="10 minutes"
    )
    got2 = {
        r.doc_id for r in spark.read.parquet(work + "/curated").collect()
    }
    assert got2 == {1, 6}


def test_incremental_dedup_stream_unbounded_horizon(spark, tmp_path):
    """Digest-table-backed incremental dedup: duplicates are dropped
    across SEPARATE runs (no watermark horizon — the digest table is
    the state), within-batch dups collapse to min id, and a replayed
    epoch overwrites instead of double-appending."""
    import os

    from cdc_kafka_project_spark.streaming.curation import (
        incremental_dedup_batch,
        run_incremental_dedup_stream,
    )

    schema = "doc_id long, text string"
    src = str(tmp_path / "src")
    work = str(tmp_path / "work")
    os.makedirs(src)

    spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    run_incremental_dedup_stream(
        spark, src, spark.createDataFrame([], schema).schema, work
    )
    uniq = lambda: sorted(  # noqa: E731
        r.doc_id for r in spark.read.parquet(f"{work}/unique").collect()
    )
    assert uniq() == [1, 2]          # within-batch dup 3 collapsed

    # second run, new arrivals: 'alpha' seen in a PREVIOUS run drops
    spark.createDataFrame(
        [(10, "alpha"), (11, "gamma")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    run_incremental_dedup_stream(
        spark, src, spark.createDataFrame([], schema).schema, work
    )
    assert uniq() == [1, 2, 11]

    # replayed epoch: same epoch id twice -> same output (overwrite)
    batch = spark.createDataFrame([(20, "delta")], schema)
    incremental_dedup_batch(
        spark, batch, 99, f"{work}/unique", f"{work}/digests"
    )
    incremental_dedup_batch(
        spark, batch, 99, f"{work}/unique", f"{work}/digests"
    )
    assert uniq() == [1, 2, 11, 20]
    n_digests = spark.read.parquet(f"{work}/digests").count()
    assert n_digests == 4            # alpha, beta, gamma, delta — no dups


def test_observed_pipeline_metrics_ride_the_single_action(spark):
    """observe() instrumentation: per-stage row counts arrive with the
    one action (no extra scans) and their arithmetic is consistent."""
    from tests.conftest import SF_SMOKE
    from cdc_kafka_project_spark.queries.pipeline import (
        build_curation_pipeline,
    )

    df, obs = build_curation_pipeline(spark, SF_SMOKE, observed=True)
    n_out = df.count()  # the single action
    m = {k: o.get["rows"] for k, o in obs.items()}
    assert set(m) == {"input", "quality_gate", "dedup", "decontaminate"}
    assert m["input"] >= m["quality_gate"] >= m["dedup"] >= m["decontaminate"]
    assert m["decontaminate"] == n_out  # split assignment is 1:1
    assert m["input"] > 0
