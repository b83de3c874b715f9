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
