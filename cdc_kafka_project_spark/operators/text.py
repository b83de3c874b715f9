"""Text analysis for training-data pipelines (north-star extension).

Everything is built-in column expressions (JVM-side, codegen'd): a
100 TB corpus scan must not cross into Python per row. The operators:

* tokenization + token counting (whitespace and regex/BPE-ish)
* quality scoring (length / punctuation / stopword ratios)
* language ID (stopword-hit heuristic over a broadcast lexicon)
* document fingerprinting (xxhash64 content hash; rolling-hash
  shingles live in operators/dedup.py)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from cdc_kafka_project_spark.functions import token_count, tokens

#: Tiny per-language function-word lexicons for the language-ID
#: heuristic. Deliberately small + lowercase; real deployments swap in a
#: proper lexicon (or an n-gram model) without changing the plan shape.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es": ("el", "la", "de", "y", "que", "en", "un", "una", "es", "por"),
    "fr": ("le", "la", "de", "et", "que", "en", "un", "une", "est", "pour"),
    "de": ("der", "die", "das", "und", "zu", "in", "ist", "ein", "eine", "mit"),
    "zh": ("的", "了", "是", "在", "我", "有", "和", "就", "不", "人"),
}

#: BPE-ish tokenizer regex: letter runs, digit runs, or single
#: non-alphanumeric-non-space marks. Kept to portable character classes
#: (Java regex on Spark, RE2-ish on DuckDB) so oracles agree.
WORDISH_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def regex_token_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(WORDISH_RE), 0)).cast("long")


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality stats: lengths, token counts, ratios.

    One projection over the scan; every expression is codegen'd.
    """
    c = F.col(text_col)
    n_chars = F.length(c).cast("long")
    n_tok = token_count(c)
    alpha_chars = F.length(F.regexp_replace(c, "[^A-Za-z]", "")).cast("long")
    space_chars = F.length(F.regexp_replace(c, "[^ ]", "")).cast("long")
    avg_token_len = F.when(n_tok > 0, (n_chars - space_chars) / n_tok).otherwise(
        F.lit(None).cast("double")
    )
    return df.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        alpha_chars.alias("n_alpha_chars"),
        (alpha_chars / F.greatest(n_chars, F.lit(1))).alias("alpha_ratio"),
        avg_token_len.alias("avg_token_len"),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax over per-language stopword hits.

    Explode tokens once, join a broadcast lexicon (a few dozen rows),
    count hits per (doc, lang), argmax with a deterministic tie-break
    (hit count desc, lang asc), default 'und' when nothing matched.
    Scales as one explode + broadcast join + two light aggregations.
    """
    spark = df.sparkSession
    lex = spark.createDataFrame(
        [(lang, w) for lang, ws in STOPWORDS.items() for w in ws],
        "cand_lang string, word string",
    )
    from cdc_kafka_project_spark.functions import spread

    tok = (
        spread(df.select("doc_id", F.col(text_col)))
        .select("doc_id", F.explode(tokens(text_col)).alias("word"))
        .withColumn("word", F.lower("word"))
    )
    hits = (
        tok.join(F.broadcast(lex), "word")
        .groupBy("doc_id", "cand_lang")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("hits").desc(), F.col("cand_lang").asc()
    )
    ranked = hits.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return df.select("doc_id").join(
        ranked.select("doc_id", F.col("cand_lang").alias("pred_lang")),
        "doc_id",
        "left",
    ).fillna({"pred_lang": "und"})


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit content fingerprint (xxhash64 of the normalized text).

    Exact-dup detection at 100 TB groups on this 8-byte hash instead of
    shuffling full document bodies; collision probability at 10^12 docs
    is ~1e-5 (birthday bound), acceptable for dedup candidate pruning —
    the exact path confirms with a full-text equality check.
    """
    c = F.trim(F.col(text_col))
    return df.select(
        "doc_id", F.xxhash64(c).alias("fp64"), F.md5(c).alias("fp_md5")
    )
