"""Distributed BPE (byte-pair-encoding) vocabulary induction.

Tokenizer training is the one corpus-scale job every LLM data pipeline
runs exactly once per dataset and no SQL engine offers: learn the top-K
merge rules from token-pair statistics. The classic formulation
(Sennrich et al. 2016, public) is inherently iterative — one merge per
round — but each round is cheap when framed Spark-first:

* The corpus collapses ONCE to its distinct-word frequency table
  (|vocab| rows, not |tokens|) — at 100 TB of text that's the only
  pass over the data; every BPE round after it touches just the word
  table (a few million rows at web scale).
* A round = one map-side pair explode + one hash-agg shuffle over
  symbol pairs + a 1-row driver read (the argmax merge — the same
  bounded-collect contract as the k-means/PQ trainers), then a pure
  higher-order-function rewrite of the symbol arrays (zero shuffle).
* The word table is re-persisted each round so round N+1's plan reads
  a materialized table instead of re-deriving N rounds of lambda
  rewrites (linear, not exponential, lineage).

Determinism: argmax ties break by (count DESC, left ASC, right ASC);
no RNG anywhere, so the merge table is reproducible bit-for-bit on any
cluster layout (partition-independence is pinned in tests/test_bpe.py
against a pure-Python reference implementation).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from cdc_kafka_project_spark import cache

__all__ = [
    "BpeMerge",
    "word_freq_table",
    "train_bpe",
    "bpe_merge_table",
    "bpe_vocab_table",
    "bpe_token_counts",
]


@dataclass(frozen=True)
class BpeMerge:
    rank: int
    left: str
    right: str

    @property
    def merged(self) -> str:
        return self.left + self.right


def word_freq_table(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Corpus -> (symbols: array<string>, freq: long), one row per
    DISTINCT lowercased whitespace word, symbols = its characters.

    This is the single full-corpus pass; its one shuffle groups by the
    word itself (bounded by vocabulary size thereafter).
    """
    words = docs.select(
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(F.split("word", "").alias("symbols"), "freq")
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """Weighted adjacent-symbol-pair counts: map-side explode of
    |word|-1 pairs per word row, one hash-agg shuffle on the pair."""
    # sequence(1, n-1) needs n >= 2 (sequence's default step is -1 when
    # stop < start, so a 1-symbol word would explode to junk indexes)
    pairs = words.filter(F.size("symbols") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(symbols) - 1),"
                " i -> struct(symbols[i-1] AS left, symbols[i] AS right))"
            )
        ).alias("p"),
        "freq",
    )
    return pairs.groupBy("p.left", "p.right").agg(F.sum("freq").alias("n"))


def _apply_merge(left: str, right: str, col: str = "symbols"):
    """Column expression applying ONE merge rule greedily
    left-to-right inside a symbol array: fold carrying the previous
    unmerged symbol; emit the merged token when (prev, current)
    matches. Built with the Python lambda API so the rule arrives as
    JVM literals (no SQL-string splicing, no quoting bugs, and no
    per-round broadcast-join job for a 1-row rule table)."""
    lv, rv, merged = F.lit(left), F.lit(right), F.lit(left + right)
    empty = F.array().cast("array<string>")
    nul = F.lit(None).cast("string")

    def flush(acc):
        return F.when(acc["prev"].isNull(), acc["res"]).otherwise(
            F.concat(acc["res"], F.array(acc["prev"]))
        )

    def step(acc, x):
        return F.when(
            acc["prev"].eqNullSafe(lv) & (x == rv),
            F.struct(
                F.concat(acc["res"], F.array(merged)).alias("res"),
                nul.alias("prev"),
            ),
        ).otherwise(F.struct(flush(acc).alias("res"), x.alias("prev")))

    return F.aggregate(
        F.col(col),
        F.struct(empty.alias("res"), nul.alias("prev")),
        step,
        flush,
    )


#: truncate lineage every K rounds: within a window the un-checkpointed
#: rewrite chain re-evaluates per argmax (cheap — it runs on the
#: |vocab|-row table), while checkpointing each round costs a fixed
#: extra job x n_merges, which dominates small corpora.
_CHECKPOINT_EVERY = 6


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    word_freqs: DataFrame | None = None,
) -> list[BpeMerge]:
    """Learn ``n_merges`` BPE merge rules from the corpus. Stops early
    when no adjacent pair remains. Returns merges in learned order.

    ``word_freqs``: an already-MATERIALIZED ``word_freq_table`` frame
    (caller-scoped checkpoint) to train from instead of re-deriving it
    from ``docs`` — callers that also need the word table elsewhere
    (the apply tier's vocab segmentation) pass it so the corpus is
    scanned once for both uses. The caller keeps ownership; train_bpe
    never releases it."""
    spark = docs.sparkSession
    # localCheckpoint, not persist: caching materializes the DATA but
    # the logical plan keeps its full lineage, so round N's analysis /
    # optimization cost compounds over N nested lambda rewrites and the
    # loop grinds to a halt around rank ~15. Checkpointing truncates
    # the plan itself — every round starts from a leaf. All checkpoints
    # go through cache.scoped_localcheckpoint (deterministic release);
    # superseded loop states are freed immediately — at most one live
    # word-table checkpoint at any time, regardless of n_merges.
    caller_owned = word_freqs is not None
    if caller_owned:
        # accept a (word, freq) artifact (the shareable shape — the
        # vocab segmentation tier needs the word string); the symbol
        # split is a cheap projection over the materialized frame
        words = (
            word_freqs
            if "symbols" in word_freqs.columns
            else word_freqs.select(
                F.split("word", "").alias("symbols"), "freq"
            )
        )
    else:
        words = cache.scoped_localcheckpoint(word_freq_table(docs, text_col))
    # Right-size the loop's parallelism to the STATE size, not the
    # corpus size: after the collapse to distinct words the table is
    # |vocab| rows, and running every round's rewrite + pair-agg at
    # full shuffle width just buys scheduler latency x n_merges. ~25k
    # words per partition keeps a web-scale vocab (millions of words)
    # wide while a small corpus degrades gracefully to a few tasks.
    n_vocab = words.count()
    parts = max(2, min(int(spark.conf.get("spark.sql.shuffle.partitions")),
                       n_vocab // 25_000 + 1))
    prev = words
    words = cache.scoped_localcheckpoint(words.coalesce(parts))
    if not caller_owned:
        cache.release_checkpoint(prev)  # rematerialized at `parts` width
    last_ck = words
    merges: list[BpeMerge] = []
    for rank in range(n_merges):
        top = (
            _pair_counts(words)
            .orderBy(F.col("n").desc(), F.col("left"), F.col("right"))
            .limit(1)
            .collect()  # bounded 1-row driver read per round
        )
        if not top:
            break
        m = BpeMerge(rank, top[0]["left"], top[0]["right"])
        merges.append(m)
        words = words.select(
            _apply_merge(m.left, m.right).alias("symbols"), "freq"
        )
        if (rank + 1) % _CHECKPOINT_EVERY == 0:
            words = cache.scoped_localcheckpoint(words)
            cache.release_checkpoint(last_ck)
            last_ck = words
    cache.release_checkpoint(last_ck)  # merges are driver-side now
    return merges


def bpe_merge_table(
    docs: DataFrame, n_merges: int, text_col: str = "text"
) -> DataFrame:
    """The learned merge rules as a DataFrame:
    (rank int, left string, right string, merged string)."""
    spark = docs.sparkSession
    merges = train_bpe(docs, n_merges, text_col)
    return spark.createDataFrame(
        [(m.rank, m.left, m.right, m.merged) for m in merges],
        "rank int, left string, right string, merged string",
    )


def bpe_vocab_table(
    docs: DataFrame,
    merges: list[BpeMerge],
    text_col: str = "text",
    words: DataFrame | None = None,
) -> DataFrame:
    """(word, tokens array<string>, n_tokens) for every distinct corpus
    word under the learned merges — the segmentation LOOKUP TABLE.

    Applying a trained tokenizer at corpus scale is a join problem,
    not a per-row recompute problem: segment each DISTINCT word once
    (chained merge folds over |vocab| rows — cheap), then let every
    downstream use broadcast-join the table. 100 TB of text re-uses a
    vocab-sized artifact instead of running n_merges folds per token
    occurrence.

    ``words``: an optional materialized distinct-word frame (any frame
    with a ``word`` column, e.g. the training word_freq_table) — pass
    it to segment from the existing artifact instead of re-scanning
    the corpus for the distinct-word pass.
    """
    if words is None:
        words = docs.select(
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("word")
        ).filter(F.col("word") != "").distinct()
    else:
        words = words.select("word")
    out = words.withColumn("tokens", F.split("word", ""))
    for m in merges:
        out = out.withColumn(
            "tokens", _apply_merge(m.left, m.right, col="tokens")
        )
    return out.withColumn("n_tokens", F.size("tokens"))


def bpe_token_counts(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_word_count: bool = False,
) -> DataFrame:
    """Per-document BPE token count + chars-per-token compression:
    explode to words (map-side), broadcast-join the segmentation
    table, one partial-agg shuffle on the doc id.

    ``with_word_count`` adds ``n_words`` (whitespace word count) from
    the SAME aggregation — the explode already enumerates every word
    occurrence, so callers that need it avoid a second corpus scan."""
    words = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    joined = words.join(
        F.broadcast(vocab.select("word", "n_tokens")), "word"
    )
    aggs = [
        F.sum("n_tokens").alias("n_bpe_tokens"),
        F.sum(F.length("word")).alias("n_word_chars"),
    ]
    if with_word_count:
        aggs.append(F.count(F.lit(1)).alias("n_words"))
    per_doc = joined.groupBy(id_col).agg(*aggs)
    extra = ["n_words"] if with_word_count else []
    return per_doc.select(
        id_col,
        "n_bpe_tokens",
        "n_word_chars",
        *extra,
        (F.col("n_word_chars").cast("double") / F.col("n_bpe_tokens"))
        .alias("chars_per_token"),
    )
