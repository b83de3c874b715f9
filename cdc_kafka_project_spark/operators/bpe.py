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

#: Bounded-collect gate for driver-side training/segmentation — the
#: same contract as the k-means/PQ trainers (operators/similarity.py:
#: a documented <=100k-row driver read, never corpus-sized). BPE
#: state after the corpus collapse is |vocab| rows; below this bound
#: the per-round Spark jobs (pair-agg + argmax collect, x n_merges)
#: are pure scheduler overhead over a tiny table (measured 10.7 s for
#: 16 rounds over a 31-word vocab at sf0.1), so the rounds run on the
#: collected table instead. Above it, the distributed loop is the
#: scale path (a web-scale vocab is millions of rows).
_DRIVER_TRAIN_MAX_VOCAB = 100_000


def _train_bpe_driver(
    word_freqs: list[tuple[tuple[str, ...], int]], n_merges: int
) -> list[BpeMerge]:
    """The merge loop on the collected |vocab|-bounded table. Exactly
    the distributed semantics: overlapping adjacent-pair counts
    weighted by word frequency, argmax tiebreak (count DESC, left ASC,
    right ASC — Python str ordering == UTF8 binary collation, since
    UTF-8 byte order preserves code-point order), greedy left-to-right
    non-overlapping rewrite. Parity with the distributed loop is
    pinned in tests/test_bpe.py."""
    freq: dict[tuple[str, ...], int] = {}
    for sym, f in word_freqs:
        freq[sym] = freq.get(sym, 0) + f
    merges: list[BpeMerge] = []
    for rank in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, f in freq.items():
            for p in zip(sym, sym[1:]):
                pairs[p] = pairs.get(p, 0) + f
        if not pairs:
            break
        left, right = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        merges.append(BpeMerge(rank, left, right))
        merged = left + right
        new_freq: dict[tuple[str, ...], int] = {}
        for sym, f in freq.items():
            out: list[str] = []
            i, n = 0, len(sym)
            while i < n:
                if i + 1 < n and sym[i] == left and sym[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_freq[t] = new_freq.get(t, 0) + f
        freq = new_freq
    return merges


def _segment_word(word: str, merges: list[BpeMerge]) -> list[str]:
    """Driver twin of the chained :func:`_apply_merge` folds (greedy
    left-to-right, non-overlapping, merges in rank order)."""
    sym: list[str] = list(word)
    for m in merges:
        out: list[str] = []
        i, n = 0, len(sym)
        while i < n:
            if i + 1 < n and sym[i] == m.left and sym[i + 1] == m.right:
                out.append(m.merged)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    word_freqs: DataFrame | None = None,
    driver_max_vocab: int | None = None,
) -> list[BpeMerge]:
    """Learn ``n_merges`` BPE merge rules from the corpus. Stops early
    when no adjacent pair remains. Returns merges in learned order.

    ``word_freqs``: an already-MATERIALIZED ``word_freq_table`` frame
    (caller-scoped checkpoint) to train from instead of re-deriving it
    from ``docs`` — callers that also need the word table elsewhere
    (the apply tier's vocab segmentation) pass it so the corpus is
    scanned once for both uses. The caller keeps ownership; train_bpe
    never releases it.

    ``driver_max_vocab``: vocab-size gate for the driver-side merge
    loop (default ``_DRIVER_TRAIN_MAX_VOCAB``; pass 0 to force the
    distributed loop). The corpus pass and the |vocab| collapse are
    always distributed; only the per-round pair-count/argmax/rewrite
    runs on the collected table when it fits the bounded-collect
    contract — identical merges either way (tests/test_bpe.py pins
    both paths against the reference)."""
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
    gate = (
        _DRIVER_TRAIN_MAX_VOCAB
        if driver_max_vocab is None
        else driver_max_vocab
    )
    if n_vocab <= gate:
        rows = words.select("symbols", "freq").collect()
        if not caller_owned:
            cache.release_checkpoint(words)
        return _train_bpe_driver(
            [(tuple(r["symbols"]), r["freq"]) for r in rows], n_merges
        )
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
    from cdc_kafka_project_spark.functions import local_rows_df

    spark = docs.sparkSession
    merges = train_bpe(docs, n_merges, text_col)
    return local_rows_df(
        spark,
        [(m.rank, m.left, m.right, m.merged) for m in merges],
        "rank int, left string, right string, merged string",
    )


def bpe_vocab_table(
    docs: DataFrame,
    merges: list[BpeMerge],
    text_col: str = "text",
    words: DataFrame | None = None,
    driver_max_vocab: int | None = None,
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
    the corpus for the distinct-word pass. A MATERIALIZED words frame
    under ``driver_max_vocab`` (default ``_DRIVER_TRAIN_MAX_VOCAB``;
    0 forces the distributed folds) is segmented driver-side — the
    lookup table is |vocab|-bounded state, so below the bounded-collect
    gate one createDataFrame beats an n_merges-deep interpreted fold
    chain per row; both paths are parity-pinned in tests/test_bpe.py.
    """
    gate = (
        _DRIVER_TRAIN_MAX_VOCAB
        if driver_max_vocab is None
        else driver_max_vocab
    )
    if words is None:
        words = docs.select(
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("word")
        ).filter(F.col("word") != "").distinct()
        gate = 0  # corpus-derived: counting it would add a scan
    else:
        words = words.select("word")
    if gate and words.count() <= gate:
        seg: dict[str, list[str]] = {}
        rows = [r["word"] for r in words.collect()]
        for w in rows:
            if w not in seg:
                seg[w] = _segment_word(w, merges)
        from cdc_kafka_project_spark.functions import local_rows_df

        return local_rows_df(
            docs.sparkSession,
            [(w, seg[w], len(seg[w])) for w in rows],
            "word string, tokens array<string>, n_tokens int",
        )
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
