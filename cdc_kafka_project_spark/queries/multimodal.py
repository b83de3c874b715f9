"""Multimodal queries over the derived media table (north-star
extension; see operators/multimodal.py).

Every query here crosses a mapInPandas (Arrow-batched Python) stage,
and every one is still DuckDB-oracle-checked: the deterministic fake
decode is byte arithmetic an ANSI engine reproduces with
ord()/substr()/list functions. That pins down the *plumbing* —
schemas, fanout, filters, batch iteration — which is exactly what a
real-codec deployment reuses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_kafka_project_spark.catalog import load_table
from cdc_kafka_project_spark.functions import spread
from cdc_kafka_project_spark.operators import multimodal as mm
from cdc_kafka_project_spark.registry import query

#: DuckDB fragment deriving the media table from documents — the SQL
#: twin of operators/multimodal.media_from_documents. The testdata text
#: is pure ASCII, so byte arithmetic == char arithmetic.
_MEDIA_CTE = """
media AS (
    SELECT doc_id AS media_id,
           (['image', 'audio', 'video'])[(doc_id % 3) + 1] AS kind,
           text,
           length(text) AS n,
           list_transform(string_split(text, ''), x -> ord(x)) AS ords
    FROM documents
)
"""


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # one exchange so Python workers run on every core even when the
    # local input is a single parquet file
    return mm.media_from_documents(spread(docs))


@query(
    "media_catalog",
    oracle="""
    WITH media AS (
        SELECT doc_id AS media_id,
               (['image', 'audio', 'video'])[(doc_id % 3) + 1] AS kind,
               length(text) AS n
        FROM documents
    )
    SELECT media_id, kind,
           CAST(16 + (media_id % 16) * 8 AS INT) AS width,
           CAST(16 + (media_id % 9) * 8 AS INT) AS height,
           CAST((media_id % 5 + 1) * 1000 AS BIGINT) AS duration_ms,
           CAST(n AS BIGINT) AS n_bytes
    FROM media
    """,
)
def media_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The media table itself: typed metadata + payload size (no Python
    stage — metadata scans must not decode payloads)."""
    return _media(spark, sf_dir).select(
        "media_id",
        "kind",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.duration_ms").alias("duration_ms"),
        F.length("payload").cast("long").alias("n_bytes"),
    )


@query(
    "media_decode_features",
    oracle=f"""
    WITH {_MEDIA_CTE}
    SELECT media_id, kind,
           CAST(n AS BIGINT) AS n_bytes,
           CAST(coalesce(list_sum(ords), 0) AS BIGINT) AS byte_sum,
           CASE WHEN n > 0 THEN coalesce(list_sum(ords), 0) / CAST(n AS DOUBLE)
                ELSE 0.0 END AS byte_mean,
           CAST(coalesce(list_min(ords), 0) AS INT) AS byte_min,
           CAST(coalesce(list_max(ords), 0) AS INT) AS byte_max
    FROM media
    """,
)
def media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + per-item byte statistics through Arrow-batched
    mapInPandas (deterministic fake decode)."""
    return mm.decode_features(_media(spark, sf_dir))


@query(
    "media_resize",
    oracle=f"""
    WITH {_MEDIA_CTE}
    SELECT media_id,
           CAST(8 AS INT) AS out_w, CAST(8 AS INT) AS out_h,
           CAST(CASE WHEN n = 0 THEN 0 ELSE 64 END AS BIGINT) AS n_bytes,
           CAST(CASE
                WHEN n = 0 THEN 0
                WHEN n = 1 THEN 64 * ords[1]
                ELSE list_sum(list_transform(range(0, 64),
                              i -> ords[(i * (n - 1) // 63) + 1]))
           END AS BIGINT) AS byte_sum
    FROM media WHERE kind = 'image'
    """,
)
def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbour resize of image payloads to 8x8 via
    mapInPandas (binary in -> binary out plumbing)."""
    return mm.resize_image(_media(spark, sf_dir), out_w=8, out_h=8)


@query(
    "media_frame_sample",
    oracle=f"""
    WITH {_MEDIA_CTE},
    f AS (
        SELECT media_id, n, ords,
               unnest(range(0, CAST((n + 63) // 64 AS BIGINT), 2)) AS fi
        FROM media WHERE kind = 'video'
    )
    SELECT media_id,
           CAST(fi AS INT) AS frame_idx,
           CAST(fi * 100 AS BIGINT) AS ts_ms,
           CAST(least(64, n - fi * 64) AS BIGINT) AS n_bytes,
           CAST(coalesce(list_sum(ords[fi * 64 + 1 : least((fi + 1) * 64, n)]), 0)
                AS BIGINT) AS byte_sum
    FROM f
    """,
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-2nd-frame sampling from video payloads — mapInPandas
    fanout (one row in, many frames out) with presentation timestamps."""
    return mm.frame_sample(_media(spark, sf_dir), frame_bytes=64, every=2, fps=10)


@query(
    "media_audio_features",
    oracle=f"""
    WITH {_MEDIA_CTE}
    SELECT media_id,
           CAST((n + 63) // 64 AS INT) AS n_windows,
           CASE WHEN n = 0 THEN 0.0
                ELSE sqrt(list_sum(list_transform(ords, x -> CAST(x AS DOUBLE) * x))
                          / CAST(n AS DOUBLE)) END AS rms
    FROM media WHERE kind = 'audio'
    """,
)
def media_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio feature extraction (window count + RMS; the
    array<double> window means are exercised in tests — the oracle
    checks the scalar aggregates)."""
    return mm.audio_features(_media(spark, sf_dir), window=64).select(
        "media_id", "n_windows", "rms"
    )


@query(
    "media_phash_dup_pairs",
    oracle=f"""
    WITH {_MEDIA_CTE},
    media_plus AS (
        SELECT media_id, kind, n, ords FROM media
        UNION ALL
        SELECT -media_id - 1, kind, n, ords
        FROM media WHERE kind = 'image' AND media_id < 18
    ),
    rz AS (
        SELECT media_id,
               CASE
                   WHEN n = 0 THEN list_transform(range(0, 64), i -> 0)
                   WHEN n = 1 THEN list_transform(range(0, 64), i -> ords[1])
                   ELSE list_transform(range(0, 64),
                                       i -> ords[(i * (n - 1) // 63) + 1])
               END AS r
        FROM media_plus WHERE kind = 'image'
    ),
    bands AS (
        SELECT media_id,
               list_transform(range(0, 4), j ->
                   CAST(list_sum(list_transform(range(j * 16, (j + 1) * 16),
                       i -> CASE WHEN r[i + 1] * 64 > list_sum(r)
                                 THEN 1 << (i - j * 16) ELSE 0 END))
                        AS INT)) AS bs
        FROM rz
    ),
    longb AS (
        SELECT media_id, j AS band_idx, bs[j + 1] AS val
        FROM bands, unnest(range(0, 4)) AS t(j)
    ),
    cand AS (
        SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b
        FROM longb a JOIN longb b
          ON a.band_idx = b.band_idx AND a.val = b.val
         AND a.media_id < b.media_id
    )
    SELECT c.media_a, c.media_b,
           CAST(bit_count(xor(ba.bs[1], bb.bs[1]))
              + bit_count(xor(ba.bs[2], bb.bs[2]))
              + bit_count(xor(ba.bs[3], bb.bs[3]))
              + bit_count(xor(ba.bs[4], bb.bs[4])) AS BIGINT) AS hamming
    FROM cand c JOIN bands ba ON ba.media_id = c.media_a
                JOIN bands bb ON bb.media_id = c.media_b
    WHERE bit_count(xor(ba.bs[1], bb.bs[1]))
        + bit_count(xor(ba.bs[2], bb.bs[2]))
        + bit_count(xor(ba.bs[3], bb.bs[3]))
        + bit_count(xor(ba.bs[4], bb.bs[4])) <= 3
    """,
)
def media_phash_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate image pairs: aHash over the
    8x8 fake-decode (bit = pixel strictly above mean, integer-exact),
    4x16-bit bands for the candidate equi-join, exact bit_count verify
    at Hamming <= 3 — provably complete at that bound (a pair within
    Hamming 3 shares at least one untouched band; pigeonhole). The
    multimodal member of the dedup family; a real-codec deployment
    changes only the decode.

    The corpus carries no byte-identical images, so fixture prep
    re-emits the first 6 images under negative ids (-media_id - 1,
    the collision-free fixture-injection scheme, oracle-mirrored) —
    each copy must
    surface as a Hamming-0 pair, making the driver row exercise a real
    match path instead of an empty result."""
    media = _media(spark, sf_dir)
    dups = media.filter(
        (F.col("kind") == "image") & (F.col("media_id") < 18)
    ).withColumn("media_id", -F.col("media_id") - F.lit(1))
    return mm.phash_dup_pairs(
        mm.phash_bands(media.unionByName(dups)), max_hamming=3
    )
