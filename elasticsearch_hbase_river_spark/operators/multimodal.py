"""Multimodal-column operators (SURVEY.md §2.3 E9 + BASELINE.json north
star: "multimodal columns ... designed for 100 TB scale").

Pattern: media travel as opaque ``binary`` payload columns next to typed
metadata; per-modality transforms (decode / feature-extract / resize /
frame-sample) run as Arrow-batched ``mapInPandas`` so the JVM<->Python
boundary is crossed per BATCH, never per row. The actual image/audio codecs
are not available in this environment, so the decode step is a clearly
marked deterministic stand-in behind ``_decode_payload`` (swap in PIL/ffmpeg
there); everything Spark-side — schema, batch iteration, partitioning — is
real and is what matters at 100 TB.

All three queries are oracle-checked: the decode/framesample stand-ins are
deterministic byte arithmetic, which DuckDB reproduces via get_bit over the
payload blob (see ORACLES below). With a real codec (``STRICT_DECODE``)
those two revert to rows-only checks.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType, LongType, StringType, StructField, StructType,
)

from elasticsearch_hbase_river_spark.sources.tables import load_table

#: Set True when a real codec (PIL / torchaudio / pyav) is installed; the
#: stub then raises instead of faking, so misuse is loud.
STRICT_DECODE = False


def multimodal_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A unified multimodal relation: one row per asset with payload bytes +
    typed metadata. Text payloads are real; image/audio rows reuse the same
    bytes as stand-in payloads with distinct modality tags."""
    docs = load_table(spark, sf_dir, "documents")
    text = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("text").alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
        F.to_json(F.struct("lang", "source")).alias("meta"),
    )
    image = docs.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 1_000_000_000).alias("asset_id"),
        F.lit("image").alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
        F.to_json(F.struct("lang", "source")).alias("meta"),
    )
    video = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 2_000_000_000).alias("asset_id"),
        F.lit("video").alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
        F.to_json(F.struct("lang", "source")).alias("meta"),
    )
    return text.unionByName(image).unionByName(video)


def q_multimodal_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema/side-by-side demo: per-asset modality + payload byte length
    over the union of text docs and embedding vectors (binary + vector
    columns coexisting in one relation)."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    text = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("text").alias("modality"),
        F.octet_length("text").cast("long").alias("n_bytes"),
    )
    vec = emb.select(
        F.col("vec_id").alias("asset_id"),
        F.lit("embedding").alias("modality"),
        (F.size("embedding") * 4).cast("long").alias("n_bytes"),  # float32
    )
    return text.unionByName(vec)


#: Python-UDF fan-out: enough partitions that Arrow batches decode in
#: parallel, few enough that per-worker spin-up doesn't dominate (measured
#: at sf0.1: 3 parts 4.7s, 32 parts 3.3s, 8 parts 0.8s).
_PY_PARTS = 8


def _fan_for_python(df: DataFrame) -> DataFrame:
    """Repartition UP to the Python-worker sweet spot; on a real cluster
    inputs already exceed it and this is a no-op.

    Parallelism is estimated from the scan's file list (`inputFiles` —
    public API, no plan side effects) rather than `df.rdd.getNumPartitions()`,
    which forces an RDD conversion plan just to read a number. Files
    undercount splits for large files, so the check can only err toward
    fanning out — harmless next to the Python decode cost it feeds."""
    if len(df.inputFiles()) < _PY_PARTS:
        return df.repartition(_PY_PARTS)
    return df


_DECODE_SCHEMA = StructType([
    StructField("asset_id", LongType()),
    StructField("modality", StringType()),
    StructField("n_bytes", LongType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("n_channels", LongType()),
    StructField("decode_ok", BooleanType()),
])


def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract pass over the multimodal frame via
    ``mapInPandas`` (rows-only check — Pandas UDF is not SQL-expressible).

    The batch fn is a CLOSURE (not a module-level function) so cloudpickle
    ships it by value — Python workers do not have this package on their
    sys.path when the driver loads it from a file path.
    """
    strict = STRICT_DECODE

    def decode_payload(payload: bytes, modality: str) -> tuple[int, int, int]:
        # STUB codec. Real systems plug PIL/ffmpeg here; this deterministic
        # stand-in derives fake dimensions from the payload.
        if strict:
            raise NotImplementedError("no media codecs in this environment")
        if not payload:
            return (0, 0, 0)
        w = 64 + payload[0] % 192
        h = 64 + payload[-1] % 192
        c = 3 if modality == "image" else 1
        return (w, h, c)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Arrow-batched: one Python call per batch, never per row.
        for pdf in batches:
            dims = [decode_payload(p, m)
                    for p, m in zip(pdf["payload"], pdf["modality"])]
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "modality": pdf["modality"],
                "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                "width": [d[0] for d in dims],
                "height": [d[1] for d in dims],
                "n_channels": [d[2] for d in dims],
                "decode_ok": [d != (0, 0, 0) for d in dims],
            })

    return _fan_for_python(multimodal_frame(spark, sf_dir)).mapInPandas(
        decode_batches, schema=_DECODE_SCHEMA)


_FRAME_SCHEMA = StructType([
    StructField("asset_id", LongType()),
    StructField("frame_idx", LongType()),
    StructField("frame_ts_ms", LongType()),
    StructField("frame_bytes", LongType()),
])

FRAMES_PER_VIDEO = 4


def q_media_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over the video modality via ``mapInPandas``: each
    video asset fans out to FRAMES_PER_VIDEO evenly-spaced frame rows (a
    1→N Arrow-batched generator — the shape a real ffmpeg sampler has).
    The fake 'duration' and per-frame payload slices are derived
    deterministically from the payload; swap a real demuxer into
    ``sample_frames``. Rows-only check (Pandas-UDF path)."""
    strict = STRICT_DECODE
    k = FRAMES_PER_VIDEO

    def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "frame_idx": [], "frame_ts_ms": [],
                   "frame_bytes": []}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                if strict:
                    raise NotImplementedError(
                        "no media codecs in this environment")
                n = len(payload) if payload is not None else 0
                duration_ms = 1000 * (1 + n % 60)  # fake demux
                for i in range(k):
                    out["asset_id"].append(aid)
                    out["frame_idx"].append(i)
                    out["frame_ts_ms"].append(i * duration_ms // k)
                    out["frame_bytes"].append(max(n // k, 1))
            yield pd.DataFrame(out)

    vids = multimodal_frame(spark, sf_dir).filter(F.col("modality") == "video")
    return _fan_for_python(vids).mapInPandas(sample_frames, schema=_FRAME_SCHEMA)


QUERIES = {
    "q_multimodal_schema": q_multimodal_schema,
    "q_media_decode": q_media_decode,
    "q_media_framesample": q_media_framesample,
}

# The decode stub is deterministic byte arithmetic (first/last payload byte
# + octet length), so it IS SQL-expressible: DuckDB reads individual payload
# bytes via get_bit over the blob's bit view. A real codec swap flips
# STRICT_DECODE and retires these two oracles to rows-only checks.
_FRAME_SQL = """
  SELECT doc_id AS asset_id, 'text' AS modality, encode(text) AS payload
  FROM documents
  UNION ALL
  SELECT doc_id + 1000000000, 'image', encode(text)
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + 2000000000, 'video', encode(text)
  FROM documents WHERE doc_id % 5 = 0
"""


def _byte_at_sql(bit_offset_expr: str) -> str:
    """SQL for one payload byte as an integer: 8 get_bit reads, MSB first."""
    return ("list_sum(list_transform(range(0, 8), i -> "
            f"get_bit(payload::BIT, CAST({bit_offset_expr} + i AS INTEGER))"
            " * (1 << CAST(7 - i AS INTEGER))))")


ORACLES = {
    "q_multimodal_schema": """
SELECT doc_id AS asset_id, 'text' AS modality,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents
UNION ALL
SELECT vec_id, 'embedding', CAST(len(embedding) * 4 AS BIGINT)
FROM embeddings""",

    "q_media_decode": f"""
WITH frame AS ({_FRAME_SQL}),
b AS (
  SELECT asset_id, modality,
         CAST(octet_length(payload) AS BIGINT) AS n_bytes,
         {_byte_at_sql('0')} AS b0,
         {_byte_at_sql('8 * (octet_length(payload) - 1)')} AS bn
  FROM frame)
SELECT asset_id, modality, n_bytes,
       CAST(CASE WHEN n_bytes = 0 THEN 0 ELSE 64 + b0 % 192 END AS BIGINT)
         AS width,
       CAST(CASE WHEN n_bytes = 0 THEN 0 ELSE 64 + bn % 192 END AS BIGINT)
         AS height,
       CAST(CASE WHEN n_bytes = 0 THEN 0
                 WHEN modality = 'image' THEN 3 ELSE 1 END AS BIGINT)
         AS n_channels,
       n_bytes > 0 AS decode_ok
FROM b""",

    "q_media_framesample": f"""
WITH vids AS (
  SELECT doc_id + 2000000000 AS asset_id,
         octet_length(encode(text)) AS n
  FROM documents WHERE doc_id % 5 = 0)
SELECT asset_id,
       CAST(i AS BIGINT) AS frame_idx,
       CAST(i * (1000 * (1 + n % 60)) // {FRAMES_PER_VIDEO} AS BIGINT)
         AS frame_ts_ms,
       CAST(greatest(n // {FRAMES_PER_VIDEO}, 1) AS BIGINT) AS frame_bytes
FROM vids, (SELECT unnest(range(0, {FRAMES_PER_VIDEO})) AS i)""",
}
