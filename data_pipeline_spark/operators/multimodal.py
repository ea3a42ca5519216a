"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference's heavy binary payloads are Zarr chunk objects / GeoTIFF bytes
moved and transformed per record (scripts/ingest_v1_s1_rtc.py:160-220,
scripts/convert_v1_s2.py:51-181). Engine shape here:

* media lives in a ``binary`` column next to typed metadata columns;
* decode / feature-extract run as Arrow-batched ``mapInPandas`` — each
  Python batch is a pandas DataFrame of N rows whose payload cells are raw
  ``bytes`` (the real batch shape a PIL/ffmpeg decode would consume);
* partitioning: feature extraction is a narrow map — no shuffle; a
  downstream groupBy on (kind) is the only exchange.

Real codecs (PIL / soundfile / av) are NOT in this container, so
``decode_real`` is a clearly-marked stub; the deterministic fake codec
(``MEDIA_MAGIC`` header + utf-8 body, struct-packed) keeps the Spark-side
plumbing — schema, UDF signatures, Arrow batch handling — real and tested,
with an exact SQL oracle derived from the generating formula.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

MEDIA_MAGIC = 0x4D  # 'M'
KINDS = ("image", "audio", "video")

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "width int, height int, declared_len int"
)

# Built from type objects, not DDL: fromDDL needs an active SparkSession,
# and this module must import session-free (driver contract import order).
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("body_md5", T.StringType()),
    ]
)


def media_dims(doc_id_col: str = "doc_id") -> tuple[str, str]:
    """The deterministic generating formulas (shared with the SQL oracle)."""
    return (
        f"CAST(64 + ({doc_id_col} % 640) AS INT)",
        f"CAST(48 + ({doc_id_col} % 480) AS INT)",
    )


@pandas_udf(T.BinaryType())
def encode_media(doc_id: pd.Series, text: pd.Series) -> pd.Series:
    """Pack the fake media container: 1B magic, 1B kind, 2×u16 dims (BE),
    4B body length, then the utf-8 body. Deterministic per (doc_id, text)."""
    out = []
    for i, t in zip(doc_id, text):
        body = (t or "").encode("utf-8")
        kind = int(i) % 3
        w = 64 + int(i) % 640
        h = 48 + int(i) % 480
        out.append(struct.pack(">BBHHI", 0x4D, kind, w, h, len(body)) + body)
    return pd.Series(out)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the media table from ``documents`` (deterministic)."""
    # The encode/parse UDFs live in this package — Python workers must be
    # able to import it regardless of the driver's cwd (the driver harness
    # runs queries from its own session/cwd).
    from data_pipeline_spark.session import ship_package

    ship_package(spark)
    w, h = media_dims("doc_id")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int")).alias("kind"),
        encode_media("doc_id", "text").alias("payload"),
        F.expr(w).alias("width"),
        F.expr(h).alias("height"),
        F.length("text").cast("int").alias("declared_len"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Parse every payload header + checksum the body via mapInPandas.

    Narrow transformation: runs on the scan partitioning, Arrow-batched,
    no shuffle. The body md5 proves the bytes survived the round trip.
    """

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                b = bytes(payload)
                magic, kind_b, w, h, blen = struct.unpack(">BBHHI", b[:10])
                if magic != MEDIA_MAGIC:
                    raise ValueError(f"bad media magic for media_id={mid}")
                body = b[10 : 10 + blen]
                rows.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "byte_len": len(b),
                        "width": w,
                        "height": h,
                        "body_md5": hashlib.md5(body).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA])

    return media.select("media_id", "kind", "payload").mapInPandas(
        parse, FEATURE_SCHEMA
    )


try:  # optional codec dependency — absent in this container
    import PIL.Image  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("orig_width", T.IntegerType()),
        T.StructField("orig_height", T.IntegerType()),
        T.StructField("thumb_w", T.IntegerType()),
        T.StructField("thumb_h", T.IntegerType()),
        T.StructField("thumb_md5", T.StringType()),
    ]
)


def decode_real(
    media: DataFrame, thumb: tuple[int, int] = (8, 8)
) -> DataFrame:
    """True codec decode for image payloads: PIL-open the body bytes,
    grayscale, resize to ``thumb`` (nearest — deterministic across PIL
    versions), emit dimensions + an md5 over the raw thumbnail pixels.

    Wired behind an optional dependency: the mapInPandas plumbing
    (schema, Arrow batching, narrow no-shuffle shape — identical to
    extract_features) is real and runs wherever Pillow is installed
    (test: tests/test_multimodal_decode.py, skip-marked when absent);
    in codec-less environments calling it raises NotImplementedError
    up front instead of failing executor-side.

    Audio/video decode would follow the same template with
    soundfile/av; payload framing is already codec-agnostic (opaque
    body bytes behind the typed header).

    Reference analog: raster decode + COG re-encode per item
    (scripts/convert_v1_s2.py:51-181)."""
    if not HAS_PIL:
        raise NotImplementedError(
            "real media decode requires Pillow, which is not installed "
            "here; the codec-free plumbing path is extract_features()"
        )
    tw, th = thumb

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from PIL import Image

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                magic, _k, _w, _h, blen = struct.unpack(">BBHHI", b[:10])
                if magic != MEDIA_MAGIC:
                    raise ValueError(f"bad media magic for media_id={mid}")
                img = Image.open(io.BytesIO(b[10 : 10 + blen]))
                ow, oh = img.size
                small = img.convert("L").resize((tw, th), Image.NEAREST)
                rows.append(
                    {
                        "media_id": mid,
                        "orig_width": ow,
                        "orig_height": oh,
                        "thumb_w": tw,
                        "thumb_h": th,
                        "thumb_md5": hashlib.md5(small.tobytes()).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in DECODE_SCHEMA]
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(run, DECODE_SCHEMA)
    )


def features_oracle_sql(docs_rel: str = "documents") -> str:
    """DuckDB oracle: recompute every feature from the generating formula.

    byte_len = 10-byte header + utf-8 body; md5 of the body equals
    DuckDB's md5 over the same string (utf-8 both sides)."""
    return f"""
        SELECT doc_id AS media_id,
               ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
               CAST(10 + octet_length(encode(text)) AS INT) AS byte_len,
               CAST(64 + (doc_id % 640) AS INT) AS width,
               CAST(48 + (doc_id % 480) AS INT) AS height,
               md5(text) AS body_md5
        FROM {docs_rel}
    """
