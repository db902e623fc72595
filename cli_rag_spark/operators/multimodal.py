"""E11 — multimodal columns (image/audio/video as opaque binary).

North-star extension (no analog in the reference, which is text-only).
Design: payloads are ``BinaryType`` columns + a typed metadata struct;
all per-payload compute is Arrow-batched ``mapInPandas``. The decode
step itself (PIL/ffmpeg/torchaudio) is STUBBED — those libraries are
not in this container — behind ``decoder=`` hooks; the Spark-side
plumbing (schema, batching, partition sizing) is real and tested with
the deterministic fake decoder.

Scale notes: binary payloads make rows wide — the operators here
never shuffle payload bytes. Metadata extraction projects payload →
small struct in a map stage; anything that must group (e.g. per-format
stats) groups on the extracted metadata, not the bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# magic-byte sniffing table (public file signatures)
_MAGIC = [
    (b"\xff\xd8\xff", "jpeg"),
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"GIF8", "gif"),
    (b"RIFF", "riff"),  # wav/avi container
    (b"ID3", "mp3"),
    (b"\x00\x00\x00", "mp4ish"),
]


def attach_binary_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap JVM-side metadata: byte length, md5, sniffed format.
    No Python, no shuffle."""
    p = F.col(payload_col)
    fmt = F.lit("unknown")
    for magic, name in reversed(_MAGIC):
        hexpfx = magic.hex()
        fmt = F.when(
            F.startswith(F.hex(p), F.lit(hexpfx.upper())), F.lit(name)
        ).otherwise(fmt)
    return df.withColumn(
        "meta",
        F.struct(
            F.length(p).cast("long").alias("n_bytes"),
            F.md5(p).alias("digest"),
            fmt.alias("format"),
        ),
    )


def fake_decode_image(payload: bytes) -> dict:
    """Deterministic stand-in for a real image decoder: derives
    (width, height, mode) from the payload digest. Replace with a PIL
    decoder in environments that have one."""
    h = hashlib.md5(payload).digest()
    return {
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "mode": ["RGB", "RGBA", "L"][h[2] % 3],
    }


def decode_images(
    df: DataFrame,
    payload_col: str = "payload",
    decoder: Callable[[bytes], dict] | None = None,
) -> DataFrame:
    """payload → (width, height, mode) via Arrow-batched mapInPandas.

    ``decoder=None`` raises at plan *execution* time with a clear
    message unless the deterministic fake is requested explicitly —
    the plumbing is real; the pixel decode needs PIL/cv2.
    """
    if decoder is None:
        def decoder(_: bytes) -> dict:
            raise NotImplementedError(
                "real image decode needs PIL/cv2 (not in this container); "
                "pass decoder=fake_decode_image for the deterministic stub"
            )
    from cli_rag_spark.deploy import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)
    out_schema = StructType(
        df.schema.fields
        + [
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("mode", StringType()),
        ]
    )
    in_cols = [f.name for f in df.schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decoder(bytes(b)) for b in pdf[payload_col]]
            out = pdf[in_cols].copy()
            out["width"] = [d["width"] for d in decoded]
            out["height"] = [d["height"] for d in decoded]
            out["mode"] = [d["mode"] for d in decoded]
            yield out

    return df.mapInPandas(run, schema=out_schema)


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    dim: int = 8,
) -> DataFrame:
    """Deterministic byte-level feature vector (md5-seeded) — the
    plumbing shape of a real embed-image stage: binary in, fixed-dim
    array<double> out, Arrow batches, no shuffle."""
    from cli_rag_spark.deploy import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)
    out_schema = StructType(
        df.schema.fields + [StructField("features", ArrayType(DoubleType()))]
    )
    in_cols = [f.name for f in df.schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def feats(b: bytes) -> list[float]:
            out = []
            for i in range(dim):
                h = hashlib.md5(bytes([i]) + b).digest()
                out.append(int.from_bytes(h[:4], "little") / 2**32 - 0.5)
            return out

        for pdf in batches:
            out = pdf[in_cols].copy()
            out["features"] = [feats(bytes(b)) for b in pdf[payload_col]]
            yield out

    return df.mapInPandas(run, schema=out_schema)


def fake_resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for a real resampler: a digest-derived
    pseudo-payload of width*height//64 bytes. Replace with
    PIL.Image.resize where available; the Spark-side contract
    (binary in → binary out, size metadata updated) is what's real."""
    h = hashlib.md5(b"%dx%d:" % (width, height) + payload).digest()
    n = max(1, width * height // 64)
    return (h * (n // len(h) + 1))[:n]


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """payload → resized payload + (width, height) metadata via
    Arrow-batched mapInPandas; same stub contract as
    :func:`decode_images`."""
    if resizer is None:
        def resizer(_b: bytes, _w: int, _h: int) -> bytes:
            raise NotImplementedError(
                "real image resize needs PIL/cv2 (not in this container); "
                "pass resizer=fake_resize_image for the deterministic stub"
            )
    from cli_rag_spark.deploy import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)
    out_schema = StructType(
        df.schema.fields
        + [
            StructField("resized", BinaryType()),
            StructField("out_width", IntegerType()),
            StructField("out_height", IntegerType()),
        ]
    )
    in_cols = [f.name for f in df.schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[in_cols].copy()
            out["resized"] = [resizer(bytes(b), width, height) for b in pdf[payload_col]]
            out["out_width"] = width
            out["out_height"] = height
            yield out

    return df.mapInPandas(run, schema=out_schema)


def fake_decode_audio(payload: bytes) -> dict:
    """Deterministic stand-in for a real audio decoder (torchaudio/
    ffmpeg): derives (sample_rate, channels, duration_sec) from the
    payload digest. Replace with a real decoder where available."""
    h = hashlib.md5(b"audio:" + payload).digest()
    return {
        "sample_rate": [8000, 16000, 44100, 48000][h[0] % 4],
        "channels": 1 + h[1] % 2,
        "duration_sec": round(0.5 + (int.from_bytes(h[2:4], "little") % 3000) / 100.0, 2),
    }


def decode_audio(
    df: DataFrame,
    payload_col: str = "payload",
    decoder: Callable[[bytes], dict] | None = None,
) -> DataFrame:
    """payload → (sample_rate, channels, duration_sec) via
    Arrow-batched mapInPandas; same plumbing contract as
    :func:`decode_images` (stub by default, real decoder swaps in)."""
    if decoder is None:
        def decoder(_: bytes) -> dict:
            raise NotImplementedError(
                "real audio decode needs torchaudio/ffmpeg (not in this "
                "container); pass decoder=fake_decode_audio for the stub"
            )
    from cli_rag_spark.deploy import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)
    out_schema = StructType(
        df.schema.fields
        + [
            StructField("sample_rate", IntegerType()),
            StructField("channels", IntegerType()),
            StructField("duration_sec", DoubleType()),
        ]
    )
    in_cols = [f.name for f in df.schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decoder(bytes(b)) for b in pdf[payload_col]]
            out = pdf[in_cols].copy()
            out["sample_rate"] = [d["sample_rate"] for d in decoded]
            out["channels"] = [d["channels"] for d in decoded]
            out["duration_sec"] = [d["duration_sec"] for d in decoded]
            yield out

    return df.mapInPandas(run, schema=out_schema)


def audio_window_plan(
    df: DataFrame,
    window_bytes: int = 256,
    hop_bytes: int = 128,
    payload_col: str = "payload",
) -> DataFrame:
    """Overlapping fixed-size windows over a binary payload — the STFT
    / feature-frame shape of an audio pipeline, entirely JVM-side
    (sequence + explode + substr, no Python). One row per (payload,
    window); a payload shorter than one window yields exactly one
    window covering what exists.

    ``win_offset`` is the byte offset, ``win_bytes`` the bytes the
    window actually covers (= window_bytes except at the tail)."""
    if hop_bytes <= 0 or window_bytes <= 0:
        raise ValueError("window_bytes and hop_bytes must be positive")
    p = F.col(payload_col)
    n = F.length(p).cast("long")
    offsets = F.sequence(
        F.lit(0).cast("long"),
        F.greatest(n - window_bytes, F.lit(0).cast("long")),
        F.lit(hop_bytes).cast("long"),
    )
    return (
        df.withColumn("win_offset", F.explode(offsets))
        .withColumn("win_bytes", F.least(F.lit(window_bytes).cast("long"), n - F.col("win_offset")))
        .withColumn(
            "win_stub",
            p.substr((F.col("win_offset") + 1).cast("int"), F.lit(window_bytes)),
        )
    )


def frame_sample_plan(
    df: DataFrame,
    n_frames: int = 4,
    payload_col: str = "payload",
) -> DataFrame:
    """Video frame-sampling *plan*: emits one row per (payload, frame
    index) with byte-offset hints — the explode/repartition shape of a
    real ffmpeg sampler, with the decode stubbed to byte slices."""
    p = F.col(payload_col)
    idx = F.sequence(F.lit(0), F.lit(n_frames - 1))
    return (
        df.withColumn("frame_index", F.explode(idx))
        .withColumn(
            "frame_offset",
            (F.col("frame_index") * F.length(p) / n_frames).cast("long"),
        )
        .withColumn(
            "frame_stub",
            p.substr((F.col("frame_offset") + 1).cast("int"), F.lit(16)),
        )
    )
