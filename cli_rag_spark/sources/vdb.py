"""R5/R6 — byte-exact ``.vdb`` codec (fidelity option).

Layout per vector-db.c:42-79 (write) / 81-146 (read):

    offset  size                 field
    0       4                    magic "VEC\\0" (vector-db.c:44,66)
    4       1                    type byte: 0=BINARY_VECTOR, 1=DOUBLE_VECTOR
                                 (vector-db.c:58-64; enum vector-db.h:1)
    5       8                    n_entries   (size_t, native-endian, vector-db.c:68)
    13      8                    vector_length (size_t, vector-db.c:69)
    21      n*vec_bytes          all vectors contiguously (vector-db.c:70-73);
                                 DOUBLE_VECTOR rows are exactly
                                 vector_length*8 bytes; BINARY_VECTOR rows
                                 are vector_length/8+1 bytes
                                 (vector-db.c:58-60,111-113)
    ...     per text: 8 (len) + len bytes   (vector-db.c:74-78)

Note the reference's 32-byte alignment / zero-padding to a multiple
of 4 doubles (build-vector-db-from-server.c:56-63, vector-db.c:124-135)
is an IN-MEMORY allocation detail only — write_db_to_disk and
read_db_from_disk move exactly vector_length*8 bytes per row, so the
disk format carries no padding.

Non-portable by design upstream: native-endian size_t. We pin
little-endian 64-bit (the only platform the reference realistically
targets) and document that (SURVEY §7 "What's hard").

This is a driver-side codec: a ``.vdb`` file is a single sequential
binary blob (no split points), so it is read/written on the driver
and exchanged with DataFrames via createDataFrame/collect. For scale
the engine's real format is Parquet (operators/index.py); this codec
exists so a reference user can import/export their existing ``.vdb``
files bit-for-bit.
"""

from __future__ import annotations

import os
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MAGIC = b"VEC\x00"
BINARY_VECTOR = 0
DOUBLE_VECTOR = 1


def _pack_bits(bits: list[float], nbytes: int) -> bytes:
    """0/1 values → the reference's bit packing: bit i lands in byte
    i//8 at in-byte position i%8 (vector-db.c:58-60,111-113)."""
    out = bytearray(nbytes)
    for i, b in enumerate(bits):
        if b not in (0, 0.0, 1, 1.0):
            raise ValueError(f"binary vector element {b!r} is not 0/1")
        if b:
            out[i // 8] |= 1 << (i % 8)
    return bytes(out)


def write_vdb(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    text_col: str = "text",
    vec_type: int = DOUBLE_VECTOR,
) -> int:
    """DataFrame → ``.vdb`` file. Returns row count.

    ``vec_type=DOUBLE_VECTOR`` writes exactly dim little-endian f64
    per row; ``vec_type=BINARY_VECTOR`` expects 0/1 elements (the
    shape :func:`read_vdb` produces and operators/hamming.py unpacks
    to) and writes the reference's dim//8+1-byte bit packing —
    round-trip twin of the BINARY_VECTOR read branch below.

    Row order follows (id) if present else the DataFrame's order —
    the reference's only row identity is position (vector-db.c:167).
    """
    if vec_type not in (DOUBLE_VECTOR, BINARY_VECTOR):
        raise ValueError(f"unknown vector type {vec_type}")
    cols = df.columns
    if "id" in cols:
        df = df.orderBy("id")
    rows = df.select(vec_col, text_col).collect()
    if not rows:
        raise ValueError("refusing to write empty .vdb (reference would too: n_entries=0 index is useless)")
    dim = len(rows[0][0])
    nbytes = dim // 8 + 1
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<B", vec_type))
        f.write(struct.pack("<Q", len(rows)))
        f.write(struct.pack("<Q", dim))
        for vec, _text in rows:
            if len(vec) != dim:
                raise ValueError(f"non-uniform dimension: {len(vec)} != {dim}")
            if vec_type == DOUBLE_VECTOR:
                f.write(struct.pack(f"<{dim}d", *vec))
            else:
                f.write(_pack_bits(list(vec), nbytes))
        for _vec, text in rows:
            b = (text or "").encode("utf-8")
            f.write(struct.pack("<Q", len(b)))
            f.write(b)
    return len(rows)


def read_vdb(spark: SparkSession, path: str) -> DataFrame:
    """``.vdb`` file → DF[id, embedding, text].

    Mirrors read_db_from_disk (vector-db.c:81-146) except the magic
    mismatch is a hard error, not a warning (vector-db.c:102-105 is a
    known reference quirk we deliberately do not inherit).
    """
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != MAGIC:
        raise ValueError(f"bad magic {data[:4]!r}: not a .vdb file")
    vtype = data[4]
    n, dim = struct.unpack_from("<QQ", data, 5)
    off = 21
    vecs: list[list[float]] = []
    if vtype == DOUBLE_VECTOR:
        for _ in range(n):
            vecs.append(list(struct.unpack_from(f"<{dim}d", data, off)))
            off += dim * 8
    elif vtype == BINARY_VECTOR:
        # declared but dead upstream (no producer, SURVEY §1.2); we
        # decode the bit-packed layout (vector_length/8+1 bytes/row,
        # vector-db.c:58-60) to 0/1 doubles for uniformity
        nbytes = dim // 8 + 1
        for _ in range(n):
            row = data[off : off + nbytes]
            bits = [(row[i // 8] >> (i % 8)) & 1 for i in range(dim)]
            vecs.append([float(b) for b in bits])
            off += nbytes
    else:
        raise ValueError(f"unknown vector type byte {vtype}")
    texts: list[str] = []
    for _ in range(n):
        (tlen,) = struct.unpack_from("<Q", data, off)
        off += 8
        texts.append(data[off : off + tlen].decode("utf-8", errors="replace"))
        off += tlen
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("embedding", ArrayType(DoubleType())),
            StructField("text", StringType()),
        ]
    )
    return spark.createDataFrame(
        [(i, vecs[i], texts[i]) for i in range(n)], schema=schema
    )


def read_vdb_distributed(
    spark: SparkSession,
    path: str,
    num_partitions: int = 32,
) -> DataFrame:
    """``.vdb`` file → DF[id, embedding, text], parsed ON EXECUTORS —
    the multi-GB import path (VERDICT r9 #7a): :func:`read_vdb` holds
    the whole blob plus Python row lists on the driver, which is fine
    for fidelity round-trips and wrong for a 10 GB reference index.

    The format has no split points, but it IS offset-indexable in two
    parts: vector records are FIXED-STRIDE (dim·8 bytes each, or
    dim//8+1 for BINARY_VECTOR), so any row range is a seek; text
    records are length-prefixed, so offsets are sequential — the
    driver walks the text section ONCE with a buffered reader keeping
    only the P partition-boundary offsets (O(P) memory, never the
    blob), and each executor task seeks to its own (vector, text)
    offsets and parses its row range inside one Arrow-batched
    mapInPandas stage.

    Requires ``path`` readable from every executor (shared FS /
    NFS / local mode) — the same contract as any file-based source.
    Row-for-row identical to :func:`read_vdb` (pinned in tests).
    """
    file_size = os.path.getsize(path)
    with open(path, "rb", buffering=1 << 20) as f:
        head = f.read(21)
        if len(head) < 21:
            raise ValueError(
                f"truncated .vdb header: {len(head)} bytes, need 21 ({path})"
            )
        if head[:4] != MAGIC:
            raise ValueError(f"bad magic {head[:4]!r}: not a .vdb file")
        vtype = head[4]
        n, dim = struct.unpack_from("<QQ", head, 5)
        if vtype == DOUBLE_VECTOR:
            stride = dim * 8
        elif vtype == BINARY_VECTOR:
            stride = dim // 8 + 1
        else:
            raise ValueError(f"unknown vector type byte {vtype}")
        text_base = 21 + n * stride
        if text_base > file_size:
            raise ValueError(
                f"corrupt .vdb: header claims {n} vectors × {stride} B "
                f"ending at byte {text_base}, but the file is only "
                f"{file_size} B ({path})"
            )
        # one buffered sequential walk of the text lengths, recording
        # offsets only at partition boundaries. Every length read and
        # the resulting offset is validated against the file size so a
        # truncated/corrupt file raises a ValueError naming the byte
        # offset here on the driver, instead of an opaque struct.error
        # or executor-side garbage from seeking past EOF (ADVICE r10).
        parts = max(1, min(num_partitions, n or 1))
        bounds = [(p * n) // parts for p in range(parts + 1)]
        f.seek(text_base)
        text_offsets: list[int] = []
        bi = 0
        off = text_base
        for i in range(n):
            while bi <= parts and bounds[bi] == i:
                text_offsets.append(off)
                bi += 1
            chunk = f.read(8)
            if len(chunk) != 8:
                raise ValueError(
                    f"corrupt .vdb: truncated text-length prefix for "
                    f"record {i} at byte {off} ({path})"
                )
            (tlen,) = struct.unpack("<Q", chunk)
            off += 8 + tlen
            if off > file_size:
                raise ValueError(
                    f"corrupt .vdb: record {i} claims text length {tlen} "
                    f"ending at byte {off}, past EOF at {file_size} ({path})"
                )
            f.seek(tlen, 1)
        while bi <= parts:
            text_offsets.append(off)
            bi += 1

    specs = [
        (bounds[p], bounds[p + 1], text_offsets[p])
        for p in range(parts)
        if bounds[p + 1] > bounds[p]
    ]
    spec_df = spark.createDataFrame(
        specs or [(0, 0, text_base)], "lo long, hi long, text_off long"
    ).repartition(max(1, len(specs)))

    vtype_b, dim_b, stride_b, path_b = vtype, int(dim), stride, path

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            for lo, hi, text_off in pdf.itertuples(index=False):
                if hi <= lo:
                    continue
                count = int(hi - lo)
                with open(path_b, "rb") as fh:
                    fh.seek(21 + int(lo) * stride_b)
                    vec_raw = fh.read(count * stride_b)
                    fh.seek(int(text_off))
                    texts = []
                    for _ in range(count):
                        (tlen,) = struct.unpack("<Q", fh.read(8))
                        texts.append(
                            fh.read(tlen).decode("utf-8", errors="replace")
                        )
                vecs = []
                for i in range(count):
                    rec = vec_raw[i * stride_b:(i + 1) * stride_b]
                    if vtype_b == DOUBLE_VECTOR:
                        vecs.append(list(struct.unpack(f"<{dim_b}d", rec)))
                    else:
                        vecs.append([
                            float((rec[j // 8] >> (j % 8)) & 1)
                            for j in range(dim_b)
                        ])
                yield pd.DataFrame({
                    "id": range(int(lo), int(hi)),
                    "embedding": vecs,
                    "text": texts,
                })

    schema = StructType([
        StructField("id", LongType()),
        StructField("embedding", ArrayType(DoubleType())),
        StructField("text", StringType()),
    ])
    return spec_df.mapInPandas(parse, schema=schema)


def vdb_to_parquet(
    spark: SparkSession,
    vdb_path: str,
    parquet_path: str,
    distributed: bool = False,
) -> None:
    """Migration helper: reference index → engine index.

    ``distributed=True`` parses on executors
    (:func:`read_vdb_distributed`) — use it for multi-GB imports where
    the driver-side codec would hold the whole blob."""
    reader = read_vdb_distributed if distributed else read_vdb
    reader(spark, vdb_path).write.mode("overwrite").parquet(parquet_path)
