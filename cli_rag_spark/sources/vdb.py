"""R5/R6 — byte-exact ``.vdb`` codec (fidelity option).

Layout per vector-db.c:42-79 (write) / 81-146 (read):

    offset  size                 field
    0       4                    magic "VEC\\0" (vector-db.c:44,66)
    4       1                    type byte: 0=BINARY_VECTOR, 1=DOUBLE_VECTOR
                                 (vector-db.c:58-64; enum vector-db.h:1)
    5       8                    n_entries   (size_t, native-endian, vector-db.c:68)
    13      8                    vector_length (size_t, vector-db.c:69)
    21      n*vec_bytes          all vectors contiguously (vector-db.c:70-73);
                                 DOUBLE_VECTOR rows are padded to a multiple
                                 of 4 doubles (vector-db.c:124-135,
                                 build-vector-db-from-server.c:56-63)
    ...     per text: 8 (len) + len bytes   (vector-db.c:74-78)

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


def _padded_len(dim: int) -> int:
    """Vectors are zero-padded to a multiple of 4 doubles
    (build-vector-db-from-server.c:56-63, vector-db.c:124-135)."""
    return dim if dim % 4 == 0 else dim + (4 - dim % 4)


def write_vdb(df: DataFrame, path: str, vec_col: str = "embedding", text_col: str = "text") -> int:
    """DataFrame → ``.vdb`` file (DOUBLE_VECTOR). Returns row count.

    Row order follows (id) if present else the DataFrame's order —
    the reference's only row identity is position (vector-db.c:167).
    """
    cols = df.columns
    if "id" in cols:
        df = df.orderBy("id")
    rows = df.select(vec_col, text_col).collect()
    if not rows:
        raise ValueError("refusing to write empty .vdb (reference would too: n_entries=0 index is useless)")
    dim = len(rows[0][0])
    padded = _padded_len(dim)
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<B", DOUBLE_VECTOR))
        f.write(struct.pack("<Q", len(rows)))
        f.write(struct.pack("<Q", dim))
        for vec, _text in rows:
            if len(vec) != dim:
                raise ValueError(f"non-uniform dimension: {len(vec)} != {dim}")
            f.write(struct.pack(f"<{padded}d", *(list(vec) + [0.0] * (padded - dim))))
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
        padded = _padded_len(dim)
        for _ in range(n):
            vals = struct.unpack_from(f"<{padded}d", data, off)
            vecs.append(list(vals[:dim]))
            off += padded * 8
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


def vdb_to_parquet(spark: SparkSession, vdb_path: str, parquet_path: str) -> None:
    """Migration helper: reference index → engine index."""
    read_vdb(spark, vdb_path).write.mode("overwrite").parquet(parquet_path)
