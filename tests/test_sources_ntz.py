"""Regression lock for the TIMESTAMP_NTZ ingestion class.

The driver's fixture parquet has been regenerated across rounds with
three distinct physical timestamp encodings for ``events.ts``:

  r1: TIMESTAMP(NANOS)            -> Spark rejects without legacy conf
  r2: TIMESTAMP(MICROS, UTC)      -> Spark reads TIMESTAMP_LTZ
  r3: TIMESTAMP(MICROS, no tz)    -> Spark 4 reads TIMESTAMP_NTZ

``load_table`` must normalize all three to plain TimestampType under a
UTC session zone so that ``unix_micros`` / range-window arithmetic is
legal and agrees with DuckDB's ``epoch()`` on the same bytes
(DuckDB treats the naive value as UTC wall-clock).
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

from cli_rag_spark.sources.documents import load_table

TS = [
    dt.datetime(2024, 1, 1, 0, 0, 0, 123456),
    dt.datetime(2024, 6, 15, 12, 30, 45, 654321),
]
EPOCH_US = [1704067200123456, 1718454645654321]  # both as-UTC


def _write(tmp_path, name, arrow_type):
    tbl = pa.table({"id": pa.array([1, 2], pa.int64()),
                    "ts": pa.array(TS, arrow_type)})
    path = str(tmp_path / f"{name}.parquet")
    pq.write_table(tbl, path)
    return str(tmp_path)


@pytest.mark.parametrize(
    "arrow_type",
    [
        pa.timestamp("us"),            # r3 encoding: NTZ
        pa.timestamp("us", tz="UTC"),  # r2 encoding: LTZ
        pa.timestamp("ns"),            # r1 encoding: nanos
    ],
    ids=["micros-ntz", "micros-utc", "nanos"],
)
def test_load_table_normalizes_all_timestamp_encodings(spark, tmp_path, arrow_type):
    sf_dir = _write(tmp_path, "tstab", arrow_type)
    df = load_table(spark, sf_dir, "tstab")
    (ts_field,) = [f for f in df.schema.fields if f.name == "ts"]
    assert isinstance(ts_field.dataType, TimestampType), ts_field.dataType
    assert not isinstance(ts_field.dataType, TimestampNTZType)
    # unix_micros must be legal AND yield the as-UTC epoch DuckDB's
    # epoch() computes on the same parquet bytes
    got = dict(
        df.select("id", F.unix_micros("ts").alias("us")).collect()
    )
    assert [got[1], got[2]] == EPOCH_US
