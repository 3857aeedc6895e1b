"""Generic batch file-format connectors (parquet / orc / json / csv).

The reference's lake boundary is Kafka+JDBC; a Spark warehouse also
ingests and exports flat files. One read/write pair per format, with
the schema ALWAYS supplied on read — schema inference is a full extra
pass over the data at 100 TB (and type-unstable for json/csv), so
these connectors refuse to infer.

csv/json caveats handled here: csv needs an explicit header and
timestamp format to round-trip; json writes timestamps as ISO
strings. Binary columns don't survive csv — callers must project
them away (enforced)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# microsecond-precision timestamp formats: the text formats default
# to milliseconds and silently truncate micros on write
_TS_OPTS = {
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
}
_FMT_OPTS = {
    "csv": {"header": "true", **_TS_OPTS},
    "json": _TS_OPTS,
    "parquet": {},
    "orc": {},
}

SUPPORTED = ("parquet", "orc", "json", "csv")


def _check(fmt: str, schema: T.StructType | None = None) -> None:
    if fmt not in SUPPORTED:
        raise ValueError(f"unsupported format {fmt!r}; one of {SUPPORTED}")
    if fmt == "csv" and schema is not None:
        for f in schema.fields:
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType, T.BinaryType)):
                raise ValueError(
                    f"csv cannot round-trip column {f.name!r} of type "
                    f"{f.dataType.simpleString()}; project it away first"
                )


def write_table(df: DataFrame, path: str, fmt: str, mode: str = "overwrite") -> None:
    _check(fmt, df.schema)
    w = df.write.mode(mode).format(fmt)
    for k, v in _FMT_OPTS[fmt].items():
        w = w.option(k, v)
    w.save(path)


def read_table(
    spark: SparkSession, path: str, fmt: str, schema: T.StructType
) -> DataFrame:
    """Schema is REQUIRED: inference costs a full pass and is
    type-unstable for json/csv."""
    _check(fmt, schema)
    r = spark.read.format(fmt).schema(schema)
    for k, v in _FMT_OPTS[fmt].items():
        r = r.option(k, v)
    return r.load(path)
