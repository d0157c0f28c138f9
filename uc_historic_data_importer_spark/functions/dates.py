"""Timestamp parsing / formatting with the reference's exact semantics.

The reference accepts exactly two input formats, both UTC
(HBaseWriter.kt:598-600):
    yyyy-MM-dd'T'HH:mm:ss.SSS'Z'      e.g. 2018-12-01T15:01:02.000Z
    yyyy-MM-dd'T'HH:mm:ss.SSSZZZZ     e.g. 2018-12-01T15:01:02.000+0000
and re-emits the "kafka" format (HBaseWriter.kt:523-541):
    yyyy-MM-dd'T'HH:mm:ss.SSS+0000

The 1980 epoch sentinel (FilterServiceImpl.kt:84, HBaseWriter.kt:593) is a
magic version for records with no timestamps at all; it is exempt from the
too-early filter.

Python-side versions are used inside the record-normalization pandas UDF;
Catalyst column versions are provided for SQL-expressible paths.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import Column
from pyspark.sql import functions as F

EPOCH_KAFKA = "1980-01-01T00:00:00.000+0000"
EPOCH_MILLIS = 315532800000

# Spark datetime patterns for the two accepted formats.
SPARK_FMT_Z_LITERAL = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"
SPARK_FMT_OFFSET = "yyyy-MM-dd'T'HH:mm:ss.SSSxx"  # xx matches +0000
KAFKA_OUT_SUFFIX = "+0000"


def parse_hdi_timestamp_millis(value: str | None) -> int | None:
    """Parse one of the two accepted formats to epoch millis (UTC).

    Returns None when unparseable — callers decide whether that is a
    record error (kafkaDateFormat raises, HBaseWriter.kt:523-531) or a
    fallback trigger (lastModifiedDateTime hierarchy, :439-471).
    """
    if not value or not isinstance(value, str):
        return None
    v = value.strip()
    dt: datetime | None = None
    if v.endswith("Z"):
        try:
            dt = datetime.strptime(v[:-1], "%Y-%m-%dT%H:%M:%S.%f").replace(
                tzinfo=timezone.utc
            )
        except ValueError:
            dt = None
    else:
        try:
            dt = datetime.strptime(v, "%Y-%m-%dT%H:%M:%S.%f%z")
        except ValueError:
            dt = None
    if dt is None:
        return None
    # integer arithmetic: avoid float .timestamp() rounding at ms precision
    epoch_s = int(dt.replace(microsecond=0).timestamp())
    return epoch_s * 1000 + dt.microsecond // 1000


def kafka_date_format(value: str) -> str | None:
    """Re-format an accepted timestamp to yyyy-MM-dd'T'HH:mm:ss.SSS+0000.

    None on parse failure (reference raises; the caller of the UDF records
    the record error — F1 semantics).
    """
    millis = parse_hdi_timestamp_millis(value)
    if millis is None:
        return None
    return millis_to_kafka(millis)


def millis_to_kafka(millis: int) -> str:
    dt = datetime.fromtimestamp(millis / 1000.0, tz=timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%S.") + f"{millis % 1000:03d}" + KAFKA_OUT_SUFFIX


def parse_hdi_timestamp_col(col: Column) -> Column:
    """Catalyst parse of the two accepted formats -> TimestampType.

    coalesce(to_timestamp(f1), to_timestamp(f2)) under UTC session TZ —
    the Spark-native twin of parse_hdi_timestamp_millis for columns that
    are known to hold plain timestamp strings.
    """
    return F.coalesce(
        F.to_timestamp(col, SPARK_FMT_Z_LITERAL),
        F.to_timestamp(col, SPARK_FMT_OFFSET),
    )


def hdi_timestamp_millis_col(col: Column) -> Column:
    """Catalyst epoch-millis of an accepted timestamp string column."""
    return F.unix_millis(parse_hdi_timestamp_col(col))
