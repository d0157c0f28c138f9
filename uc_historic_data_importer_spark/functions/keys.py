"""Row-key generation — the K2 operator, fully Catalyst-native.

Reference (app/batch/MessageUtils.kt:120-149): row key = 4-byte big-endian
CRC32 of the canonical id bytes, concatenated with the canonical id bytes;
an empty id produces an empty key. The 4-byte hash prefix exists to spread
lexically-adjacent ids across HBase regions — the same property gives us
uniform shuffle partitioning at 100 TB.

Spark's built-in ``crc32`` returns a LongType (unsigned 32-bit value);
``hex`` + ``lpad`` + ``unhex`` packs it big-endian into 4 bytes without
leaving the JVM — no UDF, stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def crc32_4bytes(col: Column) -> Column:
    """4-byte big-endian CRC32 of a string column, as BinaryType."""
    return F.unhex(F.lpad(F.hex(F.crc32(col)), 8, "0"))


def row_key_col(canonical_id: Column) -> Column:
    """BinaryType row key: crc32_be(canonical) || utf8(canonical).

    Empty/null canonical id -> empty byte key (MessageUtils.kt:121-122).
    """
    empty = F.lit(b"")
    return F.when(
        canonical_id.isNull() | (canonical_id == ""), empty
    ).otherwise(
        F.concat(crc32_4bytes(canonical_id), F.encode(canonical_id, "UTF-8"))
    )


def row_key_hex(canonical_id: Column) -> Column:
    """Hex-string form of the row key, for human-readable/oracle outputs."""
    return F.lower(F.hex(row_key_col(canonical_id)))
