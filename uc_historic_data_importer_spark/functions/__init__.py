"""Scalar/column-level helpers shared by the operators.

- json_canonical: canonical (key-sorted, compact) JSON — the K1 operator
  (reference: app/batch/MessageUtils.kt:79-140).
- dates: the reference's two accepted timestamp formats + kafka output
  format (reference: app/batch/HBaseWriter.kt:523-541,598-600).
- keys: 4-byte CRC32-prefixed binary row key — K2
  (reference: app/batch/MessageUtils.kt:120-149).
- hashes: engine-portable deterministic hashes (md5-hex -> int64) used by
  the dedup/similarity extensions so DuckDB oracles can reproduce them.
"""

from uc_historic_data_importer_spark.functions.json_canonical import (
    canonical_json,
    canonicalize_id,
)
from uc_historic_data_importer_spark.functions.dates import (
    EPOCH_KAFKA,
    EPOCH_MILLIS,
    kafka_date_format,
    parse_hdi_timestamp_millis,
)
from uc_historic_data_importer_spark.functions.keys import row_key_col
from uc_historic_data_importer_spark.functions.hashes import md5_i64

__all__ = [
    "canonical_json",
    "canonicalize_id",
    "EPOCH_KAFKA",
    "EPOCH_MILLIS",
    "kafka_date_format",
    "parse_hdi_timestamp_millis",
    "row_key_col",
    "md5_i64",
]
