"""Minimal pure-Python Apache HFile **version 3** writer + independent
parser — the container around the KeyValue wire cells that closes W2's
bulk-load path without HBase jars.

The reference writes cells through region servers (HbaseClient.kt:25-41
with SKIP_WAL, Config.kt:27); the idiomatic 100 TB route is bulk load:
region-aligned, totally-ordered HFiles handed to LoadIncrementalHFiles.
`hbase_bulkload_layout` (sinks.py) already produces the exact
partitioning + in-partition CellComparator order, and the KeyValue wire
bytes are pinned byte-exactly (tests/test_sinks.py::TestKeyValueWireParity).
This module supplies the remaining piece: the on-disk block container.

Layout follows the PUBLIC Apache HBase format (all structure and
constants from the Apache-2.0 HBase source, not the reference repo):

- ``HFileBlock``: 33-byte header = blockType magic (8) |
  onDiskSizeWithoutHeader (i32) | uncompressedSizeWithoutHeader (i32) |
  prevBlockOffset of same type (i64) | checksumType (u8) |
  bytesPerChecksum (i32) | onDiskDataSizeWithHeader (i32), then data,
  then one CRC32 per bytesPerChecksum chunk covering header+data
  (hbase HFileBlock.java / ChecksumUtil.java; CRC32 == zlib.crc32).
- Data block payload: cells as keyLen(i32) valueLen(i32) key value —
  no memstoreTS vlong and no tags, signalled by OMITTING
  KEY_VALUE_VERSION / MAX_MEMSTORE_TS_KEY / MAX_TAGS_LEN from FileInfo
  (HFileReaderImpl derives both flags from FileInfo presence).
- Root index block (single level): per entry offset(i64),
  onDiskSizeWithHeader(i32), firstKey as Hadoop writeByteArray
  (vint len + bytes) — HFileBlockIndex.BlockIndexChunk#writeRoot.
- FileInfo block: "PBUF" magic + varint-delimited FileInfoProto
  (repeated BytesBytesPair map_entry) — HFileInfo#write.
- Fixed trailer, 4096 bytes: "TRABLK\"$" magic + varint-delimited
  FileTrailerProto + zero padding + version word
  (major=3 | minor<<24) — FixedFileTrailer#serialize.

In this sandbox there is no HBase classpath to run HFilePrettyPrinter,
so verification is a strict INDEPENDENT parser (`read_hfile`) driven
from the trailer exactly the way HBase opens a file — trailer -> version
-> load-on-open walk -> root index -> per-block checksum verify ->
cell scan — plus golden structural pins in tests/test_hfile.py. The
writer never reads its own bookkeeping back.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field

# --- public HBase constants (BlockType.java, ChecksumType.java,
# Compression.java, HFile.java) ---
DATA_MAGIC = b"DATABLK*"
ROOT_INDEX_MAGIC = b"IDXROOT2"
FILE_INFO_MAGIC = b"FILEINF2"
TRAILER_MAGIC = b'TRABLK"$'

HEADER_SIZE = 33  # v2+ header with checksum fields
CHECKSUM_CRC32 = 1  # ChecksumType.CRC32.getCode()
BYTES_PER_CHECKSUM = 16384
COMPRESSION_NONE = 2  # Compression.Algorithm.NONE.ordinal()
MAJOR_VERSION = 3
MINOR_VERSION = 3  # HFileReaderImpl.MAX_MINOR_VERSION
TRAILER_SIZE = 4096  # FixedFileTrailer.TRAILER_SIZE[v2+]
# FixedFileTrailer serializes the default CellComparatorImpl under its
# hbase-1 compatible name for rolling-upgrade readers
COMPARATOR_NAME = "org.apache.hadoop.hbase.KeyValue$KVComparator"

DEFAULT_BLOCK_SIZE = 64 * 1024  # HConstants.DEFAULT_BLOCKSIZE


def _write_vlong(i: int) -> bytes:
    """Hadoop WritableUtils.writeVLong (used by Bytes.writeByteArray)."""
    if -112 <= i <= 127:
        return struct.pack("b", i)
    ln = -112
    if i < 0:
        i ^= -1
        ln = -120
    tmp = i
    while tmp != 0:
        tmp >>= 8
        ln -= 1
    out = struct.pack("b", ln)
    ln = -(ln + 120) if ln < -120 else -(ln + 112)
    for idx in range(ln, 0, -1):
        out += struct.pack("B", (i >> ((idx - 1) * 8)) & 0xFF)
    return out


def _read_vlong(buf: bytes, pos: int) -> tuple[int, int]:
    """Inverse of _write_vlong; returns (value, new_pos)."""
    first = struct.unpack_from("b", buf, pos)[0]
    pos += 1
    if first >= -112:
        return first, pos
    negative = first < -120
    ln = (-first - 120) if negative else (-first - 112)
    val = 0
    for _ in range(ln):
        val = (val << 8) | buf[pos]
        pos += 1
    return (val ^ -1) if negative else val, pos


def _pb_varint(i: int) -> bytes:
    out = b""
    while True:
        b = i & 0x7F
        i >>= 7
        if i:
            out += struct.pack("B", b | 0x80)
        else:
            return out + struct.pack("B", b)


def _read_pb_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = val = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7


def _pb_field_varint(num: int, val: int) -> bytes:
    return _pb_varint(num << 3) + _pb_varint(val)


def _pb_field_bytes(num: int, data: bytes) -> bytes:
    return _pb_varint((num << 3) | 2) + _pb_varint(len(data)) + data


def _parse_pb_fields(buf: bytes) -> dict[int, list]:
    """Flat protobuf field scan: {field_number: [values]} where varint
    fields decode to int and length-delimited to bytes."""
    fields: dict[int, list] = {}
    pos = 0
    while pos < len(buf):
        tag, pos = _read_pb_varint(buf, pos)
        num, wire = tag >> 3, tag & 7
        if wire == 0:
            val, pos = _read_pb_varint(buf, pos)
        elif wire == 2:
            ln, pos = _read_pb_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        else:  # pragma: no cover - no fixed32/64 fields in these protos
            raise ValueError(f"unsupported wire type {wire}")
        fields.setdefault(num, []).append(val)
    return fields


@dataclass
class _BlockIndexEntry:
    offset: int
    on_disk_size_with_header: int
    first_key: bytes


def cell_order_key(key: bytes) -> tuple:
    """CellComparator sort tuple decoded from a serialized KEY portion
    (rowLen i16 | row | famLen u8 | family | qualifier | ts i64 |
    type u8): row, family, qualifier ascending byte order, timestamp
    DESCENDING, type DESCENDING — the raw key bytes sort ts ASCENDING,
    so a plain memcmp would mis-order multi-version rows."""
    row_len = struct.unpack_from(">H", key, 0)[0]
    row = key[2 : 2 + row_len]
    fam_len = key[2 + row_len]
    fam_start = 3 + row_len
    family = key[fam_start : fam_start + fam_len]
    qualifier = key[fam_start + fam_len : -9]
    ts = struct.unpack_from(">q", key, len(key) - 9)[0]
    key_type = key[-1]
    return (row, family, qualifier, -ts, 0xFF - key_type)


class HFileWriter:
    """Streaming single-level-index HFile v3 writer.

    Cells must arrive in CellComparator order (`keyvalue_sort_key` in
    sinks.py); ordering is asserted, not fixed up — the upstream layout
    owns the sort. Memory is one data block (~``block_size``) plus the
    root index entries, so a region's HFile streams at O(block) memory
    regardless of cell count — the property that lets one Spark task
    write one region's file."""

    def __init__(self, fh, block_size: int = DEFAULT_BLOCK_SIZE,
                 create_time_ms: int = 0):
        self._fh = fh
        self._block_size = block_size
        self._create_time_ms = create_time_ms
        self._offset = 0
        self._prev_offset_by_type: dict[bytes, int] = {}
        self._buf = bytearray()
        self._first_key_in_block: bytes | None = None
        self._index: list[_BlockIndexEntry] = []
        self._entry_count = 0
        self._total_key_len = 0
        self._total_value_len = 0
        self._last_key: bytes | None = None
        self._last_order_key: tuple | None = None
        self._first_data_offset = -1
        self._last_data_offset = -1
        self._total_uncompressed = 0
        self._index_uncompressed = 0
        self._closed = False

    # -- cell ingestion ------------------------------------------------
    def append(self, key: bytes, value: bytes) -> None:
        """Append one cell. ``key`` is the KeyValue KEY portion
        (rowLen..type — e.g. bytes 8..8+keyLen of sinks.keyvalue_bytes
        output); ``value`` the cell value."""
        order_key = cell_order_key(key)
        if self._last_order_key is not None and order_key < self._last_order_key:
            raise ValueError(
                "cells must be appended in CellComparator order: "
                f"{key!r} after {self._last_key!r}"
            )
        self._last_order_key = order_key
        if self._first_key_in_block is None:
            self._first_key_in_block = key
        self._buf += struct.pack(">ii", len(key), len(value)) + key + value
        self._entry_count += 1
        self._total_key_len += len(key)
        self._total_value_len += len(value)
        self._last_key = key
        if len(self._buf) >= self._block_size:
            self._flush_data_block()

    def append_keyvalue(self, kv: bytes) -> None:
        """Append a cell from its full KeyValue wire bytes
        (sinks.keyvalue_bytes layout: keyLen i32, valueLen i32, key,
        value)."""
        key_len, value_len = struct.unpack_from(">ii", kv, 0)
        key = kv[8 : 8 + key_len]
        value = kv[8 + key_len : 8 + key_len + value_len]
        self.append(key, value)

    # -- block plumbing ------------------------------------------------
    def _write_block(self, magic: bytes, data: bytes) -> tuple[int, int]:
        """Write one checksummed block; returns (offset,
        on_disk_size_with_header)."""
        on_disk_data_with_header = HEADER_SIZE + len(data)
        n_chunks = (
            on_disk_data_with_header + BYTES_PER_CHECKSUM - 1
        ) // BYTES_PER_CHECKSUM
        on_disk_without_header = len(data) + 4 * n_chunks
        header = (
            magic
            + struct.pack(">ii", on_disk_without_header, len(data))
            + struct.pack(">q", self._prev_offset_by_type.get(magic, -1))
            + struct.pack(">B", CHECKSUM_CRC32)
            + struct.pack(">i", BYTES_PER_CHECKSUM)
            + struct.pack(">i", on_disk_data_with_header)
        )
        blob = header + data
        checksums = b"".join(
            struct.pack(
                ">I",
                zlib.crc32(blob[i : i + BYTES_PER_CHECKSUM]) & 0xFFFFFFFF,
            )
            for i in range(0, len(blob), BYTES_PER_CHECKSUM)
        )
        offset = self._offset
        self._fh.write(blob + checksums)
        self._prev_offset_by_type[magic] = offset
        self._offset += len(blob) + len(checksums)
        self._total_uncompressed += HEADER_SIZE + len(data)
        return offset, HEADER_SIZE + on_disk_without_header

    def _flush_data_block(self) -> None:
        if not self._buf:
            return
        offset, on_disk = self._write_block(DATA_MAGIC, bytes(self._buf))
        self._index.append(
            _BlockIndexEntry(offset, on_disk, self._first_key_in_block)
        )
        if self._first_data_offset < 0:
            self._first_data_offset = offset
        self._last_data_offset = offset
        self._buf = bytearray()
        self._first_key_in_block = None

    # -- load-on-open section -----------------------------------------
    def _root_index_bytes(self, entries: list[_BlockIndexEntry]) -> bytes:
        out = b""
        for e in entries:
            out += struct.pack(">qi", e.offset, e.on_disk_size_with_header)
            out += _write_vlong(len(e.first_key)) + e.first_key
        return out

    def _file_info_bytes(self) -> bytes:
        avg_key = self._total_key_len // max(1, self._entry_count)
        avg_value = self._total_value_len // max(1, self._entry_count)
        # byte-sorted map, as HFileInfo's SortedMap serializes it
        entries = [
            (b"hfile.AVG_KEY_LEN", struct.pack(">i", avg_key)),
            (b"hfile.AVG_VALUE_LEN", struct.pack(">i", avg_value)),
            (b"hfile.CREATE_TIME_TS", struct.pack(">q", self._create_time_ms)),
            (b"hfile.LASTKEY", self._last_key or b""),
        ]
        proto = b"".join(
            _pb_field_bytes(
                1, _pb_field_bytes(1, k) + _pb_field_bytes(2, v)
            )
            for k, v in sorted(entries)
        )
        return b"PBUF" + _pb_varint(len(proto)) + proto

    def _trailer_bytes(
        self, load_on_open_offset: int, file_info_offset: int
    ) -> bytes:
        proto = b"".join(
            (
                _pb_field_varint(1, file_info_offset),
                _pb_field_varint(2, load_on_open_offset),
                _pb_field_varint(3, self._index_uncompressed),
                _pb_field_varint(4, self._total_uncompressed),
                _pb_field_varint(5, len(self._index)),
                _pb_field_varint(6, 0),  # meta_index_count
                _pb_field_varint(7, self._entry_count),
                _pb_field_varint(8, 1),  # num_data_index_levels
                _pb_field_varint(9, max(0, self._first_data_offset)),
                _pb_field_varint(10, max(0, self._last_data_offset)),
                _pb_field_bytes(11, COMPARATOR_NAME.encode()),
                _pb_field_varint(12, COMPRESSION_NONE),
            )
        )
        body = TRAILER_MAGIC + _pb_varint(len(proto)) + proto
        version_word = struct.pack(
            ">i", (MAJOR_VERSION & 0x00FFFFFF) | (MINOR_VERSION << 24)
        )
        padding = TRAILER_SIZE - len(body) - len(version_word)
        return body + b"\x00" * padding + version_word

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        self._flush_data_block()
        load_on_open = self._offset
        # root data index, then the (empty) meta index root — the reader
        # walks them sequentially from load_on_open_data_offset.
        # uncompressed_data_index_size (trailer field 3) counts the DATA
        # index only — HBase's FileTrailerProto excludes the meta index,
        # so the measurement window closes before the empty meta root
        before = self._total_uncompressed
        self._write_block(ROOT_INDEX_MAGIC, self._root_index_bytes(self._index))
        self._index_uncompressed = self._total_uncompressed - before
        self._write_block(ROOT_INDEX_MAGIC, b"")
        file_info_offset = self._offset
        self._write_block(FILE_INFO_MAGIC, self._file_info_bytes())
        self._fh.write(
            self._trailer_bytes(load_on_open, file_info_offset)
        )


# ---------------------------------------------------------------------
# Independent parser — opens the file the way HBase does (trailer first)
# ---------------------------------------------------------------------


@dataclass
class ParsedHFile:
    major_version: int
    minor_version: int
    entry_count: int
    data_index_count: int
    comparator: str
    compression_codec: int
    cells: list[tuple[bytes, bytes]]  # (key, value) in file order
    file_info: dict[bytes, bytes]
    root_index: list[tuple[int, int, bytes]]  # offset, onDiskSize, firstKey
    trailer_fields: dict[int, list] = field(default_factory=dict)


def _parse_block(buf: bytes, offset: int, expect_magic: bytes) -> tuple[bytes, int]:
    """Parse + checksum-verify one block at ``offset``; returns
    (payload, on_disk_size_with_header)."""
    magic = buf[offset : offset + 8]
    if magic != expect_magic:
        raise ValueError(f"bad block magic at {offset}: {magic!r}")
    on_disk_without_header, data_len = struct.unpack_from(
        ">ii", buf, offset + 8
    )
    checksum_type = buf[offset + 24]
    bytes_per_checksum, on_disk_data_with_header = struct.unpack_from(
        ">ii", buf, offset + 25
    )
    data = buf[offset + HEADER_SIZE : offset + HEADER_SIZE + data_len]
    if checksum_type == CHECKSUM_CRC32:
        blob = buf[offset : offset + on_disk_data_with_header]
        stored = buf[
            offset + on_disk_data_with_header : offset + HEADER_SIZE + on_disk_without_header
        ]
        for i, start in enumerate(range(0, len(blob), bytes_per_checksum)):
            expect = struct.unpack_from(">I", stored, i * 4)[0]
            got = zlib.crc32(blob[start : start + bytes_per_checksum]) & 0xFFFFFFFF
            if got != expect:
                raise ValueError(f"checksum mismatch in block at {offset}")
    return data, HEADER_SIZE + on_disk_without_header


def read_hfile(path: str) -> ParsedHFile:
    """Parse an HFile v3 strictly from its trailer, verifying every
    block checksum and the root-index -> data-block correspondence."""
    with open(path, "rb") as fh:
        buf = fh.read()
    trailer = buf[-TRAILER_SIZE:]
    if trailer[:8] != TRAILER_MAGIC:
        raise ValueError("trailer magic not found")
    version_word = struct.unpack(">i", trailer[-4:])[0]
    major = version_word & 0x00FFFFFF
    minor = (version_word >> 24) & 0xFF
    pb_len, pos = _read_pb_varint(trailer, 8)
    tf = _parse_pb_fields(trailer[pos : pos + pb_len])
    file_info_offset = tf[1][0]
    load_on_open = tf[2][0]
    data_index_count = tf[5][0]
    entry_count = tf[7][0]

    root_payload, root_size = _parse_block(buf, load_on_open, ROOT_INDEX_MAGIC)
    root_index: list[tuple[int, int, bytes]] = []
    pos = 0
    for _ in range(data_index_count):
        off, sz = struct.unpack_from(">qi", root_payload, pos)
        pos += 12
        klen, pos = _read_vlong(root_payload, pos)
        root_index.append((off, sz, root_payload[pos : pos + klen]))
        pos += klen
    # empty meta index root follows the data index
    _parse_block(buf, load_on_open + root_size, ROOT_INDEX_MAGIC)

    info_payload, _ = _parse_block(buf, file_info_offset, FILE_INFO_MAGIC)
    if info_payload[:4] != b"PBUF":
        raise ValueError("FileInfo missing PBUF magic")
    fi_len, fi_pos = _read_pb_varint(info_payload, 4)
    file_info: dict[bytes, bytes] = {}
    for entry in _parse_pb_fields(info_payload[fi_pos : fi_pos + fi_len]).get(1, []):
        kv = _parse_pb_fields(entry)
        file_info[bytes(kv[1][0])] = bytes(kv[2][0])

    cells: list[tuple[bytes, bytes]] = []
    for off, _sz, first_key in root_index:
        payload, _ = _parse_block(buf, off, DATA_MAGIC)
        pos = 0
        first_in_block = True
        while pos < len(payload):
            klen, vlen = struct.unpack_from(">ii", payload, pos)
            pos += 8
            key = payload[pos : pos + klen]
            pos += klen
            value = payload[pos : pos + vlen]
            pos += vlen
            if first_in_block and key != first_key:
                raise ValueError(
                    f"root index first-key mismatch at block {off}"
                )
            first_in_block = False
            cells.append((key, value))
    return ParsedHFile(
        major_version=major,
        minor_version=minor,
        entry_count=entry_count,
        data_index_count=data_index_count,
        comparator=bytes(tf[11][0]).decode(),
        compression_codec=tf[12][0],
        cells=cells,
        file_info=file_info,
        root_index=root_index,
        trailer_fields=tf,
    )
