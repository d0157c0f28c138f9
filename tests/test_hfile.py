"""HFile v3 container round-trip + structural pins (public Apache HBase
format — block headers, CRC32 chunks, root index, PBUF FileInfo, fixed
trailer). The parser in hfile.read_hfile opens files strictly the way
HBase does (trailer -> load-on-open walk), independent of the writer's
bookkeeping; golden byte pins below anchor the layout so writer and
parser cannot drift together unnoticed."""

import os
import struct

import pytest

from uc_historic_data_importer_spark import hfile, sinks
from uc_historic_data_importer_spark.hfile import (
    DATA_MAGIC,
    FILE_INFO_MAGIC,
    ROOT_INDEX_MAGIC,
    TRAILER_MAGIC,
    TRAILER_SIZE,
    HFileWriter,
    cell_order_key,
    read_hfile,
)


def _key(row: bytes, ts: int = 1, family=b"cf", qual=b"record") -> bytes:
    kv = sinks.keyvalue_bytes(row, family, qual, ts, b"")
    klen = struct.unpack_from(">i", kv, 0)[0]
    return kv[8 : 8 + klen]


def _write(path, cells, **kw):
    with open(path, "wb") as fh:
        w = HFileWriter(fh, **kw)
        for k, v in cells:
            w.append(k, v)
        w.close()
    return path


class TestRoundTrip:
    def test_cells_survive_and_trailer_fields(self, tmp_path):
        cells = [
            (_key(b"row-%03d" % i, ts=5), b"value-%03d" % i)
            for i in range(100)
        ]
        p = _write(tmp_path / "a.hfile", cells)
        parsed = read_hfile(p)
        assert parsed.cells == cells
        assert parsed.major_version == 3
        assert parsed.minor_version == 3
        assert parsed.entry_count == 100
        assert parsed.compression_codec == 2  # NONE
        assert parsed.comparator == "org.apache.hadoop.hbase.KeyValue$KVComparator"
        assert parsed.file_info[b"hfile.LASTKEY"] == cells[-1][0]

    def test_multi_block_index(self, tmp_path):
        cells = [
            (_key(b"k%05d" % i), b"x" * 100) for i in range(500)
        ]
        p = _write(tmp_path / "b.hfile", cells, block_size=4096)
        parsed = read_hfile(p)
        assert parsed.data_index_count > 5
        assert parsed.cells == cells
        # root index entries point at block starts in ascending offset
        offsets = [o for o, _, _ in parsed.root_index]
        assert offsets == sorted(offsets)
        assert offsets[0] == 0  # first data block at file start
        # and their firstKeys are ascending in CellComparator order
        fks = [cell_order_key(k) for _, _, k in parsed.root_index]
        assert fks == sorted(fks)

    def test_vlong_long_keys(self, tmp_path):
        # row > 127 bytes pushes the index firstKey length into the
        # multi-byte Hadoop vint encoding
        cells = [
            (_key(bytes([65 + i]) * 200), b"v%d" % i) for i in range(5)
        ]
        p = _write(tmp_path / "c.hfile", cells, block_size=64)
        parsed = read_hfile(p)
        assert parsed.cells == cells
        assert parsed.data_index_count == 5

    def test_empty_file(self, tmp_path):
        p = _write(tmp_path / "d.hfile", [])
        parsed = read_hfile(p)
        assert parsed.cells == [] and parsed.entry_count == 0


class TestGoldenStructure:
    """Byte-offset pins that an HBase reader relies on — these anchor
    the format so the symmetric writer/parser pair cannot drift."""

    def test_magics_and_version_word(self, tmp_path):
        p = _write(tmp_path / "g.hfile", [(_key(b"r"), b"v")])
        buf = open(p, "rb").read()
        assert buf[:8] == DATA_MAGIC  # first data block at offset 0
        trailer = buf[-TRAILER_SIZE:]
        assert trailer[:8] == TRAILER_MAGIC
        # FixedFileTrailer version word: major=3 | minor(3)<<24
        assert buf[-4:] == bytes.fromhex("03000003")

    def test_block_header_fields_and_checksum(self, tmp_path):
        import zlib

        p = _write(tmp_path / "h.hfile", [(_key(b"r"), b"val")])
        buf = open(p, "rb").read()
        on_disk_wo_header, uncompressed = struct.unpack_from(">ii", buf, 8)
        prev_offset = struct.unpack_from(">q", buf, 16)[0]
        assert prev_offset == -1  # first block of its type
        assert buf[24] == 1  # ChecksumType.CRC32
        bytes_per_cs, on_disk_data_with_header = struct.unpack_from(">ii", buf, 25)
        assert bytes_per_cs == 16384
        # one cell: keyLen(4)+valueLen(4)+key+value
        key = _key(b"r")
        assert uncompressed == 8 + len(key) + 3
        assert on_disk_data_with_header == 33 + uncompressed
        assert on_disk_wo_header == uncompressed + 4  # one CRC chunk
        stored_crc = struct.unpack_from(">I", buf, on_disk_data_with_header)[0]
        assert stored_crc == zlib.crc32(buf[:on_disk_data_with_header]) & 0xFFFFFFFF

    def test_load_on_open_walk(self, tmp_path):
        """Trailer offsets really land on the blocks HBase expects:
        root index, then empty meta index, then PBUF FileInfo."""
        p = _write(tmp_path / "i.hfile", [(_key(b"r"), b"v")])
        buf = open(p, "rb").read()
        trailer = buf[-TRAILER_SIZE:]
        pb_len, pos = hfile._read_pb_varint(trailer, 8)
        tf = hfile._parse_pb_fields(trailer[pos : pos + pb_len])
        load_on_open, file_info_off = tf[2][0], tf[1][0]
        assert buf[load_on_open : load_on_open + 8] == ROOT_INDEX_MAGIC
        assert buf[file_info_off : file_info_off + 8] == FILE_INFO_MAGIC
        info_payload, _ = hfile._parse_block(buf, file_info_off, FILE_INFO_MAGIC)
        assert info_payload[:4] == b"PBUF"
        assert tf[6][0] == 0  # meta_index_count
        assert tf[8][0] == 1  # num_data_index_levels

    def test_checksum_corruption_detected(self, tmp_path):
        p = _write(tmp_path / "j.hfile", [(_key(b"r"), b"v")])
        buf = bytearray(open(p, "rb").read())
        buf[40] ^= 0xFF  # flip a data byte inside the first block
        open(p, "wb").write(bytes(buf))
        with pytest.raises(ValueError, match="checksum"):
            read_hfile(str(p))


class TestOrderEnforcement:
    def test_out_of_order_rows_raise(self, tmp_path):
        with open(tmp_path / "x.hfile", "wb") as fh:
            w = HFileWriter(fh)
            w.append(_key(b"b"), b"v")
            with pytest.raises(ValueError, match="CellComparator"):
                w.append(_key(b"a"), b"v")

    def test_same_row_timestamp_desc_accepted_asc_rejected(self, tmp_path):
        """ts DESC within a row is the CellComparator rule; raw key
        bytes sort ts ASC, so this is exactly where a memcmp-based
        check would be wrong in both directions."""
        with open(tmp_path / "y.hfile", "wb") as fh:
            w = HFileWriter(fh)
            w.append(_key(b"r", ts=9), b"new")
            w.append(_key(b"r", ts=1), b"old")  # DESC: fine
            with pytest.raises(ValueError, match="CellComparator"):
                w.append(_key(b"r", ts=5), b"mid")  # ASC step: rejected


class TestSparkWriteHFiles:
    def test_bulkload_dir_end_to_end(self, spark, tmp_path):
        import random

        random.seed(7)
        rows = [
            (
                "t1",
                bytearray(bytes([b]) + random.randbytes(4)),
                f"{i:02x}",
                v,
                f"body-{i}-{v}",
            )
            for i, b in enumerate([0, 255, 127, 128, 1, 254] * 8)
            for v in (1, 2)
        ]
        kv = spark.createDataFrame(
            rows,
            "table string, key binary, key_hex string, version long, "
            "envelope string",
        )
        layout = sinks.hbase_bulkload_layout(kv, n_regions=3)
        out = str(tmp_path / "bulk")
        paths = sinks.write_hfiles(layout, out)
        # bulk-load directory shape: <out>/<table>/<family>/<file> —
        # each <out>/<table> is one LoadIncrementalHFiles directory
        assert paths and all(
            os.path.dirname(p) == os.path.join(out, "t1", "cf")
            for p in paths
        )
        all_cells = []
        for p in paths:
            parsed = read_hfile(p)
            # every file independently verifies (checksums, index walk)
            all_cells.extend(parsed.cells)
        # union of cells == input cells, and the concatenation across
        # region files is globally CellComparator-ordered (region
        # ranges are contiguous and disjoint)
        expected = sorted(
            ((_key(bytes(r[1]), ts=r[3]), r[4].encode()) for r in rows),
            key=lambda kv_: cell_order_key(kv_[0]),
        )
        got_keys = [cell_order_key(k) for k, _ in all_cells]
        assert got_keys == sorted(got_keys)
        assert sorted(all_cells) == sorted(expected)
        # no temp turds left behind
        assert not [
            f
            for _d, _s, files in os.walk(out)
            for f in files
            if ".tmp-" in f
        ]

    def test_explicit_region_splits_never_cross_boundaries(self, spark, tmp_path):
        """region_split_keys mode: every HFile's key range must fall
        inside ONE region's [start, end) — the LoadIncrementalHFiles
        contract that makes bulk load a rename instead of a load-time
        split — even when hash partitioning co-locates two regions in
        one task (write_hfiles splits files per region id)."""
        import bisect
        import random

        random.seed(21)
        rows = [
            ("t1", bytearray(random.randbytes(3)), f"{i:02x}", 1, f"b{i}")
            for i in range(120)
        ]
        kv = spark.createDataFrame(
            rows,
            "table string, key binary, key_hex string, version long, "
            "envelope string",
        )
        splits = [b"\x20", b"\x40", b"\x80", b"\xc0", b"\xe0"]  # 6 regions
        layout = sinks.hbase_bulkload_layout(kv, region_split_keys=splits)
        out = str(tmp_path / "bulk")
        paths = sinks.write_hfiles(layout, out)

        def region_of(row: bytes) -> int:
            return bisect.bisect_right(splits, row)

        all_rows = []
        for p in paths:
            rws = []
            for key, _v in read_hfile(p).cells:
                rlen = struct.unpack_from(">H", key, 0)[0]
                rws.append(key[2 : 2 + rlen])
            assert rws, p
            regions = {region_of(r) for r in rws}
            assert len(regions) == 1, (p, regions)  # no boundary crossing
            all_rows.extend(rws)
        assert sorted(all_rows) == sorted(bytes(r[1]) for r in rows)
        # the pinned region id in the filename matches the key-derived one
        for p in paths:
            fname = os.path.basename(p)
            rid = int(fname.split("-r")[1].split(".")[0])
            key0, _ = read_hfile(p).cells[0]
            rlen = struct.unpack_from(">H", key0, 0)[0]
            assert rid == region_of(key0[2 : 2 + rlen])

    def test_multi_table_layout_separates_directories(self, spark, tmp_path):
        """The kv model carries several HBase tables in one DataFrame;
        bulk load is per-table, so cells must land under their own
        <out>/<table>/<family> directory with no cross-table mixing in
        any file."""
        rows = [
            ("db1:alpha", bytearray(bytes([i])), f"{i:02x}", 1, f"a{i}")
            for i in range(12)
        ] + [
            ("db2:beta", bytearray(bytes([i])), f"{i:02x}", 1, f"b{i}")
            for i in range(7)
        ]
        kv = spark.createDataFrame(
            rows,
            "table string, key binary, key_hex string, version long, "
            "envelope string",
        )
        layout = sinks.hbase_bulkload_layout(kv, n_regions=2)
        out = str(tmp_path / "bulk")
        paths = sinks.write_hfiles(layout, out)
        by_table = {"db1:alpha": [], "db2:beta": []}
        for p in paths:
            rel = os.path.relpath(p, out)
            table = rel.split(os.sep)[0]
            assert table in by_table, rel
            assert rel.split(os.sep)[1] == "cf"
            for _k, v in read_hfile(p).cells:
                by_table[table].append(v)
        assert sorted(by_table["db1:alpha"]) == sorted(
            f"a{i}".encode() for i in range(12)
        )
        assert sorted(by_table["db2:beta"]) == sorted(
            f"b{i}".encode() for i in range(7)
        )

    def test_rerun_into_same_dir_leaves_no_stale_files(self, spark, tmp_path):
        """File names are partition-derived, so a re-run producing fewer
        files must not leave the previous run's extras visible — the
        writer owns out_dir and clears old *.hfile/temp files up
        front."""
        def kv_of(n):
            return spark.createDataFrame(
                [
                    ("t1", bytearray(bytes([i])), f"{i:02x}", 1, f"b{i}")
                    for i in range(n)
                ],
                "table string, key binary, key_hex string, version long, "
                "envelope string",
            )

        out = str(tmp_path / "bulk")
        first = sinks.write_hfiles(
            sinks.hbase_bulkload_layout(kv_of(40), n_regions=4), out
        )
        assert len(first) >= 2
        second = sinks.write_hfiles(
            sinks.hbase_bulkload_layout(kv_of(5), n_regions=1), out
        )
        on_disk = sorted(
            os.path.join(d, f)
            for d, _s, files in os.walk(out)
            for f in files
        )
        assert on_disk == sorted(second)  # nothing stale from run 1
        total = sum(read_hfile(p).entry_count for p in second)
        assert total == 5


class TestHFileProperties:
    """Hypothesis round-trips: arbitrary cell streams and block sizes
    through the writer must come back byte-identical through the
    strict parser (which re-verifies checksums and walks the index the
    way HBase does)."""

    def test_random_cells_roundtrip(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        cell_st = st.tuples(
            st.binary(min_size=1, max_size=40),  # row
            st.integers(min_value=0, max_value=2**40),  # ts
            st.binary(min_size=0, max_size=120),  # value
        )

        @settings(max_examples=40, deadline=None)
        @given(
            cells=st.lists(cell_st, min_size=0, max_size=60),
            block_size=st.sampled_from([64, 256, 4096, 65536]),
        )
        def run(cells, block_size):
            # one version per row: sort rows, drop duplicate rows so the
            # stream is strictly CellComparator-increasing
            uniq = {}
            for row, ts, val in cells:
                uniq[row] = (ts, val)
            stream = [
                (_key(row, ts=ts), val)
                for row, (ts, val) in sorted(uniq.items())
            ]
            import io

            fh = io.BytesIO()
            w = HFileWriter(fh, block_size=block_size)
            for k, v in stream:
                w.append(k, v)
            w.close()
            import tempfile

            with tempfile.NamedTemporaryFile(suffix=".hfile") as tf:
                tf.write(fh.getvalue())
                tf.flush()
                parsed = read_hfile(tf.name)
            assert parsed.cells == stream
            assert parsed.entry_count == len(stream)
            fks = [cell_order_key(k) for _, _, k in parsed.root_index]
            assert fks == sorted(fks)

        run()

    def test_multi_version_rows_roundtrip(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=25, deadline=None)
        @given(
            rows=st.lists(
                st.tuples(
                    st.binary(min_size=1, max_size=12),
                    st.lists(
                        st.integers(min_value=0, max_value=10**12),
                        min_size=1,
                        max_size=4,
                        unique=True,
                    ),
                ),
                min_size=1,
                max_size=20,
            )
        )
        def run(rows):
            uniq = dict(rows)
            stream = []
            for row in sorted(uniq):
                for ts in sorted(uniq[row], reverse=True):  # ts DESC
                    stream.append((_key(row, ts=ts), b"v%d" % ts))
            import io, tempfile

            fh = io.BytesIO()
            w = HFileWriter(fh, block_size=128)
            for k, v in stream:
                w.append(k, v)
            w.close()
            with tempfile.NamedTemporaryFile(suffix=".hfile") as tf:
                tf.write(fh.getvalue())
                tf.flush()
                parsed = read_hfile(tf.name)
            assert parsed.cells == stream

        run()
