"""Source-layer tests: listing, pairing, metadata validation, encrypted
stream reading (S1-S10) — the cases S3ReaderTest/KeyPairGeneratorTest pin
in the reference."""

import base64
import gzip
import json
import os

import pytest

from uc_historic_data_importer_spark.sources import listing as L
from uc_historic_data_importer_spark.sources import metadata as M
from uc_historic_data_importer_spark.sources.crypto_source import (
    decrypt_stream,
    read_encrypted_jsonl,
)


def _write(path: str, data: bytes = b"x") -> None:
    with open(path, "wb") as fh:
        fh.write(data)


def _encrypt(data: bytes, key: bytes, iv: bytes) -> bytes:
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    enc = Cipher(algorithms.AES(key), modes.CTR(iv)).encryptor()
    return enc.update(data) + enc.finalize()


@pytest.fixture()
def tree(tmp_path):
    d = tmp_path / "objects"
    d.mkdir()
    return str(d)


class TestListingAndPairing:
    def test_pairing_and_name_extraction(self, spark, tree):
        _write(os.path.join(tree, "db-1.coll-a.0001.json.gz.enc"))
        _write(os.path.join(tree, "db-1.coll-a.0001.json.encryption.json"))
        pairs = L.pair_files(L.list_local_objects(spark, tree)).collect()
        assert len(pairs) == 1
        p = pairs[0]
        assert p["db"] == "db-1" and p["collection"] == "coll-a"
        assert p["file_number"] == 1

    def test_data_without_metadata_raises(self, spark, tree):
        _write(os.path.join(tree, "db.c.0001.json.gz.enc"))
        with pytest.raises(L.MissingMetadataError):
            L.pair_files(L.list_local_objects(spark, tree))

    def test_metadata_without_data_dropped(self, spark, tree):
        _write(os.path.join(tree, "db.c.0001.json.encryption.json"))
        assert L.pair_files(L.list_local_objects(spark, tree)).count() == 0

    def test_unmatched_names_dropped(self, spark, tree):
        _write(os.path.join(tree, "README.txt"))
        _write(os.path.join(tree, "db.c.x.json.gz.enc"))  # non-numeric number
        assert L.pair_files(L.list_local_objects(spark, tree)).count() == 0

    def test_zero_byte_pair_dropped_but_half_empty_kept(self, spark, tree):
        _write(os.path.join(tree, "db.c.0001.json.gz.enc"), b"")
        _write(os.path.join(tree, "db.c.0001.json.encryption.json"), b"")
        _write(os.path.join(tree, "db.c.0002.json.gz.enc"), b"data")
        _write(os.path.join(tree, "db.c.0002.json.encryption.json"), b"")
        pairs = L.drop_zero_byte_pairs(L.pair_files(L.list_local_objects(spark, tree)))
        rows = pairs.collect()
        assert len(rows) == 1 and rows[0]["file_number"] == 2

    def test_oversized_filter(self, spark, tree):
        _write(os.path.join(tree, "db.c.0001.json.gz.enc"), b"x" * 100)
        _write(os.path.join(tree, "db.c.0001.json.encryption.json"))
        pairs = L.pair_files(L.list_local_objects(spark, tree))
        assert L.filter_oversized(pairs, max_size=50).count() == 0
        assert L.filter_oversized(pairs, max_size=200).count() == 1


class TestMetadata:
    def _mk(self, tree, meta: dict):
        _write(os.path.join(tree, "db.c.0001.json.gz.enc"), b"payload")
        with open(os.path.join(tree, "db.c.0001.json.encryption.json"), "w") as fh:
            json.dump(meta, fh)

    def test_parse_ok(self, spark, tree):
        self._mk(tree, {
            "keyEncryptionKeyId": "kek", "encryptedEncryptionKey": "E",
            "initialisationVector": "IV", "plaintextDatakey": "P",
        })
        out = M.parse_metadata(L.pair_files(L.list_local_objects(spark, tree))).collect()
        assert out[0]["key_encryption_key_id"] == "kek"

    @pytest.mark.parametrize("missing", M.REQUIRED_FIELDS)
    def test_blank_required_field_raises(self, spark, tree, missing):
        meta = {
            "keyEncryptionKeyId": "kek", "encryptedEncryptionKey": "E",
            "initialisationVector": "IV",
        }
        meta[missing] = "  "
        self._mk(tree, meta)
        with pytest.raises(M.MetadataValidationError):
            M.parse_metadata(L.pair_files(L.list_local_objects(spark, tree)))

    def test_key_resolution_deduplicates(self, spark, tree):
        self._mk(tree, {
            "keyEncryptionKeyId": "kek", "encryptedEncryptionKey": "E",
            "initialisationVector": "IV",
        })
        calls = []

        class Svc:
            def decrypt_key(self, kid, ek):
                calls.append((kid, ek))
                return "PLAIN"

        pairs = M.parse_metadata(L.pair_files(L.list_local_objects(spark, tree)))
        keymap = M.resolve_data_keys(pairs, Svc())
        assert keymap == {("kek", "E"): "PLAIN"}
        assert calls == [("kek", "E")]


class TestCryptoSource:
    def test_decrypt_stream_roundtrip(self):
        import io

        key, iv = os.urandom(32), os.urandom(16)
        plain = b"hello world" * 1000
        ct = _encrypt(plain, key, iv)
        out = decrypt_stream(
            io.BufferedReader(io.BytesIO(ct)),
            base64.b64encode(key).decode(),
            base64.b64encode(iv).decode(),
        ).read()
        assert out == plain

    def test_read_encrypted_jsonl_end_to_end(self, spark, tree):
        key, iv = os.urandom(32), os.urandom(16)
        lines = [json.dumps({"_id": str(i)}) for i in range(5)]
        payload = _encrypt(gzip.compress(("\n".join(lines) + "\n").encode()), key, iv)
        _write(os.path.join(tree, "mydb.coll.0003.json.gz.enc"), payload)
        with open(os.path.join(tree, "mydb.coll.0003.json.encryption.json"), "w") as fh:
            json.dump({
                "keyEncryptionKeyId": "kek", "encryptedEncryptionKey": "E",
                "initialisationVector": base64.b64encode(iv).decode(),
            }, fh)
        pairs = M.parse_metadata(L.pair_files(L.list_local_objects(spark, tree)))
        keymap = {("kek", "E"): base64.b64encode(key).decode()}
        out = read_encrypted_jsonl(pairs, keymap).collect()
        assert len(out) == 5
        assert [r["line_no"] for r in sorted(out, key=lambda r: r["line_no"])] == [1, 2, 3, 4, 5]
        assert all(r["db"] == "mydb" and r["file_number"] == 3 for r in out)
