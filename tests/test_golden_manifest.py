"""Byte-exact golden manifest test against the reference integration spec.

Reproduces the reference's own end-to-end fixture — sample_data.py with
`-n2 -s10 -gjfvbarcedimotk` (docker/s3-init/environment.sh:32, generator
docker/s3-init/sample_data.py:51-233) — as four encrypted dump files,
runs the FULL pipeline (list -> pair -> metadata -> decrypt -> gunzip ->
normalize -> manifest sink), and compares the concatenated manifest
content byte-for-byte with the spec's 72 expected lines
(UCHistoricDataImporterSpec.kt:129-221: 4 files x 18 records, joined in
listing order).

This is the capstone over the per-case manifest tests: one wrong
timestamp fallback, id canonicalization, wrapper promotion, coalescing
rule, or CSV escape anywhere in the pipeline breaks the byte compare.
"""

import base64
import gzip
import json
import os

import pytest
from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

from uc_historic_data_importer_spark.plans import pipeline as P
from uc_historic_data_importer_spark.sources import listing as L
from uc_historic_data_importer_spark.sources import metadata as M
from uc_historic_data_importer_spark.sources.crypto_source import (
    read_encrypted_jsonl,
)

# ---- fixture generation: faithful port of the reference's sample_data ----

_guid_counter = 0


def _guid() -> str:
    # deterministic stand-in for uuid4 — guids never reach the manifest
    global _guid_counter
    _guid_counter += 1
    return f"00000000-0000-4000-8000-{_guid_counter:012d}"


def db_object(i: int) -> dict:
    """The dbObject template (sample_data.py:195-233), key order intact."""
    return {
        "_id": {"someId": "RANDOM_GUID"},
        "type": "addressDeclaration",
        "contractId": "RANDOM_GUID",
        "addressNumber": {"type": "AddressLine", "cryptoId": "RANDOM_GUID"},
        "townCity": {"type": "AddressLine", "cryptoId": "RANDOM_GUID"},
        "postcode": "SM5 2LE",
        "processId": "RANDOM_GUID",
        "effectiveDate": {
            "type": "SPECIFIC_EFFECTIVE_DATE",
            "date": 20150320,
            "knownDate": 20150320,
        },
        "paymentEffectiveDate": {
            "type": "SPECIFIC_EFFECTIVE_DATE",
            "date": 20150320,
            "knownDate": 20150320,
        },
        "createdDateTime": {"$date": "2015-03-20T12:23:25.183Z"},
        "_version": 2,
        "_lastModifiedDateTime": {"$date": f"2018-12-01T15:01:02.{i:03d}Z"},
    }


def db_object_json(batch: str, i: int, native_id: bool = False) -> str:
    record = db_object(i)
    if native_id:
        record["_id"] = {"$oid": f"{batch}-{(i // 20) + 1}"}
    else:
        record["_id"]["declarationId"] = f"{batch}-{(i // 20) + 1}"
    record["contractId"] = _guid()
    record["addressNumber"]["cryptoId"] = _guid()
    record["townCity"]["cryptoId"] = _guid()
    record["processId"] = _guid()
    return json.dumps(record)


def file_lines(db: str, coll: str, batch_no: int) -> str:
    """One dump file's content: 10 base records + the -m -o -i -a -r -v
    -d -g -j -t flag records, in generator order (sample_data.py:64-130)."""
    batch = f"{db}.{coll}.{batch_no:04d}"
    out = [db_object_json(batch, j) for j in range(10)]
    j = 9
    rec = db_object_json(batch, j)
    out.append(rec[: len(rec) // 2])  # -m malformed
    out.append(db_object_json(batch, j, native_id=True))  # -o mongo id
    jso = json.loads(db_object_json(batch, j))  # -i no id
    del jso["_id"]
    out.append(json.dumps(jso))
    jso = json.loads(db_object_json(batch, j))  # -a date in id
    jso["_id"]["createdDateTime"] = {"$date": "2010-01-01T00:00:00.000Z"}
    out.append(json.dumps(jso))
    jso = json.loads(db_object_json(batch, j))  # -r removed
    jso["_removedDateTime"] = {"$date": "2012-03-04T21:43:56.000Z"}
    out.append(json.dumps({"_removed": jso}))
    jso = json.loads(db_object_json(batch, j))  # -v archived
    jso["_archivedDateTime"] = {"$date": "2014-03-02T12:34:56.000Z"}
    out.append(json.dumps({"_archived": jso}))
    jso = json.loads(db_object_json(batch, j))  # -d no last modified
    del jso["_lastModifiedDateTime"]
    out.append(json.dumps(jso))
    jso = json.loads(db_object_json(batch, j))  # -g early
    jso["_lastModifiedDateTime"] = {"$date": "2000-01-01T12:34:56.000Z"}
    out.append(json.dumps(jso))
    jso = json.loads(db_object_json(batch, j))  # -j late
    jso["_lastModifiedDateTime"] = {"$date": "2020-06-29T12:34:56.000Z"}
    out.append(json.dumps(jso))
    jso = json.loads(db_object_json(batch, j))  # -t no timestamps at all
    del jso["_lastModifiedDateTime"]
    del jso["createdDateTime"]
    out.append(json.dumps(jso))
    return "\n".join(out) + "\n"


# (db, uncoalesced collection, batch number) for -n2 -s10 -b -f
FILES = [
    ("database-1", "collection-1", 1),
    ("database-1", "collection-1", 2),
    ("database-1", "collection-thirtyone", 1),
    ("agent_core", "agentToDoArchive", 1),
]

# ---- expected golden content (UCHistoricDataImporterSpec.kt:129-199) ----

REMOVED_TS = 1330897436000  # 2012-03-04T21:43:56.000Z
ARCHIVED_TS = 1393763696000  # 2014-03-02T12:34:56.000Z
EARLY_TS = 946730096000  # 2000-01-01T12:34:56.000Z
LATE_TS = 1593434096000  # 2020-06-29T12:34:56.000+0000
CREATED_TS = 1426854205183  # 2015-03-20T12:23:25.183Z
EPOCH_TS = 315532800000  # 1980-01-01T00:00:00.000Z
BASE_TS = 1543676462000  # 2018-12-01T15:01:02.000Z


def expected_file_lines(db: str, coll_out: str, batch: str) -> list[str]:
    did = f"{batch}-1"
    plain = (
        f'"{{""declarationId"":""{did}"",""someId"":""RANDOM_GUID""}}"'
    )
    tail = f"{db}|{coll_out}|IMPORT|HDI"
    lines = [
        f"{plain}|{BASE_TS + j}|{tail}|{plain}|MONGO_IMPORT" for j in range(10)
    ]
    lines.append(
        f'{did}|{BASE_TS + 9}|{tail}|"{{""$oid"":""{did}""}}"|MONGO_IMPORT'
    )
    lines.append(
        f'"{{""createdDateTime"":""2010-01-01T00:00:00.000+0000"",'
        f'""declarationId"":""{did}"",""someId"":""RANDOM_GUID""}}"'
        f"|{BASE_TS + 9}|{tail}|"
        f'"{{""createdDateTime"":{{""$date"":""2010-01-01T00:00:00.000Z""}},'
        f'""declarationId"":""{did}"",""someId"":""RANDOM_GUID""}}"'
        f"|MONGO_IMPORT"
    )
    lines.append(f"{plain}|{REMOVED_TS}|{tail}|{plain}|MONGO_DELETE")
    lines.append(f"{plain}|{ARCHIVED_TS}|{tail}|{plain}|MONGO_DELETE")
    lines.append(f"{plain}|{CREATED_TS}|{tail}|{plain}|MONGO_IMPORT")
    lines.append(f"{plain}|{EARLY_TS}|{tail}|{plain}|MONGO_IMPORT")
    lines.append(f"{plain}|{LATE_TS}|{tail}|{plain}|MONGO_IMPORT")
    lines.append(f"{plain}|{EPOCH_TS}|{tail}|{plain}|MONGO_IMPORT")
    return lines


def expected_joined() -> str:
    # manifest files compared in listing (name-sorted) order, like the
    # spec's S3 listObjectsV2 enumeration
    blocks = {
        "db.agent_core.agentToDoArchive-000001.csv": expected_file_lines(
            "agent_core", "agentToDo", "agent_core.agentToDoArchive.0001"
        ),
        "db.database-1.collection-1-000001.csv": expected_file_lines(
            "database-1", "collection-1", "database-1.collection-1.0001"
        ),
        "db.database-1.collection-1-000002.csv": expected_file_lines(
            "database-1", "collection-1", "database-1.collection-1.0002"
        ),
        "db.database-1.collection-thirtyone-000001.csv": expected_file_lines(
            "database-1", "collection", "database-1.collection-thirtyone.0001"
        ),
    }
    return "\n".join(
        "\n".join(blocks[name]) for name in sorted(blocks)
    )


class TestGoldenManifest:
    @pytest.fixture(scope="class")
    def manifest_dir(self, spark, tmp_path_factory):
        src = str(tmp_path_factory.mktemp("dump"))
        key = os.urandom(32)
        for db, coll, n in FILES:
            iv = os.urandom(16)
            enc = Cipher(algorithms.AES(key), modes.CTR(iv)).encryptor()
            payload = enc.update(
                gzip.compress(file_lines(db, coll, n).encode("utf-8"))
            )
            stem = f"{db}.{coll}.{n:04d}"
            with open(os.path.join(src, f"{stem}.json.gz.enc"), "wb") as fh:
                fh.write(payload)
            with open(
                os.path.join(src, f"{stem}.json.encryption.json"), "w"
            ) as fh:
                json.dump(
                    {
                        "keyEncryptionKeyId": "cloudhsm:1,2",
                        "encryptedEncryptionKey": "RU5DS0VZ",
                        "initialisationVector": base64.b64encode(iv).decode(),
                    },
                    fh,
                )
        pairs = M.parse_metadata(L.pair_files(L.list_local_objects(spark, src)))
        keymap = {
            ("cloudhsm:1,2", "RU5DS0VZ"): base64.b64encode(key).decode()
        }
        lines = read_encrypted_jsonl(pairs, keymap)
        mdir = str(tmp_path_factory.mktemp("manifest"))
        P.run(
            spark,
            lines,
            P.PipelineConfig(run_mode="manifest"),
            manifest_dir=mdir,
        )
        return mdir

    def test_manifest_content_byte_exact(self, manifest_dir):
        names = sorted(os.listdir(manifest_dir))
        assert names == [
            "db.agent_core.agentToDoArchive-000001.csv",
            "db.database-1.collection-1-000001.csv",
            "db.database-1.collection-1-000002.csv",
            "db.database-1.collection-thirtyone-000001.csv",
        ]
        contents = []
        for name in names:
            with open(os.path.join(manifest_dir, name)) as fh:
                text = fh.read().strip()
            assert len(text.split("\n")) == 18, name
            contents.append(text)
        joined = "\n".join(contents)
        expected = expected_joined()
        if joined != expected:
            got_l, want_l = joined.split("\n"), expected.split("\n")
            for i, (g, w) in enumerate(zip(got_l, want_l)):
                assert g == w, f"line {i}:\n got: {g}\nwant: {w}"
        assert joined == expected
