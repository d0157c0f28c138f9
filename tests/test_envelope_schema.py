"""JSON-Schema validation of produced message envelopes.

Mirrors the reference's strongest envelope test: every message the
pipeline produces must validate against the published message schema
(reference src/test/resources/message.schema.json:1-70, exercised by
MessageProducerTest.kt:58-392). The string asserts in test_pipeline pin
exact layouts for known fixtures; this validates STRUCTURE for every
record shape — required keys, types, the encryption block, the
timestamp pattern — plus the seven provenance booleans the reference
compares field-by-field, so envelope drift cannot slip past fixture
updates.
"""

import base64
import json
import os

import pytest

jsonschema = pytest.importorskip("jsonschema")

from uc_historic_data_importer_spark.plans import pipeline as P

# constraints transcribed from the reference schema (message.schema.json):
# draft-07, message object required with @type/_id/_lastModifiedDateTime/
# collection/db/dbObject/encryption; kek id pinned to the cloudhsm format
MESSAGE_SCHEMA = {
    "$schema": "http://json-schema.org/draft-07/schema#",
    "type": "object",
    "required": ["message"],
    "properties": {
        "message": {
            "type": "object",
            "required": [
                "@type",
                "_id",
                "_lastModifiedDateTime",
                "collection",
                "db",
                "dbObject",
                "encryption",
            ],
            "properties": {
                "@type": {"type": "string"},
                "_id": {
                    "type": ["object", "string", "integer"],
                    "minProperties": 1,
                    "minLength": 1,
                },
                "_lastModifiedDateTime": {
                    "type": "string",
                    "pattern": (
                        r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}"
                        r"\.\d{3}(\+\d{4}|Z)?$"
                    ),
                },
                "collection": {"type": "string", "minLength": 1},
                "db": {"type": "string", "minLength": 1},
                "dbObject": {"type": "string", "minLength": 1},
                "encryption": {
                    "type": "object",
                    "required": [
                        "keyEncryptionKeyId",
                        "initialisationVector",
                        "encryptedEncryptionKey",
                    ],
                    "properties": {
                        "keyEncryptionKeyId": {
                            "type": "string",
                            "pattern": r"^cloudhsm:\d+,\d+$",
                        },
                        "initialisationVector": {
                            "type": "string",
                            "minLength": 1,
                        },
                        "encryptedEncryptionKey": {
                            "type": "string",
                            "minLength": 1,
                        },
                    },
                },
            },
        }
    },
}

PROVENANCE_BOOLEANS = [
    "mongo_format_stripped_from_id",
    "last_modified_date_time_was_altered",
    "created_date_time_was_altered",
    "removed_date_time_was_altered",
    "archived_date_time_was_altered",
    "historic_removed_record_altered_on_import",
    "historic_archived_record_altered_on_import",
]

# one raw line per distinct envelope-shaping path: $oid id, object id,
# string id, removed wrapper, archived wrapper, $date id field, no
# last-modified (epoch fallback), explicit createdDateTime
RAW_LINES = [
    '{"_id":{"$oid":"aabbccddeeff001122334455"},"v":1,'
    '"_lastModifiedDateTime":{"$date":"2019-07-04T07:27:35.104Z"}}',
    '{"_id":{"citizenId":"c-1","claimId":"cl-2"},"v":2,'
    '"_lastModifiedDateTime":"2018-12-14T15:01:02.000+0000"}',
    '{"_id":"plain-string-id","v":3,'
    '"createdDateTime":{"$date":"2017-02-02T09:01:01.000Z"}}',
    '{"_id":{"k":"removed"},"_removed":{"_id":{"k":"removed"},"x":1},'
    '"_removedDateTime":{"$date":"2020-05-05T05:05:05.000Z"}}',
    '{"_id":{"k":"archived"},"_archived":{"_id":{"k":"archived"},"y":2},'
    '"_archivedDateTime":{"$date":"2020-06-06T06:06:06.000Z"}}',
    '{"_id":{"createdDateTime":{"$date":"2017-02-02T09:01:01.000Z"},'
    '"other":"z"},"q":"r"}',
    '{"_id":{"k":"no-dates"},"v":9}',
    '{"_id":42,"v":10,'
    '"_lastModifiedDateTime":{"$date":"2021-01-01T00:00:00.000Z"}}',
]


@pytest.fixture(scope="module")
def envelopes(spark):
    rows = [
        ("db-a", "collection-b", 1, i + 1, raw)
        for i, raw in enumerate(RAW_LINES)
    ]
    lines = spark.createDataFrame(
        rows, ["db", "collection", "file_number", "line_no", "raw_json"]
    )
    cfg = P.PipelineConfig(
        encrypt=True,
        data_key_b64=base64.b64encode(os.urandom(32)).decode(),
        key_encryption_key_id="cloudhsm:1,2",
        encrypted_encryption_key="ZW5jcnlwdGVkLWtleQ==",
    )
    res = P.process_lines(lines, cfg)
    return [json.loads(r["envelope"]) for r in res.records.collect()]


class TestEnvelopeSchema:
    def test_every_envelope_validates(self, envelopes):
        assert len(envelopes) == len(RAW_LINES)
        validator = jsonschema.Draft7Validator(MESSAGE_SCHEMA)
        for env in envelopes:
            errors = sorted(validator.iter_errors(env), key=str)
            assert not errors, (
                f"envelope failed schema: {[e.message for e in errors]}\n"
                f"{json.dumps(env, indent=2)[:2000]}"
            )

    def test_provenance_booleans_present_and_typed(self, envelopes):
        for env in envelopes:
            msg = env["message"]
            for key in PROVENANCE_BOOLEANS:
                assert key in msg, key
                assert isinstance(msg[key], bool), (key, msg[key])

    def test_outer_run_context_fields(self, envelopes):
        for env in envelopes:
            assert env["@type"] == "HDI"
            for key in ("unitOfWorkId", "timestamp", "traceId", "version"):
                assert isinstance(env[key], str) and env[key], key
            assert env["message"]["timestamp_created_from"]

    def test_id_shapes_survive(self, envelopes):
        ids = [env["message"]["_id"] for env in envelopes]
        assert "plain-string-id" in ids
        # primitive ids are stringified (HBaseWriter.kt:405-406)
        assert "42" in ids
        assert {"citizenId": "c-1", "claimId": "cl-2"} in ids

    def test_schema_rejects_broken_envelope(self, envelopes):
        # sanity: the validator actually bites
        broken = json.loads(json.dumps(envelopes[0]))
        del broken["message"]["dbObject"]
        with pytest.raises(jsonschema.ValidationError):
            jsonschema.validate(broken, MESSAGE_SCHEMA)
        broken2 = json.loads(json.dumps(envelopes[0]))
        broken2["message"]["encryption"]["keyEncryptionKeyId"] = "not-hsm"
        with pytest.raises(jsonschema.ValidationError):
            jsonschema.validate(broken2, MESSAGE_SCHEMA)


def test_garbage_last_modified_still_yields_parseable_envelope(spark):
    # review regression: a plain-string _lastModifiedDateTime passes
    # through unparsed; with quotes/newlines in it the raw splice
    # produced invalid envelope JSON
    import json as _json

    from uc_historic_data_importer_spark.operators.envelope import (
        RunContext, passthrough_body, with_envelope,
    )
    from uc_historic_data_importer_spark.operators.keying import flatten_normalized
    from uc_historic_data_importer_spark.operators.naming import with_table_names
    from uc_historic_data_importer_spark.operators.transforms import normalize_records

    # delete path: version derives from _removedDateTime, so the
    # garbage plain-string _lastModifiedDateTime survives to the splice
    # (import-path records with unparseable LMDT skip as date_error)
    raw = (
        '{"_removed":{"_id":{"id":"r1"}},'
        '"_lastModifiedDateTime":"x\\"y\\\\z",'
        '"_removedDateTime":{"$date":"2020-01-01T00:00:00.000Z"}}'
    )
    lines = spark.createDataFrame(
        [("db1", "c", 1, 1, raw)],
        ["db", "collection", "file_number", "line_no", "raw_json"],
    )
    norm = with_table_names(flatten_normalized(normalize_records(lines)))
    ctx = RunContext(unit_of_work_id="u", timestamp="t", trace_id="tr")
    out = with_envelope(passthrough_body(norm.filter("valid")), ctx).first()
    env = _json.loads(out["envelope"])  # must parse
    assert env["message"]["_lastModifiedDateTime"] == 'x"y\\z'
