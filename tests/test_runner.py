"""CLI runner (run.py) coverage: plain-JSONL mode end to end with the
variant fixture, plus filter/run-mode flags."""

import json
import os

from tests.fixtures import SKIP_EARLIER_THAN, SKIP_LATER_THAN, write_dump_file
from uc_historic_data_importer_spark.run import main


def test_runner_plain_jsonl(spark, tmp_path, capsys):
    inp = tmp_path / "in"
    inp.mkdir()
    n = write_dump_file(str(inp / "database-1.collection-1.0001.json"))
    kv = str(tmp_path / "kv")
    manifests = str(tmp_path / "manifests")

    rc = main([
        "--input-dir", str(inp),
        "--plain-jsonl",
        "--kv-path", kv,
        "--manifest-dir", manifests,
        "--skip-earlier-than", SKIP_EARLIER_THAN,
        "--skip-later-than", SKIP_LATER_THAN,
        "--master", "local[4]",
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["files_processed"] == 1
    assert report["records_processed"] == n
    assert report["put_count"] == n - 4  # malformed, no_id, too_early, too_late
    assert report["filtered_too_early"] == 1
    assert report["filtered_too_late"] == 1
    assert report["parse_errors"] == 1
    assert os.path.exists(kv)
    assert os.listdir(manifests) == ["db.database-1.collection-1-000001.csv"]


def test_runner_manifest_only_mode(spark, tmp_path, capsys):
    inp = tmp_path / "in2"
    inp.mkdir()
    write_dump_file(str(inp / "db-2.coll.0001.json"))
    kv = str(tmp_path / "kv2")
    manifests = str(tmp_path / "manifests2")
    rc = main([
        "--input-dir", str(inp),
        "--plain-jsonl",
        "--run-mode", "manifest",
        "--kv-path", kv,
        "--manifest-dir", manifests,
        "--master", "local[4]",
    ])
    assert rc == 0
    assert not os.path.exists(kv)  # import sink gated off
    assert len(os.listdir(manifests)) == 1


def test_runner_compact_mode(spark, tmp_path, capsys):
    inp = tmp_path / "in3"
    inp.mkdir()
    write_dump_file(str(inp / "db-3.coll.0001.json"))
    kv = str(tmp_path / "kv3")
    rc = main([
        "--input-dir", str(inp), "--plain-jsonl",
        "--run-mode", "import", "--kv-path", kv,
        "--master", "local[4]",
    ])
    assert rc == 0
    capsys.readouterr()
    out = str(tmp_path / "kv3_compacted")
    rc = main([
        "--compact-src", kv, "--compact-out", out,
        "--keep-versions", "1", "--master", "local[4]",
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["mode"] == "compact"
    # compaction keeps exactly one cell per live key
    distinct_keys = (
        spark.read.parquet(kv).select("table", "key_hex").distinct().count()
    )
    assert report["kept_cells"] == distinct_keys


def test_apply_changelog_mode(spark, tmp_path):
    from uc_historic_data_importer_spark import run as runner

    log1 = tmp_path / "log1"
    spark.createDataFrame(
        [(1, 1, "P", 10.0), (2, 1, "P", 20.0)],
        "id BIGINT, seq BIGINT, op STRING, score DOUBLE",
    ).write.parquet(str(log1))
    log2 = tmp_path / "log2"
    spark.createDataFrame(
        [(2, 2, "D", None), (3, 2, "P", 30.0)],
        "id BIGINT, seq BIGINT, op STRING, score DOUBLE",
    ).write.parquet(str(log2))
    base = str(tmp_path / "snap")

    assert runner.main([
        "--apply-changelog", str(log1), "--snapshot-base", base,
        "--merge-keys", "id", "--master", "local[2]",
    ]) == 0
    assert runner.main([
        "--apply-changelog", str(log2), "--snapshot-base", base,
        "--merge-keys", "id", "--master", "local[2]",
    ]) == 0
    final = {r["id"]: r["score"]
             for r in spark.read.parquet(f"{base}/v=1").collect()}
    assert final == {1: 10.0, 3: 30.0}
