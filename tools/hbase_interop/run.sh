#!/usr/bin/env bash
# Real-HBase interop drive: prove the pure-Python HFile v3 artifacts are
# readable by actual HBase code and bulk-load cleanly into the
# reference's table spec. Requires docker + docker compose on the host;
# the repo env (pyspark) generates the fixture.
#
#   cd tools/hbase_interop && ./run.sh
#
# Steps:
#   1. generate_hfiles.py  -> out/<table>/cf/*.hfile + expected_cells.txt
#   2. docker compose up   -> standalone HBase (public Apache tarball)
#   3. hbase hfile -m -f   -> HFilePrettyPrinter opens each artifact
#                             (real HBase reader, pre-load sanity)
#   4. hbase shell load.rb -> create namespace + table (GZ, maxVersions
#                             MAX_INT, pre-split at the artifact's
#                             region boundaries — HbaseClient.kt:83-92)
#   5. hbase completebulkload (LoadIncrementalHFiles)
#   6. hbase shell verify.rb -> readAllVersions scan through the real
#                             read path -> observed_cells.txt
#   7. diff expected vs observed -> cell-exact round-trip or fail
set -euo pipefail
cd "$(dirname "$0")"

REPO_ROOT="$(cd ../.. && pwd)"
COMPOSE="${COMPOSE:-docker compose}"

echo "== [1/7] generating bulk-load fixture =="
PYTHONPATH="$REPO_ROOT" python generate_hfiles.py --out ./out

TABLE="$(head -1 out/table_spec.txt)"

echo "== [2/7] starting standalone HBase =="
$COMPOSE up -d --build hbase
echo -n "waiting for HBase master"
ready=0
for _ in $(seq 1 "${WAIT_TRIES:-90}"); do
  if $COMPOSE exec -T hbase bash -c \
      "echo \"status 'simple'\" | hbase shell -n" >/dev/null 2>&1; then
    ready=1
    break
  fi
  echo -n "."
  sleep 2
done
if [ "$ready" -ne 1 ]; then
  echo " FAILED: master never became ready (raise WAIT_TRIES for slow hosts)" >&2
  $COMPOSE logs --tail 50 hbase >&2 || true
  exit 1
fi
echo " up"

echo "== [3/7] HFilePrettyPrinter over every artifact =="
for f in out/"$TABLE"/cf/*.hfile; do
  $COMPOSE exec -T hbase hbase hfile -m -f "/bulk/$f" >/dev/null
  echo "  parsed: $f"
done

echo "== [4/7] creating table (GZ, maxVersions=MAX_INT, pre-split) =="
$COMPOSE exec -T hbase hbase shell -n /bulk/load.rb

echo "== [5/7] completebulkload =="
$COMPOSE exec -T hbase hbase completebulkload "/bulk/out/$TABLE" "$TABLE"

echo "== [6/7] scanning all versions through the real read path =="
$COMPOSE exec -T hbase hbase shell -n /bulk/verify.rb

echo "== [7/7] comparing cells =="
if diff -u out/expected_cells.txt out/observed_cells.txt; then
  echo "INTEROP OK: $(wc -l < out/expected_cells.txt) cells round-tripped"
else
  echo "INTEROP FAILED: cell mismatch (see diff above)" >&2
  exit 1
fi
