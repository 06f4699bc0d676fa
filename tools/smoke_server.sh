#!/usr/bin/env bash
# Packaged-entry-point smoke: boots tools/graft-server (thin jar +
# /opt/spark/jars) on a real port, drives one RPC round-trip with curl,
# then reboots a FRESH data dir with --restore-from pointed at the first
# server's bucket and proves the stream came back. Exit 0 = both pass.
set -euo pipefail
repo="$(cd "$(dirname "$0")/.." && pwd)"
port="${1:-5641}"
work="$(mktemp -d /tmp/graft-smoke-XXXX)"
trap 'kill $srv_pid 2>/dev/null || true; rm -rf "$work"' EXIT

post() { # path json
  curl -sf -X POST "http://127.0.0.1:$port$1" \
    -H "Authorization: Bearer smoketoken" -d "$2"
}
wait_boot() {
  for _ in $(seq 1 120); do
    curl -sf -X POST "http://127.0.0.1:$port/module/exists" \
      -H "Authorization: Bearer smoketoken" -d '{"cid":"x"}' >/dev/null 2>&1 && return 0
    sleep 1
  done
  echo "server never came up" >&2; return 1
}

echo "== boot 1: fresh server with a reference-format backup sweep =="
"$repo/tools/graft-server" server -l "127.0.0.1:$port" -d "$work/data" \
  --unsafe-auth-token smoketoken --spark-master 'local[4]' \
  --backup-dest "file:$work/bak" --backup-format reference \
  --backup-sweep-ms 300 > "$work/server1.log" 2>&1 &
srv_pid=$!
wait_boot

cid=$(post /module/upload '{"module":{"init_sql":"CREATE TABLE IF NOT EXISTS notes (idx BIGINT, n BIGINT) USING PARQUET","materializer":"INSERT INTO notes SELECT idx, drisl_extract_long(payload, '\''.n'\'') FROM event","queries":{"list":{"sql":"SELECT idx, n FROM notes ORDER BY idx"}}}}' \
  | python3 -c 'import sys,json; print(json.load(sys.stdin)["ok"]["cid"])')
echo "module: $cid"
sid=$(post /stream/create "{\"id\":\"did:graft:smoke\",\"module_cid\":\"$cid\"}" \
  | python3 -c 'import sys,json; print(json.load(sys.stdin)["ok"]["id"])')
# payload {"n": 7} as drisl (cbor): a1 61 6e 07 -> b64
pl=$(python3 -c 'import base64; print(base64.b64encode(bytes.fromhex("a1616e07")).decode())')
post /stream/event_batch "{\"id\":\"$sid\",\"events\":[{\"user\":\"u\",\"payload_b64\":\"$pl\"}]}" >/dev/null
rows=$(post /stream/query "{\"id\":\"$sid\",\"query\":{\"name\":\"list\"}}" \
  | python3 -c 'import sys,json; print(len(json.load(sys.stdin)["ok"]["rows"]))')
[[ "$rows" == 1 ]] || { echo "query returned $rows rows"; exit 1; }
echo "round-trip ok ($rows row)"

echo "== wait for the sweep to export the stream =="
for _ in $(seq 1 60); do
  [[ -f "$work/bak/streams/$sid/metadata.drisl" && \
     -f "$work/bak/streams/$sid/1-1.events.drisl.zstd" ]] && break
  sleep 1
done
[[ -f "$work/bak/streams/$sid/1-1.events.drisl.zstd" ]] || { echo "sweep never exported"; exit 1; }
kill "$srv_pid"; wait "$srv_pid" 2>/dev/null || true
echo "export ok"

echo "== boot 2: FRESH data dir restored from the bucket =="
"$repo/tools/graft-server" server -l "127.0.0.1:$port" -d "$work/data2" \
  --unsafe-auth-token smoketoken --spark-master 'local[4]' \
  --restore-from "file:$work/bak" > "$work/server2.log" 2>&1 &
srv_pid=$!
wait_boot
rows=$(post /stream/query "{\"id\":\"$sid\",\"query\":{\"name\":\"list\"}}" \
  | python3 -c 'import sys,json; print(len(json.load(sys.stdin)["ok"]["rows"]))')
[[ "$rows" == 1 ]] || { echo "restored query returned $rows rows"; exit 1; }
echo "restore-from boot ok ($rows row) — smoke PASSED"
