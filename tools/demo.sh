#!/usr/bin/env bash
# End-to-end demo: boot graft.ServerMain, write points over HTTP + TCP,
# query them back, exercise metadata endpoints, shut down.
#
#   bash tools/demo.sh
#
# Requires: sbt (first call compiles), curl, nc. Uses ephemeral-ish high
# ports and a throwaway store dir.
set -euo pipefail
cd "$(dirname "$0")/.."

STORE=$(mktemp -d /tmp/graft_demo.XXXXXX)
HTTP=16182 TCP=16181 INFLUX=16180 UDP=16179
LOG=$STORE/server.log

echo "== booting server (store=$STORE) =="
sbt -batch "runMain graft.ServerMain $STORE $HTTP $TCP $INFLUX $UDP 5" \
  >"$LOG" 2>&1 &
SBT_PID=$!
trap 'kill $SBT_PID 2>/dev/null || true; pkill -P $SBT_PID 2>/dev/null || true' EXIT

for i in $(seq 1 120); do
  grep -q "graft serving" "$LOG" 2>/dev/null && break
  sleep 1
done
grep "graft serving" "$LOG" || { echo "server did not boot"; tail -20 "$LOG"; exit 1; }

echo "== /api/version =="
curl -s "localhost:$HTTP/api/version"; echo

echo "== HTTP put (JSON + plain) =="
curl -s -XPOST "localhost:$HTTP/api/put" -d '[
  {"metric":"demo.cpu","timestamp":1704412800,"value":42.5,"tags":{"host":"a"}},
  {"metric":"demo.cpu","timestamp":1704412860,"value":43.0,"tags":{"host":"a"}}]'; echo
curl -s -XPOST "localhost:$HTTP/api/put" \
  -d 'put demo.cpu 1704412920 44.5 host=b'; echo "(plain put ok)"

echo "== InfluxDB line write =="
curl -s -XPOST "localhost:$HTTP/api/write" \
  -d 'weather,city=SF temp=65.5 1704412800000000000'; echo "(influx ok)"

if command -v nc >/dev/null; then
  echo "== TCP plain put =="
  printf 'put demo.cpu 1704412980 45.0 host=b\nversion\n' | nc -q1 localhost "$TCP" || true
else
  echo "== TCP plain put skipped (nc not installed; SocketSpec covers it) =="
fi

sleep 3  # let the micro-batchers flush

echo "== query back (GET m= grammar) =="
curl -s "localhost:$HTTP/api/query?start=1704412000&end=1704413000&m=sum:demo.cpu"; echo

echo "== POST query with downsample + group-by =="
curl -s -XPOST "localhost:$HTTP/api/query" -d '{
  "start":1704412000,"end":1704413000,
  "queries":[{"metric":"demo.cpu","aggregator":"none",
              "downsample":"1m-avg",
              "filters":[{"type":"wildcard","tagk":"host","filter":"*","groupBy":true}]}]}'; echo

echo "== suggest / aggregators / stats =="
curl -s "localhost:$HTTP/api/suggest?type=metrics&q=demo"; echo
curl -s "localhost:$HTTP/api/aggregators" | head -c 120; echo " ..."
curl -s "localhost:$HTTP/api/stats" | head -3

echo "== done; store contents =="
find "$STORE" -maxdepth 2 -type d | sed "s|$STORE|.|" | sort | head -12
