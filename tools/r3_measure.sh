#!/bin/bash
# Round-3 measurement chain (serial TPU use; each step retried because the
# remote compile service intermittently hangs RPCs).  Results land in
# /tmp/r3_measure/.  Run with the machine otherwise QUIET: the 2-vCPU host
# cannot absorb a concurrent pytest run without inflating every pass
# (measured: k=14 fresh pass 0.72 s contended vs 0.29 s quiet).
set -u
OUT=/tmp/r3_measure
mkdir -p $OUT
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  if [ -s "$OUT/$name.json" ]; then echo "skip $name (exists)"; return; fi
  for i in 1 2 3; do
    echo "=== $name attempt $i: $* ==="
    timeout "$t" "$@" > "$OUT/$name.log" 2>&1
    rc=$?
    grep -E '^\{' "$OUT/$name.log" | tail -1 > "$OUT/$name.json"
    if [ $rc -eq 0 ] && [ -s "$OUT/$name.json" ]; then
      cat "$OUT/$name.json"; return
    fi
    echo "  rc=$rc, retrying"
  done
  echo "FAILED $name"
}

run k14        1200 python bench.py --passes 3
run k14_hp     1200 python bench.py --passes 3 --hp-collapse
run k14_short  1200 python bench.py --passes 3 --read-len 150,150
run k31        1800 python bench.py --passes 2 --k 31 --l 25
run k63        1800 python bench.py --passes 2 --k 63 --l 25
run k127       1800 python bench.py --passes 2 --k 127 --l 25
run shards1    1800 python bench.py --passes 2 --shards 1
run table      2400 python bench.py --passes 1 --backend table --l 26
echo "ALL DONE"
