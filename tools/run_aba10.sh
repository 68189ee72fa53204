#!/bin/bash
# Counterbalanced A/B for round 10: alternate the round-start tree (A =
# /tmp/r9base, commit 3560d12) and the current tree (B = /root/repo),
# AB/BA order swapped each pair to cancel slow-drift host noise.
# Each leg is one full frozen-bench run (fresh JVM). Output: one JSON
# line per leg tagged with tree + pair, appended to BENCH/aba_r10.jsonl.
set -u
OUT=/root/repo/BENCH/aba_r10.jsonl
PAIRS=${1:-4}
run_leg() { # $1 tree-dir  $2 tag  $3 pair
  local line
  line=$(cd "$1" && timeout 900 python bench.py 2>/dev/null | tail -1)
  echo "{\"pair\": $3, \"tree\": \"$2\", \"result\": ${line:-null}}" >> "$OUT"
}
for ((p=0; p<PAIRS; p++)); do
  if (( p % 2 == 0 )); then
    run_leg /tmp/r9base A "$p";  run_leg /root/repo B "$p"
  else
    run_leg /root/repo B "$p";   run_leg /tmp/r9base A "$p"
  fi
done
echo done
