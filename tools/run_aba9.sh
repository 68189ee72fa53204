#!/bin/bash
# Round-9 counterbalanced A/B/A: r08 (commit cb8476d, the tree
# BENCH_r08 measured) vs r09 HEAD. Both versions run from /dev/shm
# worktrees (symmetric code I/O), fresh JVM per run, one bench at a
# time, SPARK_GRAFT_CPUS=32, default sf dir (/root/testdata/sf0.1).
#
# Counterbalanced order (r6 lesson: position 2 in a pair pays ~0.4 s):
# pair orders alternate AB BA AB BA AB BA (6 pairs, 12 runs).
#
# Usage:
#   git worktree add /dev/shm/wt_r08 cb8476d
#   git worktree add /dev/shm/wt_r09 <r9-commit>
#   bash tools/run_aba9.sh
set -u
OUT=/root/repo/BENCH/aba_r9.jsonl

run_one() {
  local rep=$1 v=$2
  local dir=/dev/shm/wt_$v
  local res
  res=$(cd "$dir" && SPARK_GRAFT_CPUS=32 timeout 900 python bench.py 2>/dev/null | grep -a '^{' | tail -1)
  if [ -n "$res" ]; then
    printf '{"rep": %d, "version": "%s", "result": %s}\n' "$rep" "$v" "$res" >> "$OUT"
  else
    printf '{"rep": %d, "version": "%s", "result": null}\n' "$rep" "$v" >> "$OUT"
  fi
  echo "rep $rep $v done"
}

for pair in 1 2 3 4 5 6; do
  if [ $((pair % 2)) -eq 1 ]; then first=r08; second=r09; else first=r09; second=r08; fi
  run_one "$pair" "$first"
  run_one "$pair" "$second"
done
echo ALL DONE
