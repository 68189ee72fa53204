#!/bin/bash
# Round-7 counterbalanced A/B/A: r06 (commit 3600482, the tree BENCH_r06
# measured) vs r07 HEAD. Both versions run from /dev/shm worktrees so
# code I/O is symmetric (r6 ran HEAD from disk vs worktree from tmpfs —
# an asymmetry this protocol removes). Fresh JVM per run, one bench at a
# time, SPARK_GRAFT_CPUS=32, default sf dir (/root/testdata/sf0.1) to
# stay comparable with the driver's BENCH_r{N}.json runs.
#
# Counterbalanced order (r6 lesson: position 2 in a pair pays ~0.4 s):
# pair orders alternate AB BA AB BA AB BA (6 pairs, 12 runs).
#
# Usage: bash tools/run_aba7.sh   (after wt_r06/wt_r07 exist — see below)
#   git worktree add /dev/shm/wt_r06 3600482
#   git worktree add /dev/shm/wt_r07 <r7-commit>
set -u
OUT=/root/repo/BENCH/aba_r7.jsonl

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
  if [ $((pair % 2)) -eq 1 ]; then first=r06; second=r07; else first=r07; second=r06; fi
  run_one "$pair" "$first"
  run_one "$pair" "$second"
done
echo ALL DONE
