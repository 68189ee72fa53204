#!/bin/bash
# Focused counterbalanced mini-A/B for the r7 writer escape change
# (literal F.replace vs regexp_replace in sinks/nquads._escape_literal):
# only the three serialization queries, HEAD (wt_w1) vs pre-change
# 399883d (wt_w0), fresh JVM per run, 3 pairs alternating order.
# Usage:
#   git worktree add /dev/shm/wt_w0 399883d
#   git worktree add /dev/shm/wt_w1 HEAD
#   bash tools/run_miniab_writer.sh
set -u
OUT=/root/repo/BENCH/miniab_writer_r7.jsonl
: > "$OUT"

run_one() {
  local rep=$1 v=$2
  local res
  res=$(cd /dev/shm/wt_$v && SPARK_GRAFT_CPUS=32 timeout 600 python - <<'EOF' 2>/dev/null | grep -a '^{' | tail -1
import json, sys, time
sys.path.insert(0, ".")
import __spark_entry__ as e
from rml_utils_processor_ts_spark import get_spark
spark = get_spark("miniab", cpus="32")
spark.sparkContext.setLogLevel("ERROR")
qs = {**e.QUERIES, **e.EXTRA_QUERIES}
out = {}
for name in ("nquads_lines", "ntriples_lines", "turtle_lines"):
    fn = qs[name]
    fn(spark, "/root/testdata/sf0.1").count()  # warm-up
    times = []
    for _ in range(3):
        t0 = time.time(); fn(spark, "/root/testdata/sf0.1").count()
        times.append(time.time() - t0)
    times.sort()
    out[name] = round(times[1], 3)
print(json.dumps(out))
EOF
)
  if [ -n "$res" ]; then
    printf '{"rep": %d, "version": "%s", "queries": %s}\n' "$rep" "$v" "$res" >> "$OUT"
  else
    printf '{"rep": %d, "version": "%s", "queries": null}\n' "$rep" "$v" >> "$OUT"
  fi
  echo "rep $rep $v done"
}

for pair in 1 2 3; do
  if [ $((pair % 2)) -eq 1 ]; then first=w0; second=w1; else first=w1; second=w0; fi
  run_one "$pair" "$first"
  run_one "$pair" "$second"
done
echo MINIAB DONE
