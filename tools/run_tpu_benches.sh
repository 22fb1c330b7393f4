#!/bin/bash
# Serialized TPU measurement pass (the axon tunnel is single-tenant: run
# benches one at a time). Writes JSON+logs to ${OUT:-/tmp/r3b}.
set -u
R=$(dirname "$(dirname "$(readlink -f "$0")")")
OUT=${OUT:-/tmp/r3b}
mkdir -p "$OUT"
cd /tmp
run() { # name cmd...
  name=$1; shift
  echo "=== $name ==="
  timeout "${T:-1700}" "$@" > "$OUT/$name.json" 2> "$OUT/$name.log"
  echo "exit=$?"
  cat "$OUT/$name.json"
}
run bench        python "$R/bench.py"
T=3400 run parts python "$R/tools/bench_train_parts.py" full unfused_caption no_caption fixed_match
run early_exit   python "$R/tools/bench_early_exit.py"
T=1700 run eval_e2e python "$R/tools/bench_eval_e2e.py"
T=1200 run longvideo python "$R/tools/bench_longvideo.py"
T=1200 run longvideo_ee python "$R/tools/bench_longvideo.py" --early-exit --eos-bias 6
echo "ALL DONE"
