#!/usr/bin/env bash
# Freeze the reference's metric numbers as golden files (BASELINE.md
# procedure). Run on a NETWORKED GPU host with the reference repo checked
# out — this sandbox has neither network nor the reference's CUDA build, so
# this script is the executable form of the procedure, validated here by
# `--dry-run` (prints every command it would run).
#
# Usage:
#   tools/make_goldens.sh /path/to/GVL /path/to/checkpoints_dir [--dry-run]
#
# checkpoints_dir: the released run folders from the reference README's
# google-drive link (README.md:91-95), e.g. anet_tsp_msvg_dvc/,
# tacos_c3d_ssvg/ — each holding model-best-*.pth + info.json.
#
# Outputs: goldens/<run>/<task>.json metric files committed to this repo;
# the TPU rebuild is then held to +-0.5 pts against them (BASELINE.json).
set -euo pipefail
shopt -s nullglob

REF=${1:?path to the reference GVL checkout}
CKPTS=${2:?path to the downloaded checkpoint folders}
DRY=${3:-}
OUT=$(cd "$(dirname "$0")/.." && pwd)/goldens
mkdir -p "$OUT"

run() {
  echo "+ $*"
  if [ "$DRY" != "--dry-run" ]; then "$@"; fi
}

# stage checkpoints where the reference eval scripts expect them
run mkdir -p "$REF/save"
for d in "$CKPTS"/*/; do
  run cp -r "$d" "$REF/save/"
done

cd_ref() { cd "$REF"; }

# 1) ANet dense captioning (scripts/eval_anet_dvc.sh <run> <gpu>)
# 2) ANet grounding        (scripts/eval_anet_grounding.sh <run> <gpu>)
# 3) TACoS grounding       (scripts/eval_tacos_grouding.sh <run> <gpu>)
declare -A SCRIPTS=(
  [anet_dvc]="scripts/eval_anet_dvc.sh"
  [anet_grounding]="scripts/eval_anet_grounding.sh"
  [tacos_grounding]="scripts/eval_tacos_grouding.sh"
)

for d in "$CKPTS"/*/; do
  runid=$(basename "$d")
  case "$runid" in
    *tacos*) tasks="tacos_grounding" ;;
    *ssvg*)  tasks="anet_grounding" ;;
    *)       tasks="anet_dvc anet_grounding" ;;
  esac
  for task in $tasks; do
    echo "== $runid / $task =="
    if [ "$DRY" != "--dry-run" ]; then
      (cd "$REF" && bash "${SCRIPTS[$task]}" "$runid" 0)
      # the reference eval writes save/<runid>/<...>.json + logs its metric
      # dict; harvest the newest result/metric json into goldens/
      mkdir -p "$OUT/$runid"
      find "$REF/save/$runid" -name '*.json' -newer "$REF/save/$runid" \
        -exec cp {} "$OUT/$runid/" \;
    else
      echo "+ (cd $REF && bash ${SCRIPTS[$task]} $runid 0)"
      echo "+ cp save/$runid/*.json -> $OUT/$runid/"
    fi
  done
done

# 4) reference GPU eval throughput for bench.py's vs_baseline denominator
run python "$(dirname "$0")/bench_reference_gpu.py" --ref "$REF" \
  --run "$(ls "$CKPTS" | head -1)" --out "$OUT/reference_gpu_bench.json"

# 5) Java METEOR / PTBTokenizer jar input->output fixtures; the replay tests
# (tests/test_scorer_fixtures.py) hold the ports to these numbers
run python "$(dirname "$0")/dump_scorer_fixtures.py" --ref "$REF" \
  --out "$OUT/scorer_fixtures.json"

# 6) Meteor 1.5 jar data files: the corpus-derived function-word list,
# WordNet synonym index, and the paraphrase table. Loaded back via
# Meteor(function_words=load_function_words(...), paraphrase_table=...) /
# default_function_words(...); tools/meteor_sensitivity.py --function_words
# then re-runs the A/B against the real list.
JAR=$(find "$REF" -name 'meteor-*.jar' | head -1)
if [ -n "$JAR" ]; then
  run mkdir -p "$OUT/meteor_data"
  run unzip -o "$JAR" 'function/en.words' -d "$OUT/meteor_data"
  run unzip -o "$JAR" 'synonym/english/*' -d "$OUT/meteor_data" || true
  PARA="$(dirname "$JAR")/data/paraphrase-en.gz"
  [ -f "$PARA" ] && run cp "$PARA" "$OUT/meteor_data/" || true
else
  echo "WARNING: meteor-1.5.jar not found under $REF — skip data dump"
fi

echo "goldens written to $OUT — commit them and update bench.py's"
echo "REF_GPU_CLIPS_PER_SEC from $OUT/reference_gpu_bench.json"
