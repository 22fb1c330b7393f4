#!/usr/bin/env bash
# Re-encode every video in a folder to constant 30 fps MP4 — the input
# contract of the TSP feature backbone (gvl_tpu/backbone): its sliding-window
# clip sampler assumes a constant frame rate, so variable-fps sources must be
# standardized first.
#
# Behavioral counterpart of reference
# video_backbone/TSP/data/standardize_videos_to_constant_30fps_mp4.sh.
#
# Usage: standardize_videos_to_30fps.sh <input_dir> <output_dir> [fps]
set -euo pipefail

IN_DIR=${1:?usage: $0 <input_dir> <output_dir> [fps]}
OUT_DIR=${2:?usage: $0 <input_dir> <output_dir> [fps]}
FPS=${3:-30}

command -v ffmpeg >/dev/null || { echo "ffmpeg not found on PATH" >&2; exit 1; }
mkdir -p "$OUT_DIR"

shopt -s nullglob
for f in "$IN_DIR"/*; do
    case "$f" in
        *.mp4|*.mkv|*.webm|*.avi|*.mov|*.MP4) ;;
        *) continue ;;
    esac
    base=$(basename "$f")
    out="$OUT_DIR/${base%.*}.mp4"
    [ -e "$out" ] && { echo "skip (exists): $out"; continue; }
    echo "-> $out"
    ffmpeg -nostdin -loglevel error -y -i "$f" \
        -filter:v "fps=fps=${FPS}" -c:v libx264 -preset fast -crf 20 -an \
        "$out"
done
