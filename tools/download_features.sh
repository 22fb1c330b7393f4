#!/bin/bash
# Feature-set downloader: consolidates the reference's five per-dataset
# download scripts (data/*/features/download_*.sh) into one entry point.
# Sources are the same public hosts; conversion goes through
# tools/data_prep.py h5_to_npy instead of per-dataset converter copies.
#
# Usage: tools/download_features.sh {anet_c3d|anet_tsp|anet_tsn|anet_i3d_vggish|yc2_tsn} [out_dir]
set -euo pipefail
which=${1:?dataset: anet_c3d|anet_tsp|anet_tsn|anet_i3d_vggish|yc2_tsn}
out=${2:-data}
TOOLS=$(dirname "$(readlink -f "$0")")
mkdir -p "$out" && cd "$out"

case "$which" in
  anet_c3d)
    # ActivityNet challenge C3D features (see
    # activity-net.org/challenges/2016/download.html#c3d)
    for i in 00 01 02 03 04 05; do
      wget "http://ec2-52-25-205-214.us-west-2.compute.amazonaws.com/data/challenge16/features/c3d/activitynet_v1-3.part-$i"
    done
    cat activitynet_v1-3.part-* > c3d_features.zip && unzip c3d_features.zip
    ;;
  anet_tsp)
    # TSP R(2+1)D features (github.com/HumamAlwassel/TSP); reformat to
    # tsp/VIDEO_ID.npy (VIDEO_ID starts with 'v_')
    base=https://github.com/HumamAlwassel/TSP/releases/download/activitynet_features
    for split in train valid test; do
      wget "$base/r2plus1d_34-tsp_on_activitynet-${split}_features.h5"
    done
    python "$TOOLS/data_prep.py" h5_to_npy \
      --inputs r2plus1d_34-tsp_on_activitynet-*_features.h5 --out_dir tsp
    ;;
  anet_tsn)
    # TSN features (github.com/salesforce/densecap data preparation)
    base=http://youcook2.eecs.umich.edu/static/dat/anet_densecap
    for split in training validation testing; do
      wget "$base/${split}_feat_anet.tar.gz" && tar xzf "${split}_feat_anet.tar.gz"
    done
    ;;
  anet_i3d_vggish)
    # BMT-hosted I3D + VGGish npy stacks (github.com/v-iashin/BMT)
    base=https://a3s.fi/swift/v1/AUTH_a235c0f452d648828f745589cde1219a/bmt
    wget "$base/i3d_25fps_stack64step64_2stream_npy.zip" && unzip i3d_25fps_stack64step64_2stream_npy.zip
    wget "$base/vggish_npy.zip" && unzip vggish_npy.zip
    ;;
  yc2_tsn)
    # YouCook2 TSN features; merged into resnet_bn/ like the reference
    base=http://youcook2.eecs.umich.edu/static/dat/yc2_densecap
    mkdir -p resnet_bn
    for split in training validation testing; do
      wget "$base/${split}_feat_yc2.tar.gz" && tar xzf "${split}_feat_yc2.tar.gz"
      mv "$split"/* resnet_bn/ 2>/dev/null || true
    done
    ;;
  *) echo "unknown dataset: $which" >&2; exit 2 ;;
esac
echo "done: $which -> $out"
