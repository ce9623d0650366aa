#!/usr/bin/env bash
# EO-NeRF (TPU) on a DFC2019 JAX RGB crop — preset mirror of the reference's
# run_JAX_RGB.sh:1-46 (same hyperparameters, same path layout convention).
# Usage: bash run_JAX_RGB.sh <aoi_id> [suffix] [datasetdir] [out_dir]
set -euo pipefail
timestamp=$(date +"%Y-%m-%d_%H-%M-%S")

aoi_id=${1:?usage: run_JAX_RGB.sh <aoi_id> [suffix] [datasetdir] [out_dir]}
suffix=${2:-}
datasetdir=${3:-/data/Datasets}
out_dir=${4:-./eonerf_logs}
dataset=JAX_RGB
downsample_factor=2
n_samples=128
fc_units=256
training_iters=300000
batch_size=1024

root_dir=$datasetdir/SatNeRF/root_dir/crops_rpcs_ba_v2/$aoi_id
cache_dir=$datasetdir/SatNeRF/cache_dir_utm/crops_rpcs_ba_v2/${aoi_id}_ds$downsample_factor
img_dir=$datasetdir/DFC2019/Track3-RGB-crops/$aoi_id
gt_dir=$datasetdir/DFC2019/Track3-Truth
# shadow supervision + 9-view mode (commented in the reference too):
# shadow_masks_dir=$datasetdir/DFC2019/Shadows-pred_v2/Track3-RGB-crops/$aoi_id
# extra="--subset_Nviews 9 --shadow_masks_dir $shadow_masks_dir"

exp_name=${timestamp}_${aoi_id}_${dataset}_eonerf${suffix:+_$suffix}
python3 "$(dirname "$0")/train_eonerf.py" \
  --exp_name "$exp_name" --root_dir "$root_dir" --img_dir "$img_dir" \
  --cache_dir "$cache_dir" --logs_dir "$out_dir/logs" --gt_dir "$gt_dir" \
  --aoi_id "$aoi_id" --model eo-nerf --img_downscale $downsample_factor \
  --max_train_steps $training_iters --fc_units $fc_units \
  --n_samples $n_samples --geometric_shadows --radiometric_normalization \
  --batch_size $batch_size ${extra:-}
