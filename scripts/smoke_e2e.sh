#!/bin/bash
# End-to-end smoke run: synthetic dataset -> small VAE checkpoint ->
# tagger-head training -> batched inference -> integration metrics.
# Runs anywhere (CPU ok at the small sizes below); ~3-5 minutes.
set -euo pipefail
cd "$(dirname "$0")/.."

WORK=${1:-/tmp/vae_tagger_smoke}
RES=${RES:-64}
mkdir -p "$WORK"

echo "== 1/5 synthetic dataset =="
python scripts/create_test_dataset.py --output_dir "$WORK/test_dataset" \
    --num_images 24 --img_size "$RES" --seed 0

echo "== 2/5 tiny VAE checkpoint (random init, compatible layout) =="
python - "$WORK" <<'EOF'
import json, sys
import jax, jax.numpy as jnp
from vae_tagger_tpu.core import default_flux_vae_config
from vae_tagger_tpu.models import AutoencoderKL
from vae_tagger_tpu.io import save_vae_pretrained

work = sys.argv[1]
cfg = default_flux_vae_config(block_out_channels=(8, 16, 16, 16),
                              norm_num_groups=4, latent_channels=16)
model = AutoencoderKL(cfg)
params = jax.jit(model.init)({"params": jax.random.key(0)},
                             jnp.zeros((1, 64, 64, 3)),
                             jax.random.key(1))["params"]
save_vae_pretrained(params, cfg, f"{work}/vae")
print("vae saved")
EOF

echo "== 3/5 train the tagger head (1 epoch) =="
python scripts/train_decoder.py \
    --vae_checkpoint "$WORK/vae/diffusion_pytorch_model.safetensors" \
    --vae_config_path "$WORK/vae/config.json" \
    --json_path "$WORK/test_dataset/data.json" \
    --tags_csv_path "$WORK/test_dataset/tags.csv" \
    --output_dir "$WORK/decoder_out" \
    --resolution "$RES" --train_batch_size 4 --num_epochs 1 \
    --num_workers 2 --use_focal_loss --mixed_precision no --seed 0

echo "== 4/5 batched inference =="
python scripts/infer_full.py \
    --vae_checkpoint "$WORK/vae/diffusion_pytorch_model.safetensors" \
    --vae_config_path "$WORK/vae/config.json" \
    --decoder_checkpoint "$WORK/decoder_out/best_pytorch_model.bin" \
    --image_path "$WORK/test_dataset/images" \
    --tags_csv_path "$WORK/test_dataset/tags.csv" \
    --output_dir "$WORK/infer_out" --resolution "$RES" \
    --confidence_threshold 0.3 --batch_size 8

echo "== 5/5 integration metrics vs ground truth =="
python scripts/batch_inference_test.py \
    --vae_checkpoint "$WORK/vae/diffusion_pytorch_model.safetensors" \
    --vae_config_path "$WORK/vae/config.json" \
    --decoder_checkpoint "$WORK/decoder_out/best_pytorch_model.bin" \
    --tags_csv_path "$WORK/test_dataset/tags.csv" \
    --image_dir "$WORK/test_dataset/images" \
    --data_json_path "$WORK/test_dataset/data.json" \
    --output_dir "$WORK/batch_test" --max_images 8 --resolution "$RES"

echo "smoke e2e OK — artifacts in $WORK"
