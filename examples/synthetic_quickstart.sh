#!/usr/bin/env bash
# Dataset-free end-to-end walkthrough: the full zero-shot pipeline on
# the synthetic dataset (class appearance is a linear function of the
# class embeddings, so transfer is real — see DESIGN.md §6), finishing
# with a deployable StableHLO artifact.  Runs on CPU or one TPU chip in
# a few minutes; no downloads, no datasets on disk.
set -euo pipefail
cd "$(dirname "$0")/.."   # run from the repo root (zs3_tpu importable)
RUN=${RUN:-run-synthetic}
COMMON=(--dataset synthetic --backbone resnet50 --crop-size 65
        --base-size 65 --batch-size 8 --unseen-split 2
        --compute-dtype float32 --checkpoint-dir "$RUN" --checkname demo)

# 1. Supervised training on seen classes only.
python -m zs3_tpu.cli train-seen "${COMMON[@]}" --epochs 8

SEEN_CKPT="$RUN/synthetic/demo/experiment_0/best"

# 2. ZS3Net zero-shot step: GMMN + classifier retrain; prints
#    seen/unseen/harmonic mIoU each eval.
python -m zs3_tpu.cli train-gmmn "${COMMON[@]}" --epochs 10 \
    --resume "$SEEN_CKPT"

GMMN_CKPT="$RUN/synthetic/demo-gmmn/experiment_0/best"

# 3. ZS5Net self-training on pseudo-labeled unseen pixels.
python -m zs3_tpu.cli train-zs5 "${COMMON[@]}" --epochs 5 \
    --resume "$SEEN_CKPT" --gmmn-resume "$GMMN_CKPT"

# 4. Standalone zero-shot evaluation of the best checkpoint.
python -m zs3_tpu.cli evaluate-gmmn "${COMMON[@]}" \
    --resume "$SEEN_CKPT" --gmmn-resume "$GMMN_CKPT"

# 5. Export a deployable artifact (weights + preprocessing baked in;
#    loads with plain JAX or any StableHLO runtime).
python -m zs3_tpu.cli export "${COMMON[@]}" --resume "$SEEN_CKPT" \
    --output "$RUN/model.shlo"
echo "artifact: $RUN/model.shlo (+ .json manifest)"
