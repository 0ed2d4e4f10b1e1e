#!/usr/bin/env bash
# Full ZS3/ZS5 pipeline on Pascal-VOC, 2-unseen split (cow, motorbike).
# Expects the standard VOCdevkit layout under $DATA_ROOT/VOC2012 and
# (optionally) a torchvision resnet101 ImageNet .pth converted via
# zs3_tpu.utils.torch_convert.load_pretrained_resnet.
set -euo pipefail
DATA_ROOT=${DATA_ROOT:-/data}
RUN=${RUN:-run}

# 1. Supervised seen-class training (unseen-containing images filtered).
python -m zs3_tpu.cli train-seen \
    --dataset pascal --data-root "$DATA_ROOT" --unseen-split 2 \
    --backbone resnet101 --epochs 50 --batch-size 16 \
    --checkpoint-dir "$RUN" --checkname deeplab-r101

SEEN_CKPT="$RUN/pascal/deeplab-r101/experiment_0/best"

# 2. ZS3Net: GMMN + in-HBM classifier retrain; best by harmonic mIoU.
python -m zs3_tpu.cli train-gmmn \
    --dataset pascal --data-root "$DATA_ROOT" --unseen-split 2 \
    --backbone resnet101 --epochs 30 --batch-size 8 \
    --resume "$SEEN_CKPT" --checkpoint-dir "$RUN" --checkname deeplab-r101

GMMN_CKPT="$RUN/pascal/deeplab-r101-gmmn/experiment_0/best"

# 3. ZS5Net: pseudo-label unseen pixels, retrain on the augmented set.
python -m zs3_tpu.cli train-zs5 \
    --dataset pascal --data-root "$DATA_ROOT" --unseen-split 2 \
    --backbone resnet101 --epochs 20 --batch-size 8 \
    --resume "$SEEN_CKPT" --gmmn-resume "$GMMN_CKPT" \
    --checkpoint-dir "$RUN" --checkname deeplab-r101-zs5

# 4. Zero-shot evaluation of the best checkpoint.
python -m zs3_tpu.cli evaluate-gmmn \
    --dataset pascal --data-root "$DATA_ROOT" --unseen-split 2 \
    --backbone resnet101 --resume "$SEEN_CKPT" \
    --gmmn-resume "$RUN/pascal/deeplab-r101-zs5-gmmn/experiment_0/best"

# 5. Segment arbitrary images with the final model.
# python -m zs3_tpu.cli infer photo.jpg --output preds \
#     --resume "$SEEN_CKPT" --gmmn-resume ...
