#!/bin/bash
# 8x CelebAMask-HQ 32->256 (reference: scripts/train/train_8x_256x256.sh)
NAME=${NAME:-8x_independent_256x256}
python train.py --name "$NAME" \
  --image_dir "${IMAGE_DIR:?set IMAGE_DIR}" \
  --label_dir "${LABEL_DIR:?set LABEL_DIR}" \
  ${IDENTITIES_FILE:+--identities_file "$IDENTITIES_FILE"} \
  --batch_size 1 --niter 50 --niter_decay 25 "$@"
