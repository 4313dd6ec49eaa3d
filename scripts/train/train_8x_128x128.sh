#!/bin/bash
# 8x CelebA 16->128 (reference: scripts/train/train_8x_128x128.sh)
# NAME selects independent|guided (options/configurations.py semantics)
NAME=${NAME:-8x_independent_128x128}
python train.py --name "$NAME" \
  --image_dir "${IMAGE_DIR:?set IMAGE_DIR}" \
  --label_dir "${LABEL_DIR:?set LABEL_DIR}" \
  ${IDENTITIES_FILE:+--identities_file "$IDENTITIES_FILE"} \
  --batch_size 4 --niter 5 --niter_decay 3 "$@"
