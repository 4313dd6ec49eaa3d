#!/bin/bash
# 32x extreme 16->512 (reference: scripts/train/train_32x_512x512.sh).
# The reference needed 2x V100 with --model_parallel_mode 1; here the
# generator trunk is tensor-sharded over the mesh "model" axis instead.
NAME=${NAME:-32x_guided_512x512}
python train.py --name "$NAME" \
  --image_dir "${IMAGE_DIR:?set IMAGE_DIR}" \
  --label_dir "${LABEL_DIR:?set LABEL_DIR}" \
  ${IDENTITIES_FILE:+--identities_file "$IDENTITIES_FILE"} \
  --batch_size 2 --data_axis 1 --model_axis "${MODEL_AXIS:-4}" --remat "$@"
