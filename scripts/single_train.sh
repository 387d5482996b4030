#!/bin/bash
# DA-CLIP fine-tune, single host (da-clip/src/single_train.sh parity; the TPU
# chip count is discovered automatically — no CUDA_VISIBLE_DEVICES analogue).
python -m daclip_tpu.cli.train_daclip \
    --save-frequency 1 \
    --train-data "${TRAIN_CSV:-datasets/daclip_train.csv}" \
    --val-data "${VAL_CSV:-datasets/daclip_val.csv}" \
    --csv-img-key filepath \
    --csv-caption-key title \
    --warmup 100 \
    --batch-size "${BATCH:-512}" \
    --lr 2e-5 \
    --wd 0.05 \
    --epochs 200 \
    --workers 8 \
    --model daclip_ViT-B-32 \
    --name "daclip_ViT-B-32-$(date +%Y%m%d%H%M%S)" \
    --pretrained "${PRETRAINED:-pretrained/ViT-B-32.pt}" \
    --da
