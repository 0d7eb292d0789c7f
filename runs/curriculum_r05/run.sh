#!/bin/bash
# round-5 clean curriculum: structured (learnable) corpus, NaN guard in
# place, all three stages from scratch on the fixed code.
cd /root/repo
exec python -m scgib_tpu.cli pretrain --curriculum \
  --synthetic 100000 --synthetic_mode structured \
  --epochs 100 --patience 50 \
  --batch_size 128 --superbatch 32 \
  --autosave runs/curriculum_r05/auto.msgpack \
  --out runs/curriculum_r05/pretrain_scale.msgpack
