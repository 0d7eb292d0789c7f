#!/bin/bash
# Reference-fidelity-duration synthetic curriculum (VERDICT r3 item 6):
# 3 stages x 100k graphs (reference per-stage cap, exp_pcqm4mv2.py:394),
# --pt_epoches default 100 (exp_pretraining.py:387), patience 50 live,
# batch 128, superbatch-32 compact-wire transport, autosave every epoch.
cd /root/repo
exec python -m scgib_tpu.cli pretrain --curriculum \
  --synthetic 100000 --epochs 100 --patience 50 \
  --batch_size 128 --superbatch 32 \
  --autosave runs/curriculum_r04/auto.msgpack \
  --out runs/curriculum_r04/pretrain_scale.msgpack
