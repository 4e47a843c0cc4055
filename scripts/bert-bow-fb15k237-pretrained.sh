#!/bin/bash

python -m blp_tpu.train link_prediction with \
dataset='FB15k-237' \
inductive=True \
dim=128 \
model='bert-bow' \
rel_model='transe' \
loss_fn='margin' \
encoder_name='bert-base-cased' \
regularizer=1e-2 \
max_len=32 \
num_negatives=64 \
lr=1e-4 \
use_scheduler=False \
batch_size=64 \
emb_batch_size=512 \
eval_batch_size=64 \
max_epochs=0 \
checkpoint='output/model-bert-bow-fb15k237.npz' \
use_cached_text=True \
large_dataset=False \
bf16=False
