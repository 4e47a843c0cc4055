#!/bin/bash

python -m blp_tpu.train link_prediction with \
dataset='Wikidata5M' \
inductive=True \
dim=128 \
model='blp' \
rel_model='simple' \
loss_fn='margin' \
encoder_name='bert-base-cased' \
regularizer=0 \
max_len=64 \
num_negatives=64 \
lr=5e-5 \
use_scheduler=True \
batch_size=1024 \
emb_batch_size=12288 \
eval_batch_size=64 \
max_epochs=0 \
checkpoint='output/model-blp-simple-wikidata5m.npz' \
use_cached_text=True \
large_dataset=True \
bf16=True \
remat=8
