"""Fused block-diagonal attention kernel (ops/pallas_attention.py):
parity with the fast_inference einsum attention in interpret mode, across
packing factors, padding masks, and head counts."""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blp_tpu.models import bert
from blp_tpu.ops import pallas_attention


def _einsum_reference(q, k, v, key_mask, seg, scale):
    """The fast_inference einsum formula (models/bert.py), bias rebuilt from
    the key mask the same way embed_inputs does."""
    B, nh, Sp, hd = q.shape
    same = (np.arange(Sp)[:, None] // seg) == (np.arange(Sp)[None, :] // seg)
    visible = same[None] & (np.asarray(key_mask)[:, None, :] > 0)
    bias = jnp.asarray(np.where(visible, 0.0, -10000.0)[:, None, :, :],
                       jnp.float32)
    logits = jnp.einsum("bnqd,bnkd->bnqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = (logits * scale + bias).astype(jnp.bfloat16)
    m = jnp.max(logits, axis=-1, keepdims=True).astype(jnp.float32)
    e = jnp.exp(logits.astype(jnp.float32) - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    ctx = jnp.einsum("bnqk,bnkd->bqnd", p.astype(jnp.bfloat16), v,
                     preferred_element_type=jnp.float32)
    return ctx.reshape(B, Sp, nh * hd)


@pytest.mark.parametrize("nh,hd", [(4, 8), (3, 16), (12, 64)])
@pytest.mark.parametrize("packs", [(1, 16), (4, 8)])  # (segments, seg_len)
def test_kernel_matches_einsum_reference(nh, hd, packs):
    nseg, seg = packs
    Sp = nseg * seg
    B = 6
    rng = np.random.default_rng(nh * 100 + Sp)
    q, k, v = (jnp.asarray(rng.standard_normal((B, nh, Sp, hd)),
                           jnp.bfloat16) for _ in range(3))
    lengths = rng.integers(1, seg + 1, (B, nseg))
    key_mask = (np.arange(seg)[None, None, :] < lengths[:, :, None])
    key_mask = jnp.asarray(key_mask.reshape(B, Sp).astype(np.float32))

    scale = 1.0 / math.sqrt(hd)
    got = pallas_attention.block_diag_attention(q, k, v, key_mask, seg=seg,
                                                scale=scale, interpret=True)
    want = _einsum_reference(q, k, v, key_mask, seg, scale)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_fast_encode_kernel_vs_einsum_paths():
    """bert_encode with fused_attention on/off must agree within bf16
    rounding (same formula; MXU accumulation order differs)."""
    cfg = bert.BertConfig.tiny(num_heads=4, compute_dtype=jnp.bfloat16,
                               fused_attention=True)
    params = bert.init_bert_params(jax.random.key(1), cfg)
    rng = np.random.default_rng(4)
    B, S = 8, 16
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (B, S)))
    lens = rng.integers(2, S + 1, B)
    mask = jnp.asarray((np.arange(S)[None] < lens[:, None]).astype(np.float32))

    fused = bert.bert_encode(params, ids, mask, cfg)
    plain = bert.bert_encode(params, ids, mask,
                             dataclasses.replace(cfg, fused_attention=False))
    np.testing.assert_allclose(np.asarray(fused, np.float32),
                               np.asarray(plain, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_fp32_and_training_paths_never_use_kernel():
    """fp32 (parity mode) and non-deterministic (training) encodes take the
    exact layer regardless of fused_attention."""
    cfg = bert.BertConfig.tiny(num_heads=4)
    params = bert.init_bert_params(jax.random.key(2), cfg)
    ids = jnp.ones((4, 12), jnp.int32)
    a = bert.bert_encode(params, ids, None, cfg)
    b = bert.bert_encode(params, ids, None,
                         dataclasses.replace(cfg, fused_attention=False))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    cfg16 = dataclasses.replace(cfg, compute_dtype=jnp.bfloat16)
    g = jax.grad(lambda p: jnp.sum(bert.bert_encode(
        p, ids, None, cfg16, deterministic=False,
        dropout_rng=jax.random.key(0)).astype(jnp.float32)))(params)
    assert np.isfinite(np.asarray(jax.tree.leaves(g)[0], np.float32)).all()


def test_indivisible_segment_raises():
    q = jnp.zeros((2, 4, 24, 8), jnp.bfloat16)
    with pytest.raises(ValueError, match="not divisible"):
        pallas_attention.block_diag_attention(
            q, q, q, jnp.ones((2, 24)), seg=7, scale=1.0, interpret=True)
