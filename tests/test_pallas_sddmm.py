"""SDDMM kernel: forward parity with the XLA formulation and gradient
correctness through the custom VJP (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blp_tpu.data.sampling import sample_negative_indices
from blp_tpu.ops import pallas_sddmm

B, K, D = 16, 8, 32


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    ent = jnp.asarray(rng.standard_normal((2 * B, D)).astype(np.float32))
    rel = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    neg = sample_negative_indices(jax.random.key(seed), B, K)
    return ent, rel, neg


@pytest.mark.parametrize("rel_model", ["transe", "distmult", "complex", "simple"])
def test_forward_parity(rel_model):
    ent, rel, neg = _inputs()
    pos_k, neg_k = pallas_sddmm.sddmm_scores(ent, rel, neg, rel_model, 8, True)
    pos_x, neg_x = pallas_sddmm._sddmm_xla(ent, rel, neg, rel_model=rel_model)
    np.testing.assert_allclose(np.asarray(pos_k), np.asarray(pos_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(neg_k), np.asarray(neg_x),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_xla():
    ent, rel, neg = _inputs(1)

    def loss_kernel(e, r):
        pos, negs = pallas_sddmm.sddmm_scores(e, r, neg, "distmult", 8, True)
        return jnp.mean(jax.nn.relu(1 - pos + negs))

    def loss_xla(e, r):
        pos, negs = pallas_sddmm._sddmm_xla(e, r, neg, rel_model="distmult")
        return jnp.mean(jax.nn.relu(1 - pos + negs))

    g_k = jax.grad(loss_kernel, argnums=(0, 1))(ent, rel)
    g_x = jax.grad(loss_xla, argnums=(0, 1))(ent, rel)
    for a, b in zip(g_k, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_batch_divisibility_check():
    ent, rel, neg = _inputs(2)
    with pytest.raises(ValueError, match="divide"):
        pallas_sddmm.sddmm_scores(ent, rel, neg, "transe", 5, True)
