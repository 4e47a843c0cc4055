"""BOW/DKRL encoder parity vs an independent torch formulation of the
reference architectures (masked-mean BOW; DKRL CNN: conv2-pad -> mask ->
maxpool4 -> tanh -> conv2-pad -> masked mean -> tanh)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from blp_tpu.models import encoders

V, E, D, B, L = 50, 12, 8, 5, 16


def _data(seed=0):
    rng = np.random.default_rng(seed)
    table = rng.standard_normal((V, E)).astype(np.float32)
    tok = rng.integers(1, V, size=(B, L))
    lengths = rng.integers(4, L + 1, size=B)
    lengths[0] = L
    lengths[1] = 4
    mask = (np.arange(L)[None, :] < lengths[:, None]).astype(np.float32)
    tok = tok * mask.astype(np.int64)
    return table, tok, mask


def test_bow_parity():
    table, tok, mask = _data()
    got = encoders.bow_encode(jnp.asarray(table), jnp.asarray(tok), jnp.asarray(mask))
    t_emb = torch.from_numpy(table)[torch.from_numpy(tok)]
    t_mask = torch.from_numpy(mask)
    want = (t_mask.unsqueeze(-1) * t_emb).sum(1) / t_mask.sum(-1, keepdim=True)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5, atol=1e-6)


def test_bow_no_mask():
    table, tok, _ = _data(1)
    got = encoders.bow_encode(jnp.asarray(table), jnp.asarray(tok), None)
    want = torch.from_numpy(table)[torch.from_numpy(tok)].mean(1)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5, atol=1e-6)


def torch_dkrl(table, tok, mask, w1, b1, w2, b2):
    """Independent torch DKRL with Conv1d, masked pools — lengths multiple of 4
    so the reference's degrading-kernel branch is fixed at 4."""
    emb = torch.from_numpy(table)[torch.from_numpy(tok)]
    m = torch.from_numpy(mask)
    x = (emb * m.unsqueeze(-1)).transpose(1, 2)  # (B, E, L)
    m3 = m.unsqueeze(1)
    x = F.pad(x, [0, 1])
    x = F.conv1d(x, w1, b1)
    x = x * m3
    x = F.max_pool1d(x, kernel_size=4)
    mp = F.max_pool1d(m3, kernel_size=4)
    x = torch.tanh(x)
    x = F.pad(x, [0, 1])
    x = F.conv1d(x, w2, b2)
    lengths = mp.sum(-1)
    x = (x * mp).sum(-1) / lengths
    return torch.tanh(x)


def test_dkrl_parity():
    table, tok, mask = _data(2)
    params = encoders.init_dkrl_params(jax.random.key(0), E, D)
    got = encoders.dkrl_encode(params, jnp.asarray(table), jnp.asarray(tok),
                               jnp.asarray(mask))

    # Convert our (2*in, out) matmul weights to torch Conv1d (out, in, k=2).
    w1 = np.asarray(params["conv1_w"])  # (2E, D)
    w1_t = torch.from_numpy(np.stack([w1[:E].T, w1[E:].T], axis=-1))  # (D, E, 2)
    w2 = np.asarray(params["conv2_w"])
    w2_t = torch.from_numpy(np.stack([w2[:D].T, w2[D:].T], axis=-1))
    want = torch_dkrl(table, tok, mask, w1_t, torch.from_numpy(np.asarray(params["conv1_b"])),
                      w2_t, torch.from_numpy(np.asarray(params["conv2_b"])))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5)


def test_dkrl_rejects_bad_length():
    table, tok, mask = _data(3)
    params = encoders.init_dkrl_params(jax.random.key(0), E, D)
    try:
        encoders.dkrl_encode(params, jnp.asarray(table), jnp.asarray(tok[:, :10]),
                             jnp.asarray(mask[:, :10]))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_entity_table_init_bounds():
    t = encoders.init_entity_table(jax.random.key(0), 100, 16)
    bound = np.sqrt(6.0 / 116)
    assert t.shape == (100, 16)
    assert np.abs(np.asarray(t)).max() <= bound
