"""Parity tests for scorers/losses against an independent torch formulation
of the published BLP math (TransE/DistMult/ComplEx/SimplE, margin/NLL)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from blp_tpu.models import scoring

B, K, D = 7, 5, 16


def _rand(*shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32)


def torch_scores(name, h, t, r):
    h, t, r = map(torch.from_numpy, (h, t, r))
    if name == "transe":
        return -(h + r - t).abs().sum(-1)
    if name == "distmult":
        return (h * r * t).sum(-1)
    if name == "complex":
        hr, hi = h.chunk(2, -1)
        tr, ti = t.chunk(2, -1)
        rr, ri = r.chunk(2, -1)
        return (rr * hr * tr + rr * hi * ti + ri * hr * ti - ri * hi * tr).sum(-1)
    if name == "simple":
        hh, ht = h.chunk(2, -1)
        th, tt = t.chunk(2, -1)
        ra, rb = r.chunk(2, -1)
        return (hh * ra * tt + th * rb * ht).sum(-1) / 2
    raise ValueError(name)


@pytest.mark.parametrize("name", ["transe", "distmult", "complex", "simple"])
def test_score_parity(name):
    h, t, r = _rand(B, D, seed=1), _rand(B, D, seed=2), _rand(B, D, seed=3)
    got = scoring.get_score_fn(name)(jnp.asarray(h), jnp.asarray(t), jnp.asarray(r))
    want = torch_scores(name, h, t, r).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("name", ["transe", "distmult", "complex", "simple"])
def test_score_broadcast(name):
    """(1, N, d) vs (B, 1, d) broadcasting used by the rank-vs-all evaluator."""
    N = 11
    table = _rand(1, N, D, seed=4)
    t = _rand(B, 1, D, seed=5)
    r = _rand(B, 1, D, seed=6)
    got = scoring.get_score_fn(name)(jnp.asarray(table), jnp.asarray(t), jnp.asarray(r))
    assert got.shape == (B, N)
    want = torch_scores(name, np.broadcast_to(table, (B, N, D)).copy(),
                        np.broadcast_to(t, (B, N, D)).copy(),
                        np.broadcast_to(r, (B, N, D)).copy()).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_margin_loss_parity():
    pos = _rand(B, 1, seed=7)
    neg = _rand(B, K, seed=8)
    got = scoring.margin_loss(jnp.asarray(pos), jnp.asarray(neg))
    want = F.relu(1 - torch.from_numpy(pos) + torch.from_numpy(neg)).mean().item()
    assert np.isclose(float(got), want, rtol=1e-6)


def test_nll_loss_parity():
    pos = _rand(B, 1, seed=9)
    neg = _rand(B, K, seed=10)
    got = scoring.nll_loss(jnp.asarray(pos), jnp.asarray(neg))
    want = ((F.softplus(-torch.from_numpy(pos)).mean()
             + F.softplus(torch.from_numpy(neg)).mean()) / 2).item()
    assert np.isclose(float(got), want, rtol=1e-5)


def test_l2_regularization_parity():
    h, t, r = _rand(B, D, seed=11), _rand(B, D, seed=12), _rand(B, D, seed=13)
    got = scoring.l2_regularization(*map(jnp.asarray, (h, t, r)))
    want = sum((torch.from_numpy(x) ** 2).mean() for x in (h, t, r)).item() / 3
    assert np.isclose(float(got), want, rtol=1e-6)


def test_l2_normalize_matches_torch():
    x = _rand(B, D, seed=14)
    got = scoring.l2_normalize(jnp.asarray(x))
    want = F.normalize(torch.from_numpy(x), dim=-1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_compute_loss_end_to_end():
    """compute_loss == scoring positives + gathered negatives by hand."""
    rng = np.random.default_rng(42)
    ent = rng.standard_normal((B, 2, D)).astype(np.float32)
    rel = rng.standard_normal((B, D)).astype(np.float32)
    neg_idx = rng.integers(0, 2 * B, size=(B, K, 2))

    got = scoring.compute_loss(
        jnp.asarray(ent), jnp.asarray(rel), jnp.asarray(neg_idx),
        rel_model="distmult", loss_fn="margin",
    )

    te, tr = torch.from_numpy(ent), torch.from_numpy(rel)
    pos = (te[:, 0] * tr * te[:, 1]).sum(-1, keepdim=True)
    flat = te.reshape(-1, D)
    nh, nt = flat[neg_idx[..., 0]], flat[neg_idx[..., 1]]
    neg = (nh * tr.unsqueeze(1) * nt).sum(-1)
    want = F.relu(1 - pos + neg).mean().item()
    assert np.isclose(float(got), want, rtol=1e-5)


def test_compute_loss_with_regularizer():
    rng = np.random.default_rng(3)
    ent = rng.standard_normal((B, 2, D)).astype(np.float32)
    rel = rng.standard_normal((B, D)).astype(np.float32)
    neg_idx = rng.integers(0, 2 * B, size=(B, K, 2))
    base = scoring.compute_loss(jnp.asarray(ent), jnp.asarray(rel), jnp.asarray(neg_idx),
                                rel_model="simple", loss_fn="nll", regularizer=0.0)
    reg = scoring.compute_loss(jnp.asarray(ent), jnp.asarray(rel), jnp.asarray(neg_idx),
                               rel_model="simple", loss_fn="nll", regularizer=0.5)
    expect = float(base) + 0.5 * float(
        scoring.l2_regularization(jnp.asarray(ent[:, 0]), jnp.asarray(ent[:, 1]), jnp.asarray(rel)))
    assert np.isclose(float(reg), expect, rtol=1e-6)


def test_unknown_names_raise():
    with pytest.raises(ValueError):
        scoring.get_score_fn("rotate")
    with pytest.raises(ValueError):
        scoring.get_loss_fn("bce")
