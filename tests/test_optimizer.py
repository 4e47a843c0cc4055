"""Reduced-precision Adam state (training.make_optimizer).

Production option `adam_bf16_mu` stores Adam's FIRST moment in bfloat16
(optax mu_dtype); the second moment stays f32 — storing BOTH in bf16
(training.scale_by_adam_bf16_moments, kept in-tree as a measured negative)
stalls convergence because nu's 0.001*g^2 increments fall below bf16's
relative ulp of the running nu (PERFORMANCE.md round 5). Contract under
test: (a) both variants track f32 optax.adam within the bf16 rounding class
over a short horizon (the both-moments failure is a long-horizon ulp
effect, by design not visible here), (b) state dtypes are what each option
claims (the HBM saving is real), (c) the full jitted train step runs with
bf16_mu on, (d) a bf16-bearing state survives the npz checkpoint
round-trip with dtype identity intact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from blp_tpu import training


def _tree(rng):
    return {
        "a": jnp.asarray(rng.normal(size=(64, 32)), jnp.float32),
        "b": {"c": jnp.asarray(rng.normal(size=(17,)), jnp.float32)},
    }


@pytest.mark.parametrize("opt_kw", [{"bf16_mu": True},
                                    {"bf16_moments": True}])
def test_bf16_state_tracks_f32_adam(opt_kw):
    rng = np.random.default_rng(0)
    params = _tree(rng)
    ref = training.make_optimizer(1e-3, 100)
    fast = training.make_optimizer(1e-3, 100, **opt_kw)
    s_r, s_f = ref.init(params), fast.init(params)
    p_r = p_f = params
    for _ in range(10):
        g = jax.tree.map(
            lambda p: jnp.asarray(rng.normal(size=p.shape), jnp.float32),
            params)
        u_r, s_r = ref.update(g, s_r, p_r)
        p_r = optax.apply_updates(p_r, u_r)
        u_f, s_f = fast.update(g, s_f, p_f)
        p_f = optax.apply_updates(p_f, u_f)
    # Total drift after 10 steps stays in the bf16-rounding class: each
    # step's update is ~lr with ~2^-9 relative moment noise.
    drift = jax.tree.leaves(
        jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), p_r, p_f))
    moved = jax.tree.leaves(
        jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), params, p_r))
    assert max(drift) < 0.02 * max(moved), (drift, moved)


def test_bf16_moments_state_dtypes():
    params = _tree(np.random.default_rng(1))
    opt = training.make_optimizer(1e-3, 100, bf16_moments=True)
    state = opt.init(params)
    adam = state[0]
    assert isinstance(adam, optax.ScaleByAdamState)
    for leaf in jax.tree.leaves(adam.mu) + jax.tree.leaves(adam.nu):
        assert leaf.dtype == jnp.bfloat16
    # After one update the stored moments stay bf16.
    g = jax.tree.map(jnp.ones_like, params)
    _, state = opt.update(g, state, params)
    for leaf in jax.tree.leaves(state[0].mu) + jax.tree.leaves(state[0].nu):
        assert leaf.dtype == jnp.bfloat16


def test_bf16_mu_state_dtypes():
    # The production option: mu bf16, nu stays f32 (bf16 nu is the measured
    # quality negative).
    params = _tree(np.random.default_rng(1))
    opt = training.make_optimizer(1e-3, 100, bf16_mu=True)
    state = opt.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    _, state = opt.update(g, state, params)
    for leaf in jax.tree.leaves(state[0].mu):
        assert leaf.dtype == jnp.bfloat16
    for leaf in jax.tree.leaves(state[0].nu):
        assert leaf.dtype == jnp.float32


def test_bf16_moments_bias_correction_first_step():
    # At step 1 Adam's bias-corrected update is sign(g) * lr regardless of
    # moment magnitude (mhat/sqrt(vhat) = g/|g| when eps is negligible) —
    # the classic first-step invariant; catches c1/c2 ordering bugs.
    params = {"w": jnp.zeros((8,), jnp.float32)}
    opt = training.make_optimizer(0.1, 100, use_scheduler=False,
                                  bf16_moments=True)
    state = opt.init(params)
    g = {"w": jnp.asarray([3.0, -2.0, 0.5, -0.25, 1e3, -1e3, 4.0, -4.0])}
    upd, _ = opt.update(g, state, params)
    np.testing.assert_allclose(np.asarray(upd["w"]),
                               -0.1 * np.sign(np.asarray(g["w"])), rtol=2e-3)


def test_bf16_state_checkpoint_roundtrip(tmp_path):
    # numpy's .npy format loads extension dtypes (ml_dtypes bfloat16) back
    # as anonymous 'V2' void arrays; checkpoint.py records leaf dtype names
    # and re-views on load — without this, resuming an adam_bf16_moments run
    # surfaces un-computable raw-byte moment buffers.
    from blp_tpu import checkpoint as ckpt

    params = _tree(np.random.default_rng(2))
    opt = training.make_optimizer(1e-3, 100, bf16_mu=True)
    state = opt.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    _, state = opt.update(g, state, params)
    path = str(tmp_path / "state.npz")
    ckpt.save_pytree(path, (params, state), {"epoch": 3})
    (p2, s2), meta = ckpt.load_pytree(path, template=(params, state))
    assert meta["epoch"] == 3
    jax.tree.map(
        lambda a, b: (np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32)),
            # dtype identity survives, not just the bytes
            np.testing.assert_equal(np.asarray(a).dtype, np.asarray(b).dtype)),
        (params, state), (p2, s2))


@pytest.mark.parametrize("model", ["blp"])
def test_train_step_runs_with_bf16_mu(model):
    from blp_tpu.models import bert, blp

    cfg = blp.ModelConfig(
        model=model, rel_model="transe", loss_fn="margin", dim=16,
        num_relations=4,
        encoder=bert.BertConfig(num_layers=2, hidden_size=32,
                                num_heads=2, intermediate_size=64,
                                vocab_size=100, max_position_embeddings=16))
    params = training.unstack_params(blp.init_params(jax.random.key(0), cfg))
    opt = training.make_optimizer(1e-3, 10, bf16_mu=True)
    opt_state = jax.jit(opt.init)(params)
    step = training.make_train_step(cfg, opt, batch_size=4, num_negatives=3)
    rng = np.random.default_rng(0)
    batch = {
        "text_tok": jnp.asarray(rng.integers(1, 100, (4, 2, 8))),
        "text_mask": jnp.asarray(np.ones((4, 2, 8), np.float32)),
        "rels": jnp.asarray(rng.integers(0, 4, (4,))),
    }
    for i in range(2):
        params, opt_state, loss = step(params, opt_state,
                                       (jax.random.key(0), i), batch)
    assert np.isfinite(float(loss))
    # restack/unstack machinery stays layout-correct over the bf16 state.
    restacked = training.restack_opt_state(opt_state)
    back = training.unstack_opt_state(restacked)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                            np.asarray(b)),
                 opt_state, back)
