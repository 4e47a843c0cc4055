"""BERT parity: our pure-JAX stacked-scan encoder vs transformers.BertModel
with identical (randomly initialized) weights — no network needed."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from blp_tpu.models import bert

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def torch_model_and_cfg():
    hf_cfg = transformers.BertConfig(
        vocab_size=99, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=48, type_vocab_size=2,
    )
    torch.manual_seed(0)
    model = transformers.BertModel(hf_cfg)
    model.eval()
    return model, hf_cfg


def test_activation_parity(torch_model_and_cfg):
    model, hf_cfg = torch_model_and_cfg
    cfg = bert.config_from_hf(hf_cfg)
    params = bert.params_from_hf_state_dict(model.state_dict(), cfg)

    rng = np.random.default_rng(0)
    B, S = 4, 12
    ids = rng.integers(1, hf_cfg.vocab_size, size=(B, S))
    mask = np.ones((B, S), np.int64)
    mask[0, 8:] = 0
    mask[2, 5:] = 0
    ids = ids * mask  # pad ids to 0 where masked

    with torch.no_grad():
        out = model(torch.from_numpy(ids), attention_mask=torch.from_numpy(mask))
    want_hidden = out.last_hidden_state.numpy()
    want_pooled = out.pooler_output.numpy()

    got = bert.bert_encode(params, jnp.asarray(ids), jnp.asarray(mask), cfg)
    np.testing.assert_allclose(np.asarray(got), want_hidden, rtol=2e-4, atol=2e-5)

    pooled = bert.bert_pooler(params, got, cfg)
    np.testing.assert_allclose(np.asarray(pooled), want_pooled, rtol=2e-4, atol=2e-5)


def test_no_mask_equals_all_ones(torch_model_and_cfg):
    model, hf_cfg = torch_model_and_cfg
    cfg = bert.config_from_hf(hf_cfg)
    params = bert.params_from_hf_state_dict(model.state_dict(), cfg)
    ids = jnp.asarray(np.random.default_rng(1).integers(1, 99, size=(2, 7)))
    a = bert.bert_encode(params, ids, None, cfg)
    b = bert.bert_encode(params, ids, jnp.ones_like(ids), cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_remat_matches(torch_model_and_cfg):
    model, hf_cfg = torch_model_and_cfg
    cfg = bert.config_from_hf(hf_cfg)
    cfg_r = bert.BertConfig(**{**cfg.__dict__, "remat": True})
    params = bert.params_from_hf_state_dict(model.state_dict(), cfg)
    ids = jnp.asarray(np.random.default_rng(2).integers(1, 99, size=(2, 9)))
    a = bert.bert_encode(params, ids, None, cfg)
    b = bert.bert_encode(params, ids, None, cfg_r)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_init_shapes_and_grads():
    cfg = bert.BertConfig.tiny()
    params = bert.init_bert_params(jax.random.key(0), cfg)
    assert params["layers"]["q_w"].shape == (cfg.num_layers, 32, 32)
    ids = jnp.ones((2, 8), jnp.int32)

    def loss(p):
        return jnp.sum(bert.bert_encode(p, ids, None, cfg) ** 2)

    g = jax.grad(loss)(params)
    leaf_norms = [float(jnp.abs(x).max()) for x in jax.tree.leaves(g)]
    assert all(np.isfinite(leaf_norms))
    assert max(leaf_norms) > 0


def test_dropout_determinism_flags():
    cfg = bert.BertConfig.tiny()
    params = bert.init_bert_params(jax.random.key(0), cfg)
    ids = jnp.ones((2, 8), jnp.int32)
    with pytest.raises(ValueError):
        bert.bert_encode(params, ids, None, cfg, deterministic=False)
    a = bert.bert_encode(params, ids, None, cfg, deterministic=False,
                         dropout_rng=jax.random.key(1))
    b = bert.bert_encode(params, ids, None, cfg, deterministic=False,
                         dropout_rng=jax.random.key(1))
    c = bert.bert_encode(params, ids, None, cfg, deterministic=False,
                         dropout_rng=jax.random.key(2))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


@pytest.mark.parametrize("nbits", [8, 16, 32])
def test_dropout_bits_mask_semantics(nbits):
    """Narrow-bit dropout masks (dropout_bits=8/16): drop fraction matches
    the QUANTIZED rate round(rate*2^n)/2^n, the keep-rescale preserves the
    mean exactly in expectation, and the custom-vjp backward regenerates the
    identical mask from the key."""
    key = jax.random.key(3)
    x = jnp.ones((4096, 64), jnp.float32)
    rate = 0.1
    y = bert._rng_dropout(x, key, rate, nbits)
    eff = rate if nbits == 32 else round(rate * (1 << nbits)) / (1 << nbits)
    frac = float((np.asarray(y) == 0).mean())
    assert abs(frac - eff) < 0.01, (frac, eff)
    # kept entries are rescaled by 1/(1-eff) — mean stays ~1
    assert abs(float(np.asarray(y).mean()) - 1.0) < 0.01
    kept = np.asarray(y)[np.asarray(y) != 0]
    np.testing.assert_allclose(kept, 1.0 / (1.0 - eff), rtol=1e-6)
    # backward drops exactly where forward dropped
    g = jax.grad(lambda v: bert._rng_dropout(v, key, rate, nbits).sum())(x)
    np.testing.assert_array_equal(np.asarray(g) == 0, np.asarray(y) == 0)


def test_dropout_bits_validation_and_encode():
    with pytest.raises(ValueError, match="dropout_bits"):
        bert._rng_dropout(jnp.ones((4, 4)), jax.random.key(0), 0.1, 12)
    # full encode runs with narrow masks and differs from the bernoulli run
    # (different draw), while staying deterministic per key
    cfg = bert.BertConfig.tiny(dropout_bits=8)
    params = bert.init_bert_params(jax.random.key(0), cfg)
    ids = jnp.ones((2, 8), jnp.int32)
    a = bert.bert_encode(params, ids, None, cfg, deterministic=False,
                         dropout_rng=jax.random.key(1))
    b = bert.bert_encode(params, ids, None, cfg, deterministic=False,
                         dropout_rng=jax.random.key(1))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_dropout_bits_config_plumbing():
    from blp_tpu.config import ExperimentConfig
    from blp_tpu.train import make_model_config

    class _Tok:
        vocab = {str(i): i for i in range(128)}

    cfg = ExperimentConfig(model="blp", dropout_bits=8)
    mcfg = make_model_config(cfg, _Tok(), num_relations=4, num_entities=10)
    assert mcfg.encoder.dropout_bits == 8


def test_seq_packing_exact_vs_unpacked():
    """Packed attention (block-diagonal bias over folded sequences) must be
    numerically equivalent to per-sequence attention: the -10000 cross-block
    bias underflows to exactly 0 in the fp32 softmax."""
    import dataclasses

    cfg = bert.BertConfig.tiny(num_heads=4, max_position_embeddings=64)
    params = bert.init_bert_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    B, S = 8, 16
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (B, S)))
    lens = rng.integers(3, S + 1, B)
    mask = jnp.asarray((np.arange(S)[None, :] < lens[:, None]).astype(np.float32))

    packed = bert.bert_encode(params, ids, mask,
                              dataclasses.replace(cfg, seq_pack="auto"))
    unpacked = bert.bert_encode(params, ids, mask,
                                dataclasses.replace(cfg, seq_pack=1))
    np.testing.assert_allclose(np.asarray(packed), np.asarray(unpacked),
                               atol=1e-5, rtol=1e-5)


def test_seq_packing_auto_skips_indivisible_batch():
    cfg = bert.BertConfig.tiny(num_heads=4, max_position_embeddings=64)
    params = bert.init_bert_params(jax.random.key(0), cfg)
    ids = jnp.ones((3, 16), jnp.int32)  # B=3: no pack divides it
    out = bert.bert_encode(params, ids, None, cfg)
    assert out.shape == (3, 16, cfg.hidden_size)


def test_remat_variants_match():
    """remat=True / "dots" recompute must give the same gradients. Uses a
    well-conditioned regression loss with random ids — degenerate losses
    (e.g. sum of squared LN outputs with identical tokens) have near-zero
    gradients where reassociation noise dominates any comparison."""
    import dataclasses

    base = bert.BertConfig.tiny(num_heads=4)
    params = bert.init_bert_params(jax.random.key(0), base)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(1, base.vocab_size, (4, 8)))
    tgt = jnp.asarray(rng.standard_normal((4, 8, 32)).astype(np.float32))

    def loss(p, cfg):
        return jnp.mean((bert.bert_encode(p, ids, None, cfg) - tgt) ** 2)

    ref = jax.grad(loss)(params, dataclasses.replace(base, remat=False))
    for remat in (True, "dots", "names"):
        g = jax.grad(loss)(params, dataclasses.replace(base, remat=remat))

        def check(a, b):
            a, b = np.asarray(a), np.asarray(b)
            if np.linalg.norm(a) < 1e-5 and np.linalg.norm(b) < 1e-5:
                return  # mathematically-zero grads (e.g. k_b: softmax is
                # shift-invariant along keys) are float noise in both
            assert np.linalg.norm(a - b) / np.linalg.norm(a) < 1e-4

        jax.tree.map(check, ref, g)


def test_unstacked_layers_match_stacked():
    """The unstacked per-layer training layout (python loop) must compute
    the same encoder output and the same train loss as the stacked scan —
    same layer order, same dropout rng schedule."""
    import numpy as np

    from blp_tpu import training
    from blp_tpu.models import blp

    cfg = blp.ModelConfig(model="blp", rel_model="transe", loss_fn="margin",
                          dim=8, num_relations=3,
                          encoder=bert.BertConfig.tiny(num_layers=3))
    params = blp.init_params(jax.random.key(0), cfg)
    params_u = training.unstack_params(params)
    assert isinstance(params_u["bert"]["layers"], tuple)

    rng = np.random.default_rng(0)
    B, L = 4, 12
    tok = jnp.asarray(rng.integers(1, cfg.encoder.vocab_size, (B, 2, L)))
    mask = jnp.asarray(np.ones((B, 2, L), np.float32))
    batch = {"text_tok": tok, "text_mask": mask,
             "rels": jnp.asarray(rng.integers(0, 3, (B,))),
             "neg_idx": jnp.asarray(rng.integers(0, 2 * B, (B, 2, 2)))}

    # Deterministic forward parity.
    a = blp.encode(params, cfg, tok.reshape(2 * B, L), mask.reshape(2 * B, L))
    b = blp.encode(params_u, cfg, tok.reshape(2 * B, L), mask.reshape(2 * B, L))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                               atol=1e-7)

    # Training-mode loss parity (same dropout schedule).
    key = jax.random.key(7)
    la = blp.train_loss(params, cfg, batch, deterministic=False, rng=key)
    lb = blp.train_loss(params_u, cfg, batch, deterministic=False, rng=key)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)

    # Round trip.
    back = training.restack_params(params_u)
    for pa, pb in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_poly_gelu_accuracy():
    """The fast_inference GeLU polynomial must stay within its documented
    bound of exact erf-GeLU: abs error <= 4.2e-4 on the fitted range and
    relative error <= 3.2e-5 for large |x| (clamp region) — both far below
    bf16 round-off."""
    x = jnp.asarray(np.linspace(-12.0, 12.0, 200001), jnp.float32)
    exact = jax.nn.gelu(x, approximate=False)
    fast = bert.poly_gelu(x)
    err = np.abs(np.asarray(fast) - np.asarray(exact))
    inside = np.abs(np.asarray(x)) <= 4.0
    assert err[inside].max() <= 4.5e-4
    # Clamp region: Phi pinned to [0, 1], so the negative tail decays to the
    # exact gelu's underflow (<=|x|*(1-Phi(4))) and the positive tail is
    # relative-bounded by 1 - Phi(4) = 3.2e-5.
    assert err[~inside].max() <= 4.5e-4
    rel = err[~inside] / np.maximum(np.abs(np.asarray(exact))[~inside], 1e-6)
    assert rel[np.asarray(x)[~inside] > 0].max() <= 4e-5


def test_fast_inference_only_on_bf16_deterministic():
    """fp32 encodes must NEVER take the fast path (bit-exact regardless of
    the flag); bf16 deterministic encodes must (flag-controlled), staying
    within the bf16 noise envelope of the exact-erf path."""
    import dataclasses

    cfg32 = bert.BertConfig.tiny(num_heads=4)
    params = bert.init_bert_params(jax.random.key(0), cfg32)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(1, cfg32.vocab_size, (4, 16)))
    lens = rng.integers(2, 17, 4)
    mask = jnp.asarray((np.arange(16)[None] < lens[:, None]).astype(np.float32))

    a = bert.bert_encode(params, ids, mask, cfg32)
    b = bert.bert_encode(params, ids, mask,
                         dataclasses.replace(cfg32, fast_inference=False))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    cfg16 = dataclasses.replace(cfg32, compute_dtype=jnp.bfloat16)
    fast = bert.bert_encode(params, ids, mask, cfg16)
    exact = bert.bert_encode(params, ids, mask,
                             dataclasses.replace(cfg16, fast_inference=False))
    # Same class as bf16-vs-fp32 noise; must differ from fp32 by no more
    # than ~2x the exact-erf bf16 path does.
    ref32 = np.asarray(a, np.float32)
    d_fast = np.abs(np.asarray(fast, np.float32) - ref32).max()
    d_exact = np.abs(np.asarray(exact, np.float32) - ref32).max()
    assert d_fast <= 2.0 * max(d_exact, 1e-3)

    # Training-mode (non-deterministic) bf16 still uses the exact layer:
    # gradients flow through erf, not the polynomial.
    g = jax.grad(lambda p: jnp.sum(bert.bert_encode(
        p, ids, mask, cfg16, deterministic=False,
        dropout_rng=jax.random.key(1)).astype(jnp.float32)))(params)
    assert np.isfinite(np.asarray(jax.tree.leaves(g)[0], np.float32)).all()


def test_fast_inference_unstacked_matches_scan():
    """The fast layer must agree between the stacked scan and the unstacked
    python loop (the eval table build uses the latter) within bf16 rounding —
    XLA fuses across layer boundaries differently in the two program shapes,
    so bit-identity is not guaranteed (nor was it for the exact layer)."""
    cfg = bert.BertConfig.tiny(num_heads=4, num_layers=3,
                               compute_dtype=jnp.bfloat16)
    params = bert.init_bert_params(jax.random.key(2), cfg)
    pu = bert.unstack_layers(params)
    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (8, 16)))
    a = np.asarray(bert.bert_encode(params, ids, None, cfg), np.float32)
    b = np.asarray(bert.bert_encode(pu, ids, None, cfg), np.float32)
    np.testing.assert_allclose(a, b, atol=3e-2, rtol=2e-2)


def test_remat_works_on_unstacked_layers():
    """remat + the unstacked per-layer loop: jax.checkpoint must not trace
    the static layer arguments (dropout_rate / the fast path's (bias, mask,
    seg) tuple) — doing so raised TracerBoolConversionError on every
    remat=True eval/table-build after round 4 routed those through the
    unstacked view."""
    import dataclasses

    for remat in (True, "dots", "names"):
        cfg = bert.BertConfig.tiny(num_heads=4, num_layers=2,
                                   compute_dtype=jnp.bfloat16, remat=remat)
        params = bert.unstack_layers(bert.init_bert_params(jax.random.key(0), cfg))
        ids = jnp.ones((4, 16), jnp.int32)
        # fast_inference path (deterministic bf16)
        out = jax.jit(lambda p: bert.bert_encode(p, ids, None, cfg))(params)
        assert np.isfinite(np.asarray(out, np.float32)).all()
        # training path (grads through the rematerialized unstacked loop)
        g = jax.grad(lambda p: jnp.sum(bert.bert_encode(
            p, ids, None, cfg, deterministic=False,
            dropout_rng=jax.random.key(1)).astype(jnp.float32)))(params)
        assert np.isfinite(np.asarray(jax.tree.leaves(g)[0], np.float32)).all()


def test_fast_train_numerics_close_and_fp32_ignored():
    """BertConfig.fast_train swaps the TRAINING GeLU (fwd+bwd) for the
    minimax polynomial on bf16 paths only: outputs/grads must stay within
    the bf16 noise class of the exact-erf run, and fp32 parity mode must
    ignore the flag bitwise."""
    import dataclasses

    cfg16 = bert.BertConfig.tiny(num_heads=4, compute_dtype=jnp.bfloat16)
    params = bert.init_bert_params(jax.random.key(0), cfg16)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(1, cfg16.vocab_size, (4, 8)))

    def run(cfg, det=True):
        kw = {} if det else {"deterministic": False,
                             "dropout_rng": jax.random.key(5)}
        # fast_inference off so the training layer is exercised even in the
        # deterministic comparison.
        cfg = dataclasses.replace(cfg, fast_inference=False)
        return bert.bert_encode(params, ids, None, cfg, **kw)

    exact = np.asarray(run(cfg16), np.float32)
    fast = np.asarray(run(dataclasses.replace(cfg16, fast_train=True)),
                      np.float32)
    # Same class as bf16 round-off (poly abs err 4.2e-4 << bf16 half-ulp).
    scale = max(np.abs(exact).max(), 1.0)
    assert np.abs(fast - exact).max() <= 0.05 * scale
    assert not np.array_equal(fast, exact)  # the poly path actually ran

    # Gradients flow and stay finite through the polynomial backward.
    def loss(p):
        cfg = dataclasses.replace(cfg16, fast_train=True)
        out = bert.bert_encode(p, ids, None, cfg, deterministic=False,
                               dropout_rng=jax.random.key(5))
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.tree.leaves(jax.grad(loss)(params))
    assert all(np.isfinite(np.asarray(x)).all() for x in g)
    assert max(float(jnp.abs(x).max()) for x in g) > 0

    # fp32 parity mode: fast_train must be a bitwise no-op.
    cfg32 = bert.BertConfig.tiny(num_heads=4)
    a = bert.bert_encode(params, ids, None,
                         dataclasses.replace(cfg32, fast_train=True),
                         deterministic=False, dropout_rng=jax.random.key(3))
    b = bert.bert_encode(params, ids, None, cfg32,
                         deterministic=False, dropout_rng=jax.random.key(3))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_partial_remat_matches_full():
    """remat=<int k> (partial rematerialization on the unstacked layout) must
    be a pure memory/time tradeoff: same outputs and gradients as remat=True
    and remat=False."""
    import dataclasses

    from blp_tpu import training

    cfg = bert.BertConfig.tiny(num_heads=4)
    stacked = bert.init_bert_params(jax.random.key(0), cfg)
    params = bert.unstack_layers(stacked)
    ids = jnp.asarray(np.random.default_rng(0).integers(1, cfg.vocab_size,
                                                        (4, 8)))

    def loss(p, c):
        out = bert.bert_encode(p, ids, None, c, deterministic=False,
                               dropout_rng=jax.random.key(7))
        return jnp.sum(out.astype(jnp.float32) ** 2)

    ref_l, ref_g = jax.value_and_grad(loss)(params, cfg)
    for r in (True, 1, 2):
        c = dataclasses.replace(cfg, remat=r)
        l, g = jax.value_and_grad(lambda p: loss(p, c))(params)
        np.testing.assert_allclose(float(l), float(ref_l), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(ref_g), jax.tree.leaves(g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)
