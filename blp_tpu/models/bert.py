"""BERT encoder, written TPU-first in pure JAX.

Design (deliberately NOT a port of HF's module tree):
  * parameters live in a flat pytree with the 12 encoder layers *stacked* on a
    leading axis; the encoder runs as one `lax.scan` over that axis — one
    compiled layer body instead of 12 unrolled ones (faster compiles, enables
    per-layer `jax.checkpoint` rematerialisation for the backward pass);
  * matmuls run in a configurable compute dtype (bfloat16 on TPU for the MXU)
    with float32 accumulation; LayerNorm statistics stay float32;
  * static shapes everywhere — the attention mask handles padding.

Numerical semantics match `transformers.BertModel` (post-LN, erf-GeLU,
eps=1e-12, additive -10000 padding mask) so that HF `bert-base-cased`
checkpoints load via `params_from_hf_state_dict` and per-layer activations
agree with the PyTorch reference in fp32 (verified in tests/test_bert.py).
The BLP usage (reference: models.py:96-111) takes the [CLS] hidden state and
applies a bias-free linear projection; that projection lives in
blp_tpu/models/blp.py, not here.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 28996  # bert-base-cased
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    # Width of the random draw behind each dropout mask (32 = reference
    # f32-uniform bernoulli; 16/8 = raw-uint threshold compare). Mask bits
    # are pure HBM bandwidth on TPU — rng-bit-generator cannot fuse into
    # consumers, so every mask buffer is written, layout-copied, and re-read
    # at full width (~100 ms/step of u32 traffic at the W5M operating
    # point). See _dropout_keep for the quantization math (keep-rescale uses
    # the quantized probability, so E[dropout(x)] == x stays exact).
    dropout_bits: int = 32
    initializer_range: float = 0.02
    compute_dtype: Any = jnp.float32
    remat: Any = False  # False | True (full) | "dots" (save matmul outputs)
    # Unroll factor for the layer scan (jax.lax.scan unroll=). Full unroll
    # (num_layers) turns the loop into straight-line code, which lets XLA
    # fuse each layer's weight-gradient write directly instead of a
    # dynamic-update-slice round-trip per layer — measured 23% faster on the
    # v5e flagship TRAIN step (48.3 vs 62.5 ms; partial unroll is WORSE: the
    # loop remains and the DUS writes stay). Forward-only encoding has no
    # weight gradients and the rolled loop measured ~9% faster there (14.7k
    # vs 13.4k entities/s), so "auto" = full unroll only for the training
    # pass (deterministic=False) without remat (the rematerialised backward
    # re-runs the body; rolled measured faster: 61.4 vs 67.3 ms).
    scan_unroll: Any = "auto"
    # Sequence packing for short descriptions: fold `pack` sequences into one
    # row with a block-diagonal attention mask so the (S, hd, S) attention
    # matmuls are MXU-tile-aligned (128x64x128 at S=32, pack=4) instead of
    # 32x64x32. Exact: -10000 cross-block bias underflows to exactly 0 in the
    # fp32 softmax, and FFN/LN are per-token. "auto" picks the largest
    # pack <= 4 with pack*S <= 128 that divides the batch; 1 disables.
    seq_pack: Any = "auto"
    # Mixed-precision TRAINING structure (compute_dtype != float32 only; the
    # fp32 parity mode ignores it). The round-3 layer kept every GEMM output
    # and the attention probs in f32 through dropout and the residual adds —
    # more conservative than the standard bf16 recipe (bf16 activations and
    # residual stream; f32 LN statistics, softmax, loss, and Adam state, all
    # of which this keeps). Flipping to the standard recipe:
    #   * attention-probs dropout applied AFTER the bf16 cast the ctx einsum
    #     needs anyway (same mask, one less f32 round-trip of (B,nh,S,S));
    #   * attn-out/FFN-out GEMMs emit bf16 into dropout + residual LN;
    #   * head-major projection einsums (see fast_inference) — wins only in
    #     combination with the bf16 outs (alone it is ~0.4 ms WORSE in bwd).
    # Measured on the v5e flagship step (B=128, unstacked): 44.6 -> 40.9 ms
    # (+9% throughput, 3,130 t/s). Dropout masks, schedule, and every f32
    # accumulation point are unchanged; quality A/B on the on-chip typed-
    # graph task matches within noise (PERFORMANCE.md). False restores the
    # round-3 f32-materialization layer exactly.
    mixed_precision_train: bool = True
    # Training fast-numerics mode (compute_dtype != float32 only; fp32
    # parity mode ignores it). Applies the training-legal piece of the
    # fast_inference recipe to the TRAINING pass, forward AND backward:
    # erf-GeLU via the same degree-6 minimax polynomial (abs err <= 4.2e-4,
    # ~5x below a bf16 half-ulp — see poly_gelu). Measured envelope on v5e
    # (PERFORMANCE.md round-5 section): WINS with remat — at the Wikidata5M
    # operating point (B=1024, L=64, remat=True) 1155.7 -> 1106.3 ms/step
    # (+4.5%: the rematerialized backward re-runs the forward, so the cheap
    # polynomial pays twice) — but LOSES without remat (flagship B=128,
    # L=32: 41.4 -> 42.9 ms: erf's exp-based DERIVATIVE is cheaper than the
    # polynomial's in the stash-based backward). Use it for remat'd
    # large-batch configs only. Quality A/B on the on-chip 20k typed-graph
    # task matches the exact-erf run within noise (same section).
    # Default OFF: reference numerics unless explicitly opted in.
    fast_train: bool = False
    # Inference fast path (deterministic=True AND compute_dtype != float32
    # only — the fp32 parity mode always runs the exact erf layer). Restores
    # nothing the training pass needs and changes activations by LESS than
    # the bf16 quantization already present (4.6e-3 vs the 3.4e-3 bf16-vs-
    # fp32 floor on normalized entity embeddings, measured v5e E=4096):
    #   * erf-GeLU via a degree-6 minimax polynomial (abs err <= 4.2e-4,
    #     ~5x below a bf16 half-ulp at |y|=1) — the f32 erf epilogue was
    #     throttling the FFN fusions to 108 TF/s vs 187 without it;
    #   * attention logits materialized bf16 (softmax stats still f32);
    #   * attn-out/FFN-out GEMMs emit bf16 into the residual LayerNorm
    #     (stats still f32) — halves their HBM writes;
    #   * head-major projection einsums (x @ (H, nh, hd)) so XLA never
    #     materializes the (B,S,nh,hd)->(B,nh,S,hd) transposes (22 ms/call).
    # Measured together on v5e (E=4096, L=32, packed): 281 -> 158 ms/call,
    # 14.6k -> 26.0k entities/s (+78%). Set False for the exact-erf path.
    fast_inference: bool = True
    # Fused block-diagonal attention Pallas kernel on the fast_inference
    # path (ops/pallas_attention.py). Default OFF: measured 190 vs 158 ms
    # per 4096-entity encode on v5e — at one 128-token block per row the
    # XLA einsum chain wins (see the kernel module docstring for the full
    # negative result). Same formula either way (MXU accumulation order
    # only); the kernel and its tests pin the masking semantics.
    fused_attention: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @staticmethod
    def tiny(**kw) -> "BertConfig":
        """Small config for tests and dry-runs."""
        base = dict(vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
                    intermediate_size=64, max_position_embeddings=64)
        base.update(kw)
        return BertConfig(**base)


def init_bert_params(key: Array, cfg: BertConfig) -> dict:
    """Initialize parameters with truncated-normal(initializer_range), matching
    BERT's init scheme. Layer params are stacked on a leading (num_layers,)
    axis."""
    keys = iter(jax.random.split(key, 32))
    std = cfg.initializer_range
    H, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers

    def tn(k, shape):
        return std * jax.random.truncated_normal(k, -2.0, 2.0, shape, jnp.float32)

    def layer_w(k, in_dim, out_dim):
        return tn(k, (L, in_dim, out_dim))

    return {
        "embeddings": {
            "word": tn(next(keys), (cfg.vocab_size, H)),
            "position": tn(next(keys), (cfg.max_position_embeddings, H)),
            "token_type": tn(next(keys), (cfg.type_vocab_size, H)),
            "ln_scale": jnp.ones((H,)),
            "ln_bias": jnp.zeros((H,)),
        },
        "layers": {
            "q_w": layer_w(next(keys), H, H), "q_b": jnp.zeros((L, H)),
            "k_w": layer_w(next(keys), H, H), "k_b": jnp.zeros((L, H)),
            "v_w": layer_w(next(keys), H, H), "v_b": jnp.zeros((L, H)),
            "attn_out_w": layer_w(next(keys), H, H), "attn_out_b": jnp.zeros((L, H)),
            "attn_ln_scale": jnp.ones((L, H)), "attn_ln_bias": jnp.zeros((L, H)),
            "ffn_in_w": layer_w(next(keys), H, I), "ffn_in_b": jnp.zeros((L, I)),
            "ffn_out_w": layer_w(next(keys), I, H), "ffn_out_b": jnp.zeros((L, H)),
            "ffn_ln_scale": jnp.ones((L, H)), "ffn_ln_bias": jnp.zeros((L, H)),
        },
        "pooler": {"w": tn(next(keys), (H, H)), "b": jnp.zeros((H,))},
    }


def _dropout_keep(key: Array, rate: float, nbits: int, shape):
    """(keep_mask, keep_prob) for dropout. nbits=32 is the reference
    semantics (f32-uniform bernoulli). nbits=8/16 draw raw uint bits and
    threshold-compare: random masks are pure HBM bandwidth on TPU — the
    rng-bit-generator op cannot fuse into its consumers, so the bits buffer
    is written, layout-copied, and re-read at full width; at the W5M
    operating point that is ~100 ms/step of u32 traffic (PERFORMANCE.md
    round 5). Narrow bits cut those bytes 2x/4x. The drop probability
    quantizes to round(rate*2^nbits)/2^nbits (0.1 -> 0.1015625 at 8 bits,
    0.1000061 at 16); the keep-side rescale uses the QUANTIZED probability,
    so E[dropout(x)] == x stays exact."""
    if nbits == 32:
        return jax.random.bernoulli(key, 1.0 - rate, shape), 1.0 - rate
    if nbits not in (8, 16):
        raise ValueError(f"dropout_bits must be 8, 16 or 32, got {nbits}")
    dtype = jnp.uint8 if nbits == 8 else jnp.uint16
    levels = 1 << nbits
    # Clamp to levels-1: rate -> 1.0 would round t to `levels`, which (a)
    # overflows the uint dtype and (b) would make keep_p zero. The clamped
    # threshold stays within the documented <= 2^-nbits quantization error
    # (e.g. rate=0.999 at 8 bits drops at 255/256 = 0.9961).
    t = min(int(round(rate * levels)), levels - 1)
    bits = jax.random.bits(key, shape, dtype)
    return bits >= jnp.asarray(t, dtype), 1.0 - t / levels


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _rng_dropout(x: Array, key: Array, rate: float, nbits: int = 32) -> Array:
    """Dropout whose backward REGENERATES the mask from the key instead of
    stashing it: the only residual is the (tiny) key. Measured on v5e
    (flagship step, B=128) this is throughput-NEUTRAL — XLA already chose to
    rematerialize the cheap rbg bernoulli rather than stash masks — but it
    guarantees the zero-stash behavior independent of XLA's heuristics and
    removes the mask buffers from peak memory. Gradients are exact — the
    same key reproduces the same mask. (Dropout's real cost is ~5 ms/step
    of broken fusion structure: deterministic=True measures 43.3 vs 48.7 ms.
    That is the price of the reference's training semantics, not stash
    traffic.) nbits: width of the random draw (see _dropout_keep)."""
    keep, keep_p = _dropout_keep(key, rate, nbits, x.shape)
    return jnp.where(keep, x / keep_p, jnp.zeros((), x.dtype))


def _rng_dropout_fwd(x, key, rate, nbits):
    return _rng_dropout(x, key, rate, nbits), key


def _rng_dropout_bwd(rate, nbits, key, g):
    keep, keep_p = _dropout_keep(key, rate, nbits, g.shape)
    return (jnp.where(keep, g / keep_p, jnp.zeros((), g.dtype)), None)


_rng_dropout.defvjp(_rng_dropout_fwd, _rng_dropout_bwd)


def unstack_layers(bert_params: dict) -> dict:
    """Stacked (num_layers, ...) layer tree -> tuple of per-layer dicts.

    The stacked layout is the CANONICAL/stored format (checkpoints, HF
    conversion, TP shardings, the rolled eval scan); the unstacked view is
    the TRAINING-loop fast path — with straight-line layers, each dW lands
    in its own buffer instead of a dynamic-update-slice into the stacked
    gradient (measured +9% step throughput on v5e, PERFORMANCE.md). No-op
    if already unstacked."""
    layers = bert_params["layers"]
    if isinstance(layers, (tuple, list)):
        return bert_params
    n = next(iter(layers.values())).shape[0]
    out = dict(bert_params)
    out["layers"] = tuple({k: v[i] for k, v in layers.items()}
                          for i in range(n))
    return out


def restack_layers(bert_params: dict) -> dict:
    """Inverse of unstack_layers (no-op if already stacked). Numpy leaves
    stack on the HOST — an epoch-end checkpoint canonicalization must not
    allocate a transient stacked copy of params+mu+nu (~1.3 GB at
    BERT-base) in device HBM just to write a file."""
    layers = bert_params["layers"]
    if not isinstance(layers, (tuple, list)):
        return bert_params
    stack = np.stack if all(isinstance(lp[k], np.ndarray) for lp in layers
                            for k in lp) else jnp.stack
    out = dict(bert_params)
    out["layers"] = {k: stack([lp[k] for lp in layers])
                     for k in layers[0]}
    return out


def _layer_norm(x: Array, scale: Array, bias: Array, eps: float,
                out_dtype=None) -> Array:
    """LayerNorm with float32 statistics; `out_dtype` controls the dtype the
    residual stream is carried in (bfloat16 halves the HBM traffic of the
    per-layer stashes the backward pass reads — LN stats stay exact)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    return out.astype(out_dtype) if out_dtype is not None else out


def _dense(x: Array, w: Array, b: Array, dtype, out_dtype=None) -> Array:
    """Matmul in `dtype` with fp32 accumulation; `out_dtype` (default fp32)
    controls the dtype carried forward — intermediate activations stay in the
    compute dtype so backward residuals don't balloon to fp32 (a (2B, S, 4H)
    fp32 FFN residual is what OOMs large batches)."""
    out = jnp.dot(x.astype(dtype), w.astype(dtype),
                  preferred_element_type=jnp.float32)
    out = out + b
    return out.astype(out_dtype) if out_dtype is not None else out


# Degree-6 minimax fit of g(x) = Phi(x) - 0.5 as x * p(x^2) on [0, 4]
# (Phi = the exact-GeLU gaussian CDF, 0.5*(1+erf(x/sqrt2))). Max abs error of
# the resulting GeLU is 4.2e-4 on the fitted range; |x| is clamped to 4 for
# the polynomial argument and the ORIGINAL x multiplies Phi, so large
# activations pass through with relative error <= 3.2e-5 (= 1 - Phi(4)).
# All well below bf16 round-off (half-ulp at |y|=1 is 2e-3); fitted offline
# with scipy, accuracy re-verified in tests/test_bert.py.
_POLY_GELU_C = (0.3985269463542832, -0.06538842792339565, 0.009112993720802636,
                -0.0008789911715555882, 5.4191581420189626e-05,
                -1.8919542111355878e-06, 2.816234526830968e-08)


def poly_gelu(x: Array) -> Array:
    """Exact-GeLU (erf) to beyond-bf16 accuracy in ~12 VPU ops instead of the
    ~25-op f32 erf polynomial. The erf epilogue throttled the inference FFN
    fusions to 108 TF/s on v5e; with this they run at 187 TF/s (~95% of
    peak). Used on the bf16 fast_inference path and, when
    `BertConfig.fast_train` is set, in the bf16 TRAINING pass (fwd+bwd);
    fp32 parity mode always keeps `jax.nn.gelu(approximate=False)`."""
    xf = x.astype(jnp.float32)
    xc = jnp.clip(xf, -4.0, 4.0)
    u = xc * xc
    p = _POLY_GELU_C[6]
    for c in _POLY_GELU_C[5::-1]:
        p = p * u + c
    # Clamp Phi into [0, 1]: beyond the fit range the polynomial residual
    # (~1e-4) would otherwise scale linearly with |x| in the tails.
    phi = jnp.clip(0.5 + xc * p, 0.0, 1.0)
    return (xf * phi).astype(x.dtype)


def _encoder_layer_fast(cfg: BertConfig, x: Array, mask_arg, lp: dict,
                        dropout_rngs=None, dropout_rate: float = 0.0) -> Array:
    """Inference-optimized post-LN layer (see BertConfig.fast_inference for
    the measured numerics/perf envelope). Math identical to _encoder_layer up
    to bf16 materialization points; no dropout (deterministic only).

    mask_arg: (mask_bias, packed_key_mask, segment_len) — the fused-attention
    kernel path uses the key mask + segment length; the einsum fallback uses
    the bias."""
    assert dropout_rngs is None and dropout_rate == 0.0
    mask_bias, key_mask, seg = mask_arg
    B, S, H = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    dt = cfg.compute_dtype

    xb = x.astype(dt)
    # Head-major projections: the (H, nh, hd) weight view makes XLA emit q/k/v
    # directly in the (B, nh, S, hd) attention layout — no transpose copies.
    def proj(w, b):
        out = jnp.einsum("bsh,hnd->bnsd", xb, w.astype(dt).reshape(H, nh, hd),
                         preferred_element_type=jnp.float32)
        return (out + b.reshape(nh, 1, hd)).astype(dt)

    q = proj(lp["q_w"], lp["q_b"])
    k = proj(lp["k_w"], lp["k_b"])
    v = proj(lp["v_w"], lp["v_b"])
    if cfg.fused_attention:
        from blp_tpu.ops import pallas_attention

        ctx = pallas_attention.block_diag_attention(
            q, k, v, key_mask, seg=seg,
            scale=1.0 / math.sqrt(hd)).astype(dt)
    else:
        logits = jnp.einsum("bnqd,bnkd->bnqk", q, k,
                            preferred_element_type=jnp.float32)
        # bf16 logits: halves the HBM round-trip of the (B, nh, S, S)
        # buffer. -10000 padding bias rounds to -9984 — still a hard mask.
        # Softmax statistics stay f32.
        logits = (logits / math.sqrt(hd) + mask_bias).astype(jnp.bfloat16)
        m = jnp.max(logits, axis=-1, keepdims=True).astype(jnp.float32)
        e = jnp.exp(logits.astype(jnp.float32) - m)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)
        ctx = jnp.einsum("bnqk,bnkd->bqnd", probs.astype(dt), v,
                         preferred_element_type=jnp.float32).reshape(B, S, H)

    attn_out = _dense(ctx, lp["attn_out_w"], lp["attn_out_b"], dt, dt)
    x = _layer_norm(x + attn_out, lp["attn_ln_scale"], lp["attn_ln_bias"],
                    cfg.layer_norm_eps, out_dtype=dt)
    ffn = _dense(x, lp["ffn_in_w"], lp["ffn_in_b"], dt, dt)
    ffn = poly_gelu(ffn)
    ffn = _dense(ffn, lp["ffn_out_w"], lp["ffn_out_b"], dt, dt)
    x = _layer_norm(x + ffn, lp["ffn_ln_scale"], lp["ffn_ln_bias"],
                    cfg.layer_norm_eps, out_dtype=dt)
    return x


def _use_fast_inference(cfg: BertConfig, deterministic: bool) -> bool:
    return (deterministic and cfg.fast_inference
            and cfg.compute_dtype != jnp.float32)


def _encoder_layer(cfg: BertConfig, x: Array, mask_bias: Array, lp: dict,
                   dropout_rngs, dropout_rate: float) -> Array:
    """One post-LN transformer layer. x: (B, S, H) float32;
    mask_bias: (B, 1, 1, S) additive attention bias."""
    B, S, H = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    dt = cfg.compute_dtype
    # Residual stream dtype: bf16 when computing in bf16 (fp32 parity mode
    # keeps fp32 end-to-end). Residual adds + LN stats still happen in fp32.
    res_dt = None if dt == jnp.float32 else dt

    from jax.ad_checkpoint import checkpoint_name

    # Mixed-precision structure: see BertConfig.mixed_precision_train.
    mp = cfg.mixed_precision_train and dt != jnp.float32

    # NOTE (measured, do not re-try): fusing q/k/v into one (H, 3H) GEMM via
    # an in-body weight concat LOSES on v5e — 1,872 vs 2,052 triples/s on the
    # flagship step. The concat cannot be hoisted out of the layer scan (the
    # scanned weights differ per iteration) and its backward adds a gradient
    # split + copy per layer; XLA already overlaps the three small GEMMs.
    if mp:
        # Head-major projections (no transpose copies); only a win together
        # with the bf16 GEMM outs below (alone: ~0.4 ms worse in backward).
        xb = x.astype(dt)

        def proj(w, b):
            out = jnp.einsum("bsh,hnd->bnsd", xb,
                             w.astype(dt).reshape(H, nh, hd),
                             preferred_element_type=jnp.float32)
            return (out + b.reshape(nh, 1, hd)).astype(dt)

        q = proj(lp["q_w"], lp["q_b"])
        k = proj(lp["k_w"], lp["k_b"])
        v = proj(lp["v_w"], lp["v_b"])
        q, k, v = (checkpoint_name(t, n) for t, n in ((q, "q"), (k, "k"), (v, "v")))
        logits = jnp.einsum("bnqd,bnkd->bnqk", q, k,
                            preferred_element_type=jnp.float32)
    else:
        q = _dense(x, lp["q_w"], lp["q_b"], dt, dt).reshape(B, S, nh, hd)
        k = _dense(x, lp["k_w"], lp["k_b"], dt, dt).reshape(B, S, nh, hd)
        v = _dense(x, lp["v_w"], lp["v_b"], dt, dt).reshape(B, S, nh, hd)
        q, k, v = (checkpoint_name(t, n) for t, n in ((q, "q"), (k, "k"), (v, "v")))
        logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(dt), k.astype(dt),
                            preferred_element_type=jnp.float32)
    logits = logits / math.sqrt(hd) + mask_bias
    # NOTE (measured, do not re-try): materializing probs in bf16 via an
    # explicit post-softmax cast is a no-op on v5e WITHOUT dropout — XLA
    # already picks the consumer dtype for the buffer. WITH dropout the cast
    # position matters: applying the mask after the cast (mp path) saves the
    # f32 round-trip of the dropped probs (~1.4 ms/step).
    probs = jax.nn.softmax(logits, axis=-1)
    if mp:
        probs = probs.astype(dt)
    if dropout_rngs is not None and cfg.attention_dropout > 0.0:
        probs = _rng_dropout(probs, dropout_rngs[0], cfg.attention_dropout,
                             cfg.dropout_bits)
    if mp:
        ctx = jnp.einsum("bnqk,bnkd->bqnd", probs, v,
                         preferred_element_type=jnp.float32)
    else:
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(dt), v.astype(dt),
                         preferred_element_type=jnp.float32)
    ctx = checkpoint_name(ctx.reshape(B, S, H), "ctx")

    od = dt if mp else None
    attn_out = _dense(ctx, lp["attn_out_w"], lp["attn_out_b"], dt, od)
    if dropout_rngs is not None and dropout_rate > 0.0:
        attn_out = _rng_dropout(attn_out, dropout_rngs[1], dropout_rate,
                                cfg.dropout_bits)
    x = _layer_norm(x + attn_out, lp["attn_ln_scale"], lp["attn_ln_bias"],
                    cfg.layer_norm_eps, out_dtype=res_dt)

    # NOTE (measured, do not re-try): wrapping the FFN pair in its own
    # checkpoint that saves only the bf16 pre-gelu (recompute gelu in bwd to
    # halve the (B,S,4H) stash) LOSES on v5e — 64.4/69.7 ms vs 62.7/61.4 for
    # remat=False/True: the erf recompute costs more than the stash traffic.
    ffn = checkpoint_name(_dense(x, lp["ffn_in_w"], lp["ffn_in_b"], dt, dt),
                          "ffn_pre")
    # fast_train: the beyond-bf16-accurate polynomial GeLU in fwd AND bwd
    # (see BertConfig.fast_train). fp32 parity mode always takes exact erf.
    if cfg.fast_train and dt != jnp.float32:
        ffn = poly_gelu(ffn)
    else:
        ffn = jax.nn.gelu(ffn, approximate=False)
    ffn = _dense(ffn, lp["ffn_out_w"], lp["ffn_out_b"], dt, od)
    if dropout_rngs is not None and dropout_rate > 0.0:
        ffn = _rng_dropout(ffn, dropout_rngs[2], dropout_rate,
                           cfg.dropout_bits)
    x = _layer_norm(x + ffn, lp["ffn_ln_scale"], lp["ffn_ln_bias"],
                    cfg.layer_norm_eps, out_dtype=res_dt)
    return x


def embed_inputs(
    params: dict,
    input_ids: Array,
    attention_mask: Array | None,
    cfg: BertConfig,
) -> tuple[Array, Array, int]:
    """Embedding preamble shared by the scan encoder and the pipelined
    encoder (parallel/pipeline.py): token + position + segment-0 embeddings,
    LayerNorm, optional sequence packing, additive attention bias.

    Returns (x, mask_bias, pack, packed_key_mask): x is (B/pack, pack*S, H)
    in the residual dtype; mask_bias is the additive (-10000 on hidden keys)
    attention bias broadcastable to (B/pack, heads, pack*S, pack*S);
    packed_key_mask is the (B/pack, pack*S) key mask the fused-attention
    kernel regenerates the bias from (ops/pallas_attention.py)."""
    B, S = input_ids.shape
    emb = params["embeddings"]

    res_dt = None if cfg.compute_dtype == jnp.float32 else cfg.compute_dtype
    x = emb["word"][input_ids]
    x = x + emb["position"][:S][None, :, :]
    x = x + emb["token_type"][0][None, None, :]  # BLP always uses segment 0
    x = _layer_norm(x, emb["ln_scale"], emb["ln_bias"], cfg.layer_norm_eps,
                    out_dtype=res_dt)

    pack = cfg.seq_pack
    if pack == "auto":
        pack = next((p for p in (4, 2) if B % p == 0 and p * S <= 128), 1)
    if attention_mask is None:
        key_mask = jnp.ones((B, S), jnp.float32)
    else:
        key_mask = attention_mask.astype(jnp.float32)
    if pack > 1:
        # Fold `pack` sequences into one row (free reshape: row-major layout)
        # with a block-diagonal bias so attention stays within each sequence.
        Bp, Sp = B // pack, pack * S
        x = x.reshape(Bp, Sp, x.shape[-1])
        packed_mask = key_mask.reshape(Bp, Sp)
        same_block = jnp.equal(jnp.arange(Sp)[:, None] // S,
                               jnp.arange(Sp)[None, :] // S)
        visible = same_block[None] & (packed_mask[:, None, :] > 0)
        mask_bias = jnp.where(visible, 0.0, -10000.0)[:, None, :, :]
    else:
        packed_mask = key_mask
        mask_bias = (1.0 - key_mask)[:, None, None, :] * -10000.0
    return x, mask_bias, pack, packed_mask


def bert_encode(
    params: dict,
    input_ids: Array,
    attention_mask: Array | None,
    cfg: BertConfig,
    *,
    deterministic: bool = True,
    dropout_rng: Array | None = None,
) -> Array:
    """Run the BERT encoder. Returns last hidden states (B, S, H) in the
    residual dtype: float32 in fp32 parity mode, compute_dtype otherwise.

    attention_mask: (B, S) with 1 for real tokens, 0 for padding (None = all
    ones). Matches HF semantics: additive -10000 bias on padded keys.
    """
    B, S = input_ids.shape
    x, mask_bias, pack, key_mask = embed_inputs(params, input_ids,
                                                attention_mask, cfg)

    dropout_rate = 0.0 if deterministic else cfg.hidden_dropout
    if not deterministic:
        if dropout_rng is None:
            raise ValueError("dropout_rng required when deterministic=False")
        # Dropout draws ~200M bits/step; threefry2x32 runs on the VPU and
        # costs ~10ms/step at B=128 on v5e. Re-key the dropout stream onto the
        # hardware RNG (rbg) — ~3x cheaper, still deterministic per input key.
        dropout_rng = jax.random.wrap_key_data(
            jax.random.bits(dropout_rng, (4,), jnp.uint32), impl="rbg")
        x = _rng_dropout(x, jax.random.fold_in(dropout_rng, 0), dropout_rate,
                         cfg.dropout_bits)
        layer_rngs = jax.random.split(jax.random.fold_in(dropout_rng, 1),
                                      cfg.num_layers * 3).reshape(cfg.num_layers, 3)
    else:
        layer_rngs = None

    # bf16 deterministic encodes route through the inference-optimized layer
    # (BertConfig.fast_inference — measured +78% table-build throughput).
    # The fast layer gets the key mask + segment length alongside the bias
    # so the fused-attention kernel can regenerate the mask in-VMEM.
    if _use_fast_inference(cfg, deterministic):
        layer_fn = _encoder_layer_fast
        mask_bias = (mask_bias, key_mask, S)
    else:
        layer_fn = _encoder_layer

    layers = params["layers"]
    if isinstance(layers, (tuple, list)):
        # UNSTACKED per-layer weights (see unstack_layers): a plain python
        # loop — each layer's weight gradient is written straight into its
        # own leaf instead of a dynamic-update-slice into the stacked
        # (12, ...) buffer. Measured on the v5e flagship train step: 44.6 vs
        # 48.7 ms (+9% throughput). The rng schedule matches the stacked
        # path exactly (same split rows per layer).
        # cfg / the mask argument / dropout_rate are CLOSED OVER, not passed
        # through jax.checkpoint — checkpoint traces every argument, and a
        # traced dropout_rate (or the fast path's (bias, mask, seg) tuple
        # with its python int) breaks the layers' static `rate == 0.0` /
        # `Sp % seg` branching with a TracerBoolConversionError.
        def body_fn(x_, lp_, rngs_):
            return layer_fn(cfg, x_, mask_bias, lp_, rngs_, dropout_rate)

        plain_fn = body_fn
        # remat=<int k>: PARTIAL rematerialization — checkpoint only the
        # first k layers and let the rest stash normally. Peak memory at the
        # end of the forward is k small boundary residuals + (L-k) full
        # per-layer stashes, so k dials recompute against HBM (at the W5M
        # operating point, B=1024/L=64, each non-remat'd BERT-base layer
        # stashes ~2 GB; see PERFORMANCE.md round-5 W5M section for the
        # measured k sweep). Unstacked layout only (the rolled scan has one
        # body; int falls back to full remat there).
        remat_k = cfg.num_layers
        if isinstance(cfg.remat, int) and not isinstance(cfg.remat, bool):
            remat_k = cfg.remat
        if cfg.remat:
            # Same policy selection as the stacked scan below — remat="dots"/
            # "names" must not silently degrade to full per-layer recompute
            # on the unstacked (default single-device training) layout.
            if cfg.remat == "dots":
                policy = jax.checkpoint_policies.dots_saveable
            elif cfg.remat == "names":
                policy = jax.checkpoint_policies.save_only_these_names(
                    "ffn_pre", "ctx", "q", "k", "v")
            else:
                policy = None
            body_fn = jax.checkpoint(body_fn, policy=policy)
        for i, lp in enumerate(layers):
            rngs = None if layer_rngs is None else layer_rngs[i]
            x = (body_fn if i < remat_k else plain_fn)(x, lp, rngs)
        return x.reshape(B, S, x.shape[-1]) if pack > 1 else x

    def body(carry, scanned):
        if layer_rngs is None:
            lp = scanned
            rngs = None
        else:
            lp, rngs = scanned
        out = layer_fn(cfg, carry, mask_bias, lp, rngs, dropout_rate)
        return out, None

    if cfg.remat:
        # remat=True: full per-layer rematerialisation (min memory).
        # remat="dots": save matmul outputs, recompute elementwise (gelu,
        # dropout, LN, softmax) in the backward — cuts the per-layer stash.
        # remat="names": save only the tagged expensive-to-recompute
        # activations (ffn_pre, ctx, q/k/v); recompute the rest.
        # Measured on v5e, flagship step (B=128, L=32, bf16): False 62.7ms,
        # True 61.4ms, "names" 69.1ms, "dots" 73.6ms — XLA's default stash
        # choice and full recompute are the two good points; True also
        # minimizes HBM (needed for B>=512).
        if cfg.remat == "dots":
            policy = jax.checkpoint_policies.dots_saveable
        elif cfg.remat == "names":
            policy = jax.checkpoint_policies.save_only_these_names(
                "ffn_pre", "ctx", "q", "k", "v")
        else:
            policy = None
        body = jax.checkpoint(body, policy=policy)

    scanned = layers if layer_rngs is None else (layers, layer_rngs)
    unroll = cfg.scan_unroll
    if unroll == "auto":
        unroll = 1 if (cfg.remat or deterministic) else cfg.num_layers
    x, _ = jax.lax.scan(body, x, scanned, unroll=min(unroll, cfg.num_layers))
    return x.reshape(B, S, x.shape[-1]) if pack > 1 else x


def bert_pooler(params: dict, hidden: Array, cfg: BertConfig) -> Array:
    """HF pooler: tanh(dense([CLS])). Unused by BLP but kept for checkpoint
    round-trips and downstream users."""
    cls = hidden[:, 0]
    return jnp.tanh(_dense(cls, params["pooler"]["w"], params["pooler"]["b"],
                           cfg.compute_dtype))


# --------------------------------------------------------------------------
# HF checkpoint conversion
# --------------------------------------------------------------------------

def params_from_hf_state_dict(state_dict: dict, cfg: BertConfig) -> dict:
    """Convert a `transformers.BertModel.state_dict()` (torch tensors or numpy
    arrays, names as of HF>=4.x with or without the `bert.` prefix) into this
    module's stacked-layer pytree."""

    def get(name: str) -> np.ndarray:
        for prefix in ("", "bert."):
            key = prefix + name
            if key in state_dict:
                t = state_dict[key]
                return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                                  dtype=np.float32)
        raise KeyError(f"Missing parameter {name!r} in state dict")

    def stack(fmt: str, transpose: bool = False) -> jnp.ndarray:
        mats = [get(fmt.format(i)) for i in range(cfg.num_layers)]
        if transpose:
            mats = [m.T for m in mats]
        return jnp.asarray(np.stack(mats))

    p = "encoder.layer.{}."
    return {
        "embeddings": {
            "word": jnp.asarray(get("embeddings.word_embeddings.weight")),
            "position": jnp.asarray(get("embeddings.position_embeddings.weight")),
            "token_type": jnp.asarray(get("embeddings.token_type_embeddings.weight")),
            "ln_scale": jnp.asarray(get("embeddings.LayerNorm.weight")),
            "ln_bias": jnp.asarray(get("embeddings.LayerNorm.bias")),
        },
        "layers": {
            "q_w": stack(p + "attention.self.query.weight", transpose=True),
            "q_b": stack(p + "attention.self.query.bias"),
            "k_w": stack(p + "attention.self.key.weight", transpose=True),
            "k_b": stack(p + "attention.self.key.bias"),
            "v_w": stack(p + "attention.self.value.weight", transpose=True),
            "v_b": stack(p + "attention.self.value.bias"),
            "attn_out_w": stack(p + "attention.output.dense.weight", transpose=True),
            "attn_out_b": stack(p + "attention.output.dense.bias"),
            "attn_ln_scale": stack(p + "attention.output.LayerNorm.weight"),
            "attn_ln_bias": stack(p + "attention.output.LayerNorm.bias"),
            "ffn_in_w": stack(p + "intermediate.dense.weight", transpose=True),
            "ffn_in_b": stack(p + "intermediate.dense.bias"),
            "ffn_out_w": stack(p + "output.dense.weight", transpose=True),
            "ffn_out_b": stack(p + "output.dense.bias"),
            "ffn_ln_scale": stack(p + "output.LayerNorm.weight"),
            "ffn_ln_bias": stack(p + "output.LayerNorm.bias"),
        },
        "pooler": {
            "w": jnp.asarray(get("pooler.dense.weight").T),
            "b": jnp.asarray(get("pooler.dense.bias")),
        },
    }


def config_from_hf(hf_config) -> BertConfig:
    """Build a BertConfig from a transformers BertConfig object."""
    return BertConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        max_position_embeddings=hf_config.max_position_embeddings,
        type_vocab_size=hf_config.type_vocab_size,
        layer_norm_eps=hf_config.layer_norm_eps,
        hidden_dropout=hf_config.hidden_dropout_prob,
        attention_dropout=hf_config.attention_probs_dropout_prob,
        initializer_range=hf_config.initializer_range,
    )
