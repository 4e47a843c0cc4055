"""Pallas TPU kernel: fused block-diagonal attention for packed inference.

The fast_inference encoder packs `pack` short descriptions into one
128-token row with a block-diagonal mask (models/bert.py::embed_inputs), so
attention only mixes tokens within each 32-token segment. The XLA path still
materializes the full (B, nh, Sp, Sp) logits and probs through HBM — at the
flagship table-build shapes (B=1024 packed rows, 12 heads, Sp=128) that is
~400 MB per buffer per layer, ~1/3 of the remaining encode time after the
round-4 fusion work.

This kernel keeps the whole attention block in VMEM per (row-block) grid
step: logits = q_h k_h^T on the MXU, the block-diag + key-padding bias is
regenerated from a (Sp,) key mask (never shipped as an (Sp, Sp) bias
tensor), softmax statistics in f32, ctx = p v_h back on the MXU, and heads
are written out PAIRWISE so every lane store is 128-aligned (hd=64). The
output layout is (B, Sp, nh*hd) — exactly what the attn-out GEMM consumes,
so the (B, nh, Sp, hd) -> (B, Sp, H) transpose disappears too.

Numerics match the fast_inference einsum path's formula exactly (f32 MXU
accumulation, scale+bias in f32, bf16 logits round-trip, f32 softmax);
differences are MXU accumulation order only (measured table diff 3.2e-3 —
the bf16 noise class). Inference-only: no dropout, no custom VJP — the
training pass keeps the XLA einsum attention.

STATUS: documented NEGATIVE result, non-default (`fused_attention=False`).
Measured on v5e (E=4096 flagship encode): 190 ms/call vs the einsum fast
path's 158 ms, stable across row-block sizes 1/2/4 (8 exceeds the 16 MB
scoped-VMEM limit) and across per-head vs head-batched dot + wide-softmax
kernel bodies (189-196 ms). The same shape also defeated jax's bundled
Pallas flash-attention (305-358 ms, PERFORMANCE.md): at one 128-token
block per row the XLA chain runs the attention einsums as TWO giant
batched GEMMs at ~115 TF/s with fused bias/softmax, and a per-row kernel
cannot amortize its grid-step machinery against that — the ~12-15 ms of
logits/probs HBM round-trips it saves are outweighed by ~45 ms of
per-step overheads. Kept (a) as the measured record so the next round
doesn't re-derive it, (b) because its correctness tests pin the einsum
path's masking semantics independently.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: Packed rows per grid step. 8 rows exceeded the 16 MB scoped-VMEM limit at
#: BERT-base shapes (q+k+v+out blocks double-buffered = 21 MB); 1/2/4 all
#: measured within 1 ms of each other (189-191 ms — the loss to the XLA
#: path is not block-size-tunable).
_ROWS_PER_STEP = 4


def _attn_kernel(q_ref, k_ref, v_ref, kmask_ref, out_ref, *, seg: int,
                 scale: float):
    """Blocks: q/k/v (R, nh, Sp, hd) bf16; kmask (R, 1, Sp) f32 (the middle
    singleton keeps the block's trailing dims equal to the array dims — a
    (R, Sp) block with R < 8 violates the sublane divisibility rule);
    out (R, Sp, nh*hd) bf16."""
    R, nh, Sp, hd = q_ref.shape
    row_seg = jax.lax.broadcasted_iota(jnp.int32, (Sp, Sp), 0) // seg
    col_seg = jax.lax.broadcasted_iota(jnp.int32, (Sp, Sp), 1) // seg
    same_block = row_seg == col_seg

    for r in range(R):
        keys_on = kmask_ref[r, 0, :][None, :] > 0.0  # (1, Sp)
        bias = jnp.where(same_block & keys_on, 0.0, -10000.0)  # (Sp, Sp) f32
        # Head-batched dots (one lowered loop, better MXU scheduling than 12
        # separate dot_generals) and ONE (nh*Sp, Sp)-wide softmax — a
        # per-head (Sp, Sp) softmax leaves 7/8 of the VPU sublanes idle.
        logits = jax.lax.dot_general(
            q_ref[r], k_ref[r], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # (nh, Sp, Sp)
        # Same formula as the einsum fast path: scale + bias in f32, one
        # bf16 round-trip, softmax statistics in f32.
        logits = (logits * scale + bias[None]).astype(jnp.bfloat16)
        flat = logits.reshape(nh * Sp, Sp).astype(jnp.float32)
        m = jnp.max(flat, axis=-1, keepdims=True)
        e = jnp.exp(flat - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.bfloat16)
        ctx = jax.lax.dot_general(
            p.reshape(nh, Sp, Sp), v_ref[r], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # (nh, Sp, hd)
        ctx = ctx.astype(out_ref.dtype)
        # Pairwise over heads: each pair's ctx concat is 2*hd lanes (128 at
        # BERT-base), so the output store is lane-tile aligned.
        for h0 in range(0, nh, 2):
            cols = [ctx[h] for h in range(h0, min(h0 + 2, nh))]
            block = cols[0] if len(cols) == 1 else jnp.concatenate(cols, -1)
            out_ref[r, :, h0 * hd:(h0 + len(cols)) * hd] = block


@functools.partial(jax.jit, static_argnames=("seg", "scale", "interpret"))
def block_diag_attention(q, k, v, key_mask, *, seg: int, scale: float,
                         interpret: bool = False):
    """Fused packed attention.

    Args:
      q, k, v: (B, nh, Sp, hd) bf16 head-major projections.
      key_mask: (B, Sp) float, 1 for real tokens (0-padded keys are masked
        within their segment, matching embed_inputs' -10000 bias).
      seg: segment length (the original max_len); Sp must divide by it.
    Returns:
      (B, Sp, nh*hd) bf16 context, attn-out-GEMM-ready.
    """
    B, nh, Sp, hd = q.shape
    if Sp % seg:
        raise ValueError(f"Sp={Sp} not divisible by segment length {seg}")
    rows = _ROWS_PER_STEP
    while B % rows:
        rows //= 2
    interpret = interpret or jax.default_backend() != "tpu"
    grid = (B // rows,)
    qkv_spec = pl.BlockSpec((rows, nh, Sp, hd), lambda b: (b, 0, 0, 0))
    return pl.pallas_call(
        functools.partial(_attn_kernel, seg=seg, scale=scale),
        grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec,
                  pl.BlockSpec((rows, 1, Sp), lambda b: (b, 0, 0))],
        out_specs=pl.BlockSpec((rows, Sp, nh * hd), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Sp, nh * hd), jnp.bfloat16),
        interpret=interpret,
    )(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
      v.astype(jnp.bfloat16), key_mask.astype(jnp.float32)[:, None, :])
