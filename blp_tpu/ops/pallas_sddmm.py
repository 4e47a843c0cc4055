"""Pallas SDDMM scoring kernel: positives + in-batch negatives in VMEM.

Training scores only the observed edge and its K sampled corruptions
(reference: models.py:51-70) — an SDDMM-shaped computation. The XLA path
materializes the gathered (B, K, d) negative-embedding tensors in HBM
(2*B*K*d floats); this kernel keeps the whole (2B, d) entity matrix resident
in VMEM (in-batch entities are small: B=1024, d=128 -> 1 MB) and gathers rows
on-chip, emitting (B, 1) positive and (B, K) negative scores directly.

STATUS — not the default path (blp.ModelConfig.sddmm_pallas=False). On v5e
the XLA formulation's (B, K, d) HBM gather is ~66 MB at B=1024/K=64/d=128,
well under a millisecond at HBM bandwidth, and the transductive train step is
dominated by the optimizer update and dispatch; the kernel's on-chip gather
(row-at-a-time dynamic sublane slices) is serial and does not beat it. Kept
as a correctness-tested reference for SDDMM-style fusion.

TPU lowering notes (why the kernel is shaped this way): the negative-index
matrices live in SMEM — scalar reads of dynamic positions from VMEM vector
refs do not lower (Mosaic requires lane indices provably aligned to 128);
positive and negative scores are separate outputs because a (b, 1+K) store
at lane offset 1 is similarly unaligned.

Gradients: jax.custom_vjp — forward runs the kernel, backward runs the VJP of
the XLA reference formulation (bit-compatible math, guaranteed-correct
gradients without a handwritten backward kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blp_tpu.models import scoring


def _score_rows(heads, tails, rels, rel_model: str):
    """(N, d) x 3 -> (1, N) scores, same math as models/scoring.py."""
    return scoring.get_score_fn(rel_model)(heads, tails, rels)[None, :]


def _make_kernel(rel_model: str, block_b: int, K: int):
    def kernel(negh_ref, negt_ref, ent_ref, rel_ref, pos_ref, neg_ref,
               h_scratch, t_scratch):
        """One grid step scores `block_b` edges.

        negh_ref/negt_ref: (block_b, K) int32 (SMEM)
        ent_ref: (2B, d) whole in-batch entity matrix (VMEM)
        rel_ref: (block_b, d) (VMEM)
        pos_ref: (block_b, 1); neg_ref: (block_b, K)
        h_scratch/t_scratch: (K, d) VMEM row-gather staging
        """
        base = pl.program_id(0) * block_b

        def per_row(r, _):
            row = base + r
            rel = rel_ref[r, :][None, :]                    # (1, d)
            head = ent_ref[pl.ds(2 * row, 1), :]            # (1, d)
            tail = ent_ref[pl.ds(2 * row + 1, 1), :]
            pos_ref[pl.ds(r, 1), :] = _score_rows(head, tail, rel, rel_model)

            def gather(k, _):
                h_scratch[pl.ds(k, 1), :] = ent_ref[pl.ds(negh_ref[r, k], 1), :]
                t_scratch[pl.ds(k, 1), :] = ent_ref[pl.ds(negt_ref[r, k], 1), :]
                return 0

            jax.lax.fori_loop(0, K, gather, 0)
            neg_ref[pl.ds(r, 1), :] = _score_rows(
                h_scratch[:, :], t_scratch[:, :], rel, rel_model)  # (1, K)
            return 0

        jax.lax.fori_loop(0, block_b, per_row, 0)

    return kernel


def _sddmm_pallas(ent_flat, rel_emb, neg_idx, *, rel_model: str,
                  block_b: int, interpret: bool):
    B, d = rel_emb.shape
    K = neg_idx.shape[1]
    grid_b = -(-B // block_b)
    if B % block_b != 0:
        raise ValueError(f"batch {B} must divide block_b {block_b}")

    pos, neg = pl.pallas_call(
        _make_kernel(rel_model, block_b, K),
        grid=(grid_b,),
        in_specs=[
            pl.BlockSpec((block_b, K), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block_b, K), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(ent_flat.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_b, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((B, 1), jnp.float32),
                   jax.ShapeDtypeStruct((B, K), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((K, d), jnp.float32),
                        pltpu.VMEM((K, d), jnp.float32)],
        interpret=interpret,
    )(neg_idx[..., 0].astype(jnp.int32), neg_idx[..., 1].astype(jnp.int32),
      ent_flat.astype(jnp.float32), rel_emb.astype(jnp.float32))
    return pos, neg


def _sddmm_xla(ent_flat, rel_emb, neg_idx, *, rel_model: str):
    """Reference XLA formulation (also the VJP source)."""
    B = rel_emb.shape[0]
    score = scoring.get_score_fn(rel_model)
    ent = ent_flat.reshape(B, 2, -1)
    pos = score(ent[:, 0], ent[:, 1], rel_emb)[:, None]
    neg_h = ent_flat[neg_idx[..., 0]]
    neg_t = ent_flat[neg_idx[..., 1]]
    neg = score(neg_h, neg_t, rel_emb[:, None, :])
    return pos, neg


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def sddmm_scores(ent_flat, rel_emb, neg_idx, rel_model: str = "transe",
                 block_b: int = 8, interpret: bool = False):
    """Fused positive + negative scoring.

    ent_flat: (2B, d) in-batch entity embeddings ([h0, t0, h1, t1, ...]).
    rel_emb: (B, d); neg_idx: (B, K, 2) indices into ent_flat.
    Returns (pos_scores (B, 1), neg_scores (B, K)).
    """
    return _sddmm_pallas(ent_flat, rel_emb, neg_idx, rel_model=rel_model,
                         block_b=block_b, interpret=interpret)


def _fwd(ent_flat, rel_emb, neg_idx, rel_model, block_b, interpret):
    out = _sddmm_pallas(ent_flat, rel_emb, neg_idx, rel_model=rel_model,
                        block_b=block_b, interpret=interpret)
    return out, (ent_flat, rel_emb, neg_idx)


def _bwd(rel_model, block_b, interpret, residuals, cotangents):
    ent_flat, rel_emb, neg_idx = residuals
    _, vjp = jax.vjp(
        lambda e, r: _sddmm_xla(e, r, neg_idx, rel_model=rel_model),
        ent_flat, rel_emb)
    d_ent, d_rel = vjp(cotangents)
    return d_ent, d_rel, None


sddmm_scores.defvjp(_fwd, _bwd)
