"""GPipe-style pipeline parallelism (PP) for the BLP BERT encoder.

The reference has no pipeline parallelism (its only parallelism is torch
DataParallel, reference: train.py:329-330); BERT-base fits one chip, so PP
exists here for the scaling story: stacking the framework onto encoders whose
layer stack does NOT fit a single chip's HBM, and completing the DP/TP/PP/SP
matrix (SURVEY.md §2.3).

Design (TPU-idiomatic, no hand-written sends):
  * mesh axes ("data", "pipe"): batch rows sharded over `data`, the encoder's
    stacked (num_layers, ...) parameter arrays sharded over `pipe` on the
    leading axis — the stacked-layer layout of models/bert.py makes a stage
    simply a contiguous slice of every layer parameter.
  * inside `shard_map`, microbatches flow through stages with
    `lax.ppermute` over a `lax.scan` of num_microbatches + num_stages - 1
    ticks (the standard JAX pipelining pattern; the warmup/drain bubble is
    the usual (P-1)/(M+P-1) fraction).
  * embeddings and the [CLS] projection are replicated (they are small);
    every stage computes them redundantly rather than shipping activations
    an extra hop — the `jnp.where(stage == 0, fresh_input, carried)` select
    gives zero cotangent to the unused path, so gradients stay exact.
  * the final hidden states are `lax.psum`'d from the last stage to all
    stages, and each data shard `all_gather`s entity embeddings over `data`
    so the in-batch negative-sampling loss sees the GLOBAL batch — identical
    semantics to the single-device step (models/blp.py::train_loss).
  * autodiff runs straight through `shard_map`/`ppermute`/`psum` (GPipe-style
    stashing of per-microbatch activations by the scan's backward).

Dropout: per-(microbatch, global-layer) keys derived from the folded step
key, so PP training regularizes like the single-device step (the exact
bernoulli bits differ from the scan encoder's — distribution-equivalent, same
determinism guarantees). Parity with the single-device loss/grads is exact in
deterministic mode and tested bitwise-close in fp32 (tests/test_pipeline.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from blp_tpu.data.sampling import sample_negative_indices
from blp_tpu.models import bert as bert_mod
from blp_tpu.models import blp, scoring

from jax import shard_map


def make_pipeline_mesh(num_data: int, num_pipe: int, devices=None) -> Mesh:
    """A (data, pipe) mesh. PP stages should map to an ICI-contiguous axis so
    the stage-to-stage ppermute rides neighbor links."""
    import numpy as np

    devices = np.asarray(devices if devices is not None else jax.devices())
    if num_data * num_pipe > devices.size:
        raise ValueError(f"mesh {num_data}x{num_pipe} > {devices.size} devices")
    devices = devices.reshape(-1)[: num_data * num_pipe]
    return Mesh(devices.reshape(num_data, num_pipe), ("data", "pipe"))


def pipeline_param_specs(params: dict) -> dict:
    """PartitionSpecs: BERT layer stacks sharded over 'pipe' on the leading
    (num_layers,) axis; everything else replicated."""

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        if len(path) >= 2 and path[-2] == "layers":
            return P("pipe")
        return P()

    return walk(params)


def shard_pipeline_params(params: dict, mesh: Mesh) -> dict:
    specs = pipeline_param_specs(params)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                             is_leaf=lambda x: isinstance(x, P))
    return jax.device_put(params, shardings)


def _stage_layers(cfg, layer_stack: dict, x, mask_bias, micro_idx, drop_key,
                  dropout_rate: float):
    """Run this stage's contiguous slice of encoder layers (a lax.scan over
    the local (L/P, ...) stack). Dropout keys are derived from the GLOBAL
    layer index and the microbatch index so every (layer, microbatch) pair
    draws an independent stream regardless of the stage layout."""
    num_local = jax.tree.leaves(layer_stack)[0].shape[0]
    first_global = lax.axis_index("pipe") * num_local

    def body(carry, scanned):
        lp, local_i = scanned
        if drop_key is None:
            rngs = None
        else:
            g = first_global + local_i
            rngs = jax.random.split(
                jax.random.fold_in(drop_key, micro_idx * cfg.num_layers + g), 3)
        out = bert_mod._encoder_layer(cfg, carry, mask_bias, lp, rngs,
                                      dropout_rate)
        return out, None

    out, _ = lax.scan(body, x, (layer_stack, jnp.arange(num_local)))
    return out


def _pipelined_hidden(cfg, layer_stack: dict, x, mask_bias, num_micro: int,
                      drop_key, dropout_rate: float):
    """Microbatched pipeline over the 'pipe' axis.

    x: (Bp, Sp, H) local packed activations; mask_bias broadcastable to
    (Bp, heads, Sp, Sp). Returns the full (Bp, Sp, H) last hidden states,
    identical on every pipe stage (psum'd from the last stage)."""
    num_stages = lax.axis_size("pipe")
    stage = lax.axis_index("pipe")
    Bp = x.shape[0]
    if Bp % num_micro:
        raise ValueError(f"local packed batch {Bp} not divisible by "
                         f"num_microbatches={num_micro}")
    mb = Bp // num_micro
    x_mb = x.reshape(num_micro, mb, *x.shape[1:])
    mask_mb = jnp.broadcast_to(
        mask_bias, (Bp, *mask_bias.shape[1:])
    ).reshape(num_micro, mb, *mask_bias.shape[1:])

    def tick(state, t):
        # At tick t, stage s works on microbatch t - s (if in range).
        mu = t - stage
        valid = (mu >= 0) & (mu < num_micro)
        cur = jnp.clip(mu, 0, num_micro - 1)
        x_in = jnp.where(stage == 0, x_mb[cur], state)
        out = _stage_layers(cfg, layer_stack, x_in, mask_mb[cur], cur,
                            drop_key, dropout_rate)
        y = jnp.where((stage == num_stages - 1) & valid, out, 0.0)
        nxt = lax.ppermute(out, "pipe",
                           [(i, (i + 1) % num_stages) for i in range(num_stages)])
        return nxt, y

    state0 = jnp.zeros((mb, *x.shape[1:]), x.dtype)
    _, ys = lax.scan(tick, state0, jnp.arange(num_micro + num_stages - 1))
    # Microbatch m finishes on the last stage at tick m + P - 1; on every
    # other stage those y's are zeros, so a psum broadcasts the real outputs.
    outs = lax.psum(ys[num_stages - 1:], "pipe")
    return outs.reshape(Bp, *x.shape[1:])


def make_pipeline_loss(cfg: blp.ModelConfig, *, mesh: Mesh, batch_size: int,
                       num_negatives: int, num_microbatches: int = 4,
                       deterministic: bool = False):
    """Build `loss(params, key, batch) -> scalar` running the BERT encoder
    as a DP x PP pipeline over `mesh`. Params must be placed with
    `shard_pipeline_params`; batches are sharded over 'data' on the leading
    axis (parallel/train_parallel.py::shard_batch works on this mesh too)."""
    if cfg.model != "blp":
        raise ValueError("pipeline parallelism applies to the BERT encoder "
                         f"(model='blp'), got {cfg.model!r}")
    enc = cfg.encoder
    num_pipe = mesh.shape["pipe"]
    if enc.num_layers % num_pipe:
        raise ValueError(f"{enc.num_layers} layers not divisible by "
                         f"pipe={num_pipe}")

    def local_loss(params, key, batch):
        # Runs per-device under shard_map: batch is the local shard, params
        # hold this stage's layer slice (replicated elsewhere).
        k_neg, k_drop = jax.random.split(key)
        neg_idx = sample_negative_indices(k_neg, batch_size, num_negatives)

        tok = batch["text_tok"]
        Bl, two, L = tok.shape
        flat_tok = tok.reshape(Bl * two, L)
        mask = batch.get("text_mask")
        flat_mask = None if mask is None else mask.reshape(Bl * two, L)

        x, mask_bias, pack, _ = bert_mod.embed_inputs(params["bert"], flat_tok,
                                                      flat_mask, enc)
        dropout_rate = 0.0
        layer_key = None
        if not deterministic and enc.hidden_dropout > 0.0:
            dropout_rate = enc.hidden_dropout
            # Distinct stream per data shard; re-key onto the hardware RNG
            # as in bert_encode (threefry mask generation is VPU-expensive).
            shard_key = jax.random.fold_in(k_drop, lax.axis_index("data"))
            shard_key = jax.random.wrap_key_data(
                jax.random.bits(shard_key, (4,), jnp.uint32), impl="rbg")
            emb_key, layer_key = jax.random.split(shard_key)
            keep = jax.random.bernoulli(emb_key, 1.0 - dropout_rate, x.shape)
            x = jnp.where(keep, x / (1.0 - dropout_rate), 0.0)

        hidden = _pipelined_hidden(enc, params["bert"]["layers"], x, mask_bias,
                                   num_microbatches, layer_key, dropout_rate)
        hidden = hidden.reshape(Bl * two, L, -1) if pack > 1 else hidden
        cls = hidden[:, 0]
        emb = jnp.dot(cls, params["proj"], preferred_element_type=jnp.float32)
        if cfg.normalize_embs:
            emb = scoring.l2_normalize(emb)

        # Global-batch loss: gather entity embeddings + rels over 'data' so
        # in-batch negatives index the global batch (same as single-device).
        ent = lax.all_gather(emb.reshape(Bl, two, -1), "data", tiled=True)
        rels = lax.all_gather(batch["rels"], "data", tiled=True)
        rel_embs = params["rel_emb"][rels]
        return scoring.compute_loss(ent, rel_embs, neg_idx,
                                    rel_model=cfg.rel_model,
                                    loss_fn=cfg.loss_fn,
                                    regularizer=cfg.regularizer)

    batch_specs = {"text_tok": P("data"), "text_mask": P("data"),
                   "rels": P("data")}
    sharded = None

    def loss(params, key, batch):
        nonlocal sharded
        if sharded is None:
            # The loss is replicated by construction (psum over 'pipe',
            # all_gather over 'data'); skip the static replication check —
            # it cannot see through jnp.where on axis_index.
            sharded = shard_map(local_loss, mesh=mesh,
                                in_specs=(pipeline_param_specs(params),
                                          P(), batch_specs),
                                out_specs=P(), check_vma=False)
        return sharded(params, key, batch)

    return loss


def make_pipeline_train_step(cfg: blp.ModelConfig, optimizer, *,
                             mesh: Mesh, batch_size: int, num_negatives: int,
                             num_microbatches: int = 4,
                             deterministic: bool = False):
    """Jitted DP x PP train step (loss + grads + optimizer update)."""
    loss_fn = make_pipeline_loss(
        cfg, mesh=mesh, batch_size=batch_size, num_negatives=num_negatives,
        num_microbatches=num_microbatches, deterministic=deterministic)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, key, batch):
        if isinstance(key, tuple):  # (base_key, step_index): fold in-jit
            key = jax.random.fold_in(key[0], key[1])
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(p, key, batch))(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
