"""Device mesh construction and sharding rules.

The reference's only parallelism is single-node torch DataParallel
(reference: train.py:329-330). Here parallelism is SPMD over a named
`jax.sharding.Mesh`:

  axis "data"  — batch (DP): batch rows sharded, gradients all-reduced by XLA
  axis "model" — tensor parallel (TP) inside the BERT encoder: attention
                 heads / MLP hidden dim column-sharded, output projections
                 row-sharded (Megatron layout), collectives inserted by GSPMD

The evaluation candidate axis is sharded over BOTH axes flattened (the
"sequence-parallel" analogue for this workload — SURVEY.md §5.7: the long
axis is the 4.8M-entity candidate dimension, not the token sequence).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_data: int | None = None, num_model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh. Defaults: all devices on the data axis."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if num_data is None:
        num_data = n // num_model
    if num_data * num_model != n:
        raise ValueError(f"mesh {num_data}x{num_model} != {n} devices")
    return Mesh(devices.reshape(num_data, num_model), ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def candidate_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the candidate-entity axis over every device (data*model)."""
    return NamedSharding(mesh, P(("data", "model")))


# -- tensor-parallel parameter layout ---------------------------------------

_BERT_TP_SPECS = {
    # stacked layer params: leading axis is the layer index
    "q_w": P(None, None, "model"), "q_b": P(None, "model"),
    "k_w": P(None, None, "model"), "k_b": P(None, "model"),
    "v_w": P(None, None, "model"), "v_b": P(None, "model"),
    "attn_out_w": P(None, "model", None), "attn_out_b": P(),
    "attn_ln_scale": P(), "attn_ln_bias": P(),
    "ffn_in_w": P(None, None, "model"), "ffn_in_b": P(None, "model"),
    "ffn_out_w": P(None, "model", None), "ffn_out_b": P(),
    "ffn_ln_scale": P(), "ffn_ln_bias": P(),
}


#: Per-layer (unstacked tuple-of-layers) variants: same Megatron layout with
#: the leading layer axis stripped.
_BERT_TP_SPECS_UNSTACKED = {k: P(*v[1:]) for k, v in _BERT_TP_SPECS.items()}


def param_shardings(params: dict, mesh: Mesh, *, tensor_parallel: bool = True):
    """NamedSharding pytree for a BLP parameter tree.

    BERT encoder layers get the Megatron column/row TP layout over 'model';
    everything else (embeddings, rel_emb, projection, word tables, DKRL convs)
    is replicated — they are small relative to the encoder. Handles BOTH
    layer layouts: the canonical stacked (num_layers, ...) dict and the
    unstacked tuple-of-layer-dicts view (training.unstack_params) that DP
    meshes train in (round-3 +9% step win, models/bert.py)."""

    def assign(path: tuple, leaf):
        if tensor_parallel:
            if len(path) >= 2 and path[-2] == "layers":
                spec = _BERT_TP_SPECS.get(path[-1])
                if spec is not None:
                    return NamedSharding(mesh, spec)
            if (len(path) >= 3 and path[-3] == "layers"
                    and isinstance(path[-2], int)):
                spec = _BERT_TP_SPECS_UNSTACKED.get(path[-1])
                if spec is not None:
                    return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        if isinstance(tree, (tuple, list)):
            seq = [walk(v, path + (i,)) for i, v in enumerate(tree)]
            return tuple(seq) if isinstance(tree, tuple) else seq
        return assign(path, tree)

    return walk(params)


def shard_params(params: dict, shardings) -> dict:
    return jax.device_put(params, shardings)
