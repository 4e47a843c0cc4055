"""Experiment configuration + sacred-style CLI overrides.

The reference uses sacred (`@ex.config` in train.py:35-55, CLI form
`python train.py link_prediction with key=value ...`). This module provides
the same ergonomics without the dependency: a typed dataclass of defaults and
a `with k=v` parser, so the reference's 48 launcher scripts translate 1:1.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any


@dataclasses.dataclass
class ExperimentConfig:
    # Reference defaults (train.py:35-55).
    dataset: str = "umls"
    inductive: bool = True
    dim: int = 128
    model: str = "blp"              # blp | bert-bow | bert-dkrl | glove-bow | glove-dkrl | transductive
    rel_model: str = "transe"
    loss_fn: str = "margin"
    encoder_name: str = "bert-base-cased"
    regularizer: float = 0.0
    max_len: int = 32
    num_negatives: int = 64
    lr: float = 2e-5
    use_scheduler: bool = True
    batch_size: int = 64
    # Reference default is 512 (train.py:50); 2048 measured ~35% faster
    # phase-1 table builds on v5e (14.7k vs 10.9k entities/s, PERFORMANCE.md)
    # with identical results — chunk size only affects padding of the tail.
    emb_batch_size: int = 2048
    eval_batch_size: int = 64
    max_epochs: int = 40
    checkpoint: str | None = None
    use_cached_text: bool = False
    resume: str | None = None           # train_state-*.npz to continue mid-run
    stop_after_epochs: int | None = None  # early stop (schedule still spans
                                          # max_epochs) — preemption testing

    # TPU-native additions.
    data_dir: str = "data"
    out_dir: str = "output"
    run_id: str | None = None
    seed: int = 0
    vocab_file: str | None = None       # WordPiece vocab (offline); default <dataset>/vocab.txt
    glove_file: str | None = None       # GloVe tensor .pt for glove-* models
    hf_weights: str | None = None       # local HF BertModel state dict (.pt/.bin) for model=blp
    bf16: bool = False                  # bfloat16 encoder compute
    remat: bool | int = False           # rematerialize BERT layers in backward
                                        # (True | False | int k = remat only
                                        # the first k layers — HBM/recompute
                                        # dial, BertConfig.remat)
    fast_train: bool = False            # poly-GeLU training numerics (bf16
                                        # only; quality-parity A/B'd —
                                        # BertConfig.fast_train)
    dropout_bits: int = 32              # random-draw width behind dropout
                                        # masks: 32 = reference bernoulli;
                                        # 8/16 = uint threshold compare —
                                        # +14%/+9% at the W5M operating
                                        # point, LOSES at the flagship
                                        # no-remat point (PERFORMANCE.md)
    adam_bf16_mu: bool = False          # store Adam's first moment in
                                        # bfloat16 (optax mu_dtype; second
                                        # moment stays f32 — bf16 nu is a
                                        # measured quality negative, see
                                        # PERFORMANCE.md round 5)
    tile: int = 65536                   # ranking tile width (candidates per
                                        # streamed block; measured 2.8x over
                                        # 4096 at Wikidata5M scale on v5e)
    eval_every: int = 1                 # epochs between validation evals
    large_dataset: bool = False         # Wikidata5M mode: no global filter graph,
                                        # no train-sample eval (train.py:297-315)
    num_data_shards: int = 1            # data-parallel shards (mesh 'data' axis)
    num_model_shards: int = 1           # tensor-parallel shards ('model' axis)
    num_pipe_shards: int = 1            # pipeline-parallel stages ('pipe' axis,
                                        # model=blp only; layer stack sliced
                                        # over stages — parallel/pipeline.py)
    num_microbatches: int = 4           # GPipe microbatches per step (PP only)
    log_every_frac: float = 0.05        # batch-loss logging interval
    # Multi-host (pod-slice) bring-up over DCN. When coordinator_address is
    # set, jax.distributed initializes before the mesh is built and the epoch
    # loop switches to per-host data loading (parallel/multihost.py:
    # LocalBatcher + global_batch — each host materializes only its rows of
    # every global batch). Replaces the reference's single-process
    # DataParallel (train.py:329-330) at host scale.
    coordinator_address: str | None = None  # "host:port" of process 0
    num_processes: int | None = None
    process_id: int | None = None
    multihost_data: bool = False        # force the LocalBatcher/global_batch
                                        # data path even single-process (the
                                        # path multi-host runs take; used by
                                        # tests — requires a mesh)

    @property
    def dataset_dir(self) -> str:
        return f"{self.data_dir}/{self.dataset}"

    def triples_file(self, split: str) -> str:
        prefix = "ind-" if self.inductive and self.model != "transductive" else ""
        return f"{self.dataset_dir}/{prefix}{split}.tsv"


# "1"/"0" deliberately NOT mapped to bools: remat takes an int layer count
# (remat=1 must mean partial remat of one layer, not True), and a bare 1/0
# for a genuine bool field still behaves correctly as a truthy/falsy int.
_BOOL = {"true": True, "false": False, "yes": True, "no": False}


def _coerce(value: str, field_type: Any):
    if value.lower() in ("none", "null"):
        return None
    # PEP-563 (from __future__ import annotations) leaves field types as
    # STRINGS, so match both live types and annotation text ("bool",
    # "bool | int", "bool = False" unions).
    is_boolish = (
        field_type is bool
        or (isinstance(field_type, str) and "bool" in field_type)
        or bool in getattr(field_type, "__args__", ()))
    if is_boolish and value.lower() in _BOOL:
        return _BOOL[value.lower()]
    try:
        return json.loads(value)
    except (json.JSONDecodeError, ValueError):
        return value


def parse_overrides(argv: list[str], config: ExperimentConfig | None = None) -> ExperimentConfig:
    """Parse `with key=value ...` CLI segments into a config.

    Accepts both `with k=v` (sacred style) and bare `k=v` arguments.
    Unknown keys raise — typos should not be silent.
    """
    cfg = config or ExperimentConfig()
    fields = {f.name: f for f in dataclasses.fields(cfg)}
    args = [a for a in argv if a != "with"]
    for arg in args:
        if "=" not in arg:
            raise ValueError(f"Expected key=value, got {arg!r}")
        key, value = arg.split("=", 1)
        if key not in fields:
            raise ValueError(f"Unknown config key {key!r}. Valid keys: "
                             f"{', '.join(sorted(fields))}")
        setattr(cfg, key, _coerce(value, fields[key].type))
    return cfg
