"""Model assembly: the BLP family as config + pure init/apply functions.

Mirrors the reference's model zoo (utils.py:6-28, models.py:7-219):

  blp          BERT encoder -> [CLS] -> bias-free projection to dim
  bert-bow     BOW over BERT's word-embedding table (dim = 768)
  bert-dkrl    DKRL CNN over BERT's word-embedding table
  glove-bow    BOW over a GloVe table (dim = 300)
  glove-dkrl   DKRL CNN over a GloVe table
  transductive xavier entity lookup table (no text)

Entity embeddings are L2-normalized iff the relational model is TransE
(reference: models.py:13,38-43). Parameters are plain pytrees; every apply
function is jit/pjit-compatible and takes `deterministic`/`rng` explicitly.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from blp_tpu.models import bert as bert_mod
from blp_tpu.models import encoders, scoring

Array = jax.Array

TEXT_MODELS = ("blp", "bert-bow", "bert-dkrl", "glove-bow", "glove-dkrl")
ALL_MODELS = TEXT_MODELS + ("transductive",)
#: Models whose data pipeline drops stopwords (reference: train.py:252-253).
DROP_STOPWORD_MODELS = frozenset({"bert-bow", "bert-dkrl", "glove-bow", "glove-dkrl"})


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    model: str = "blp"
    rel_model: str = "transe"
    loss_fn: str = "margin"
    dim: int = 128
    num_relations: int = 1
    num_entities: int = 0          # transductive only
    regularizer: float = 0.0
    emb_dim: int = 300             # word-embedding width for bow/dkrl models
    vocab_size: int = 0            # word-vocab size for bow/dkrl models
    encoder: bert_mod.BertConfig | None = None  # for model == 'blp'
    sddmm_pallas: bool = False     # fused Pallas pos+neg scoring (ops/pallas_sddmm)

    def __post_init__(self):
        if self.model not in ALL_MODELS:
            raise ValueError(f"Unknown model {self.model!r}")
        scoring.get_score_fn(self.rel_model)
        scoring.get_loss_fn(self.loss_fn)
        if self.model == "blp" and self.encoder is None:
            object.__setattr__(self, "encoder", bert_mod.BertConfig())

    @property
    def normalize_embs(self) -> bool:
        return self.rel_model in scoring.NORMALIZED_REL_MODELS

    @property
    def entity_dim(self) -> int:
        """Width of entity/relation embeddings. BOW models embed at the word
        width (reference: models.py:132-134 — dim defaults to embedding_dim)."""
        if self.model.endswith("bow"):
            return self.emb_dim
        return self.dim

    @property
    def is_inductive(self) -> bool:
        return self.model != "transductive"


def _xavier_uniform(key: Array, shape) -> Array:
    bound = jnp.sqrt(6.0 / (shape[0] + shape[1]))
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound)


def init_params(
    key: Array,
    cfg: ModelConfig,
    *,
    word_embeddings: Array | None = None,
    hf_state_dict: dict | None = None,
) -> dict:
    """Build the parameter pytree.

    Args:
      word_embeddings: (V, E) initial word table for bow/dkrl models — BERT's
        word_embeddings for the BE- variants or a GloVe tensor
        (reference: models.py:119-137). Random-init if omitted.
      hf_state_dict: optional HF BertModel state dict for model == 'blp'.
    """
    k_enc, k_rel, k_proj, k_emb = jax.random.split(key, 4)
    d = cfg.entity_dim
    params: dict = {"rel_emb": _xavier_uniform(k_rel, (cfg.num_relations, d))}

    if cfg.model == "blp":
        enc = cfg.encoder
        if hf_state_dict is not None:
            params["bert"] = bert_mod.params_from_hf_state_dict(hf_state_dict, enc)
        else:
            params["bert"] = bert_mod.init_bert_params(k_enc, enc)
        # Bias-free projection (reference: models.py:105); torch Linear default
        # init U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
        bound = 1.0 / jnp.sqrt(jnp.asarray(enc.hidden_size, jnp.float32))
        params["proj"] = jax.random.uniform(
            k_proj, (enc.hidden_size, cfg.dim), minval=-bound, maxval=bound)
    elif cfg.model == "transductive":
        params["ent_emb"] = encoders.init_entity_table(k_emb, cfg.num_entities, cfg.dim)
    else:
        if word_embeddings is not None:
            we = jnp.asarray(word_embeddings, jnp.float32)
        else:
            if cfg.vocab_size <= 0:
                raise ValueError("vocab_size required when word_embeddings not given")
            we = 0.02 * jax.random.normal(k_emb, (cfg.vocab_size, cfg.emb_dim))
        if we.shape[-1] != cfg.emb_dim:
            raise ValueError(f"word_embeddings width {we.shape[-1]} != emb_dim {cfg.emb_dim}")
        params["word_emb"] = we
        if cfg.model.endswith("dkrl"):
            params["dkrl"] = encoders.init_dkrl_params(k_enc, cfg.emb_dim, cfg.dim)

    return params


def encode_raw(
    params: dict,
    cfg: ModelConfig,
    text_tok: Array,
    text_mask: Array | None,
    *,
    deterministic: bool = True,
    rng: Array | None = None,
) -> Array:
    """Encode (B, L) token batches into entity embeddings, WITHOUT the
    TransE normalization (reference `_encode_entity`)."""
    if cfg.model == "blp":
        hidden = bert_mod.bert_encode(
            params["bert"], text_tok, text_mask, cfg.encoder,
            deterministic=deterministic, dropout_rng=rng)
        cls = hidden[:, 0]
        return jnp.dot(cls, params["proj"], preferred_element_type=jnp.float32)
    if cfg.model.endswith("bow"):
        return encoders.bow_encode(params["word_emb"], text_tok, text_mask)
    if cfg.model.endswith("dkrl"):
        return encoders.dkrl_encode(params["dkrl"], params["word_emb"],
                                    text_tok, text_mask)
    raise ValueError(f"{cfg.model} is not a text model")


def encode(
    params: dict,
    cfg: ModelConfig,
    text_tok: Array,
    text_mask: Array | None,
    *,
    deterministic: bool = True,
    rng: Array | None = None,
) -> Array:
    """`encode_raw` + conditional L2 normalization (reference: models.py:38-43)."""
    out = encode_raw(params, cfg, text_tok, text_mask,
                     deterministic=deterministic, rng=rng)
    if cfg.normalize_embs:
        out = scoring.l2_normalize(out)
    return out


def encode_entity_ids(params: dict, cfg: ModelConfig, entity_ids: Array) -> Array:
    """Transductive lookup (reference: models.py:214-215) + normalization."""
    out = params["ent_emb"][entity_ids]
    if cfg.normalize_embs:
        out = scoring.l2_normalize(out)
    return out


@functools.partial(jax.jit, static_argnums=(1,))
def encode_jit(params: dict, cfg: ModelConfig, text_tok: Array,
               text_mask: Array | None) -> Array:
    """The shared jitted inference encoder (eval table build, retrieval,
    serving). Module-level so jax.jit caches one executable per (config,
    shapes) — a wrapper created inside a function retraces and recompiles the
    full encoder on every call. Params are a jit ARGUMENT, never a closure
    constant: closed-over weights get baked into the compile payload (440MB
    for BERT-base), which bloats executables and exceeds remote-compile
    request limits. ModelConfig is frozen/hashable, hence static."""
    return encode(params, cfg, text_tok, text_mask, deterministic=True)


def train_loss(
    params: dict,
    cfg: ModelConfig,
    batch: dict,
    *,
    deterministic: bool = False,
    rng: Array | None = None,
) -> Array:
    """Link-prediction loss for one batch (reference: models.py:78-93,51-70).

    batch:
      text models:  text_tok (B, 2, L), text_mask (B, 2, L)
      transductive: pos_pairs (B, 2) entity ids
      both:         rels (B,), neg_idx (B, K, 2)
    """
    if cfg.is_inductive:
        text_tok = batch["text_tok"]
        B, two, L = text_tok.shape
        mask = batch.get("text_mask")
        flat_mask = None if mask is None else mask.reshape(B * two, L)
        ent = encode(params, cfg, text_tok.reshape(B * two, L), flat_mask,
                     deterministic=deterministic, rng=rng)
        ent = ent.reshape(B, 2, -1)
    else:
        ent = encode_entity_ids(params, cfg, batch["pos_pairs"])

    rel_embs = params["rel_emb"][batch["rels"].reshape(-1)]
    if cfg.sddmm_pallas:
        from blp_tpu.ops import pallas_sddmm

        pos, neg = pallas_sddmm.sddmm_scores(
            ent.reshape(-1, ent.shape[-1]), rel_embs, batch["neg_idx"],
            cfg.rel_model)
        total = scoring.get_loss_fn(cfg.loss_fn)(pos, neg)
        if cfg.regularizer:
            total = total + cfg.regularizer * scoring.l2_regularization(
                ent[:, 0, :], ent[:, 1, :], rel_embs)
        return total
    return scoring.compute_loss(
        ent, rel_embs, batch["neg_idx"],
        rel_model=cfg.rel_model, loss_fn=cfg.loss_fn, regularizer=cfg.regularizer)
