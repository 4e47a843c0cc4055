"""Training / evaluation driver.

CLI (sacred-style, mirroring the reference's commands):

    python -m blp_tpu.train link_prediction with dataset=umls model=blp ...
    python -m blp_tpu.train node_classification with dataset=... checkpoint=...

Reference behaviour mirrored (train.py:246-405): inductive/transductive data
selection, filter-graph construction with the large-dataset (Wikidata5M)
special case, per-epoch unfiltered train-sample/validation eval, best-raw-MRR
checkpointing, final filtered valid+test eval from the best checkpoint, and
entity-embedding export. TPU-native: one jitted train step (negatives sampled
on-device), fixed-shape batches, streamed ranking eval, full-state
checkpoints with resume, JSONL metrics stream.
"""

from __future__ import annotations

import dataclasses
import json
import os
import os.path as osp
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from blp_tpu import checkpoint as ckpt
from blp_tpu import evaluation, observers, training
from blp_tpu.config import ExperimentConfig, parse_overrides
from blp_tpu.data.datasets import GraphData, TextGraphData
from blp_tpu.data.filtering import FilterIndex
from blp_tpu.data import prefetch
from blp_tpu.data.loader import epoch_batches, num_batches, text_train_batch
from blp_tpu.data.tokenizers import GloVeTokenizer, WordPieceTokenizer
from blp_tpu.models import bert, blp
from blp_tpu.utils import get_logger

log = get_logger()


def make_tokenizer(cfg: ExperimentConfig):
    if cfg.model in ("blp", "bert-bow", "bert-dkrl"):
        vocab = cfg.vocab_file or osp.join(cfg.dataset_dir, "vocab.txt")
        if not osp.exists(vocab):
            raise FileNotFoundError(
                f"WordPiece vocab not found at {vocab}; this environment has no "
                f"network access — provide vocab_file= pointing at a local "
                f"bert-base-cased vocab.txt")
        return WordPieceTokenizer(vocab, do_lower_case=False)
    maps = cfg.glove_file or osp.join(cfg.data_dir, "glove", "glove.6B.300d-maps.pt")
    if maps.endswith(".pt"):
        maps_path = maps.replace(".pt", "-maps.pt") if "-maps" not in maps else maps
    else:
        maps_path = maps
    return GloVeTokenizer(maps_path)


def make_model_config(cfg: ExperimentConfig, tokenizer, num_relations: int,
                      num_entities: int) -> blp.ModelConfig:
    encoder = None
    emb_dim, vocab_size = 300, 0
    if cfg.model == "blp":
        vocab_size = len(tokenizer.vocab)
        numerics = dict(
            compute_dtype=jnp.bfloat16 if cfg.bf16 else jnp.float32,
            remat=cfg.remat, fast_train=cfg.fast_train,
            dropout_bits=cfg.dropout_bits)
        if cfg.encoder_name == "tiny":
            # The tiny encoder honors the same numerics flags — a CLI run
            # with encoder_name=tiny must exercise (and validate) exactly
            # the knobs a full-size run would.
            encoder = bert.BertConfig.tiny(vocab_size=max(vocab_size, 128),
                                           **numerics)
        else:
            encoder = bert.BertConfig(vocab_size=vocab_size, **numerics)
    elif cfg.model.startswith("bert"):
        vocab_size = len(tokenizer.vocab)
        emb_dim = 768 if cfg.encoder_name != "tiny" else 32
    elif cfg.model.startswith("glove"):
        vocab_size = len(tokenizer.word2idx)
        emb_dim = 300
    return blp.ModelConfig(
        model=cfg.model, rel_model=cfg.rel_model, loss_fn=cfg.loss_fn,
        dim=cfg.dim, num_relations=num_relations, num_entities=num_entities,
        regularizer=cfg.regularizer, emb_dim=emb_dim, vocab_size=vocab_size,
        encoder=encoder)


def load_word_embeddings(cfg: ExperimentConfig, mcfg: blp.ModelConfig):
    """Initial word table for bow/dkrl models (reference: models.py:119-137):
    BERT's word_embeddings for BE- variants (from local weights if available),
    a GloVe tensor for glove- variants; random otherwise."""
    if cfg.model.startswith("glove"):
        path = cfg.glove_file or osp.join(cfg.data_dir, "glove", "glove.6B.300d.pt")
        if osp.exists(path):
            import torch
            t = torch.load(path, weights_only=False)
            return np.asarray(t.numpy(), np.float32)
        log.warning(f"GloVe tensor {path} not found; using random init")
        return None
    if cfg.model.startswith("bert") and cfg.hf_weights and osp.exists(cfg.hf_weights):
        import torch
        sd = torch.load(cfg.hf_weights, map_location="cpu", weights_only=False)
        for key in ("embeddings.word_embeddings.weight",
                    "bert.embeddings.word_embeddings.weight"):
            if key in sd:
                return np.asarray(sd[key].numpy(), np.float32)
    return None


def init_model_params(cfg: ExperimentConfig, mcfg: blp.ModelConfig, key):
    hf_sd = None
    if cfg.model == "blp" and cfg.hf_weights and osp.exists(cfg.hf_weights):
        import torch
        hf_sd = torch.load(cfg.hf_weights, map_location="cpu", weights_only=False)
        log.info(f"Loaded HF BERT weights from {cfg.hf_weights}")
    word_emb = load_word_embeddings(cfg, mcfg)
    return blp.init_params(key, mcfg, word_embeddings=word_emb, hf_state_dict=hf_sd)


#: Backwards-compatible alias — the JSONL stream is now one observer among
#: several (blp_tpu/observers.py: TensorBoard via TENSORBOARD_DIR, Mongo via
#: DB_URI/DB_NAME — the reference's exact Sacred gating, train.py:28-32).
MetricsLog = observers.JsonlObserver


def _save_state(path: str, tree, metadata: dict) -> None:
    """Checkpoint write that is safe on a multi-process (pod) run: every
    process participates in materializing the (possibly sharded) state, but
    only process 0 writes the file — otherwise each host would race on the
    same path on shared storage."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        # Collective: replicates cross-process shards onto every host so the
        # host-local write below sees the full arrays. Must run on ALL
        # processes (it is an all-gather), hence outside the index gate.
        tree = multihost_utils.process_allgather(tree)
    if jax.process_index() == 0:
        ckpt.save_pytree(path, tree, metadata)


def _load_like(path: str, template, metadata_only: bool = False):
    """Load a checkpoint and re-place every leaf with the TEMPLATE's sharding
    (mesh runs: params/opt-state live sharded over the mesh; a plain
    jnp.asarray would put the loaded copy on one device while the batch stays
    sharded — the next step would then mix placements)."""
    tree, meta = ckpt.load_pytree(path, template=template)
    return jax.tree.map(_place_leaf, tree, template), meta


def _place_leaf(v, t):
    # Only commit to multi-device (mesh) shardings; a single-device
    # template leaf stays an uncommitted jnp array (committing it to one
    # device would conflict with mesh-committed peers in the same jit).
    if isinstance(t, jax.Array) and t.sharding.num_devices > 1:
        return jax.device_put(jnp.asarray(v), t.sharding)
    return jnp.asarray(v)


def link_prediction(cfg: ExperimentConfig) -> dict:
    from blp_tpu.parallel import multihost

    multihost.initialize(cfg.coordinator_address, cfg.num_processes,
                         cfg.process_id)
    run_id = cfg.run_id or time.strftime("%Y%m%d-%H%M%S")
    os.makedirs(cfg.out_dir, exist_ok=True)
    metrics_log = observers.ObserverSet.from_env(cfg.out_dir, run_id)
    # close() in a finally: a mid-run crash/preemption must still flush
    # buffered sinks (TensorBoard buffers ~2 min of events) — the metrics
    # nearest a failure are exactly the ones that matter.
    try:
        metrics_log.log_config(dataclasses.asdict(cfg))
        return _link_prediction(cfg, run_id, metrics_log)
    finally:
        metrics_log.close()


def _link_prediction(cfg: ExperimentConfig, run_id: str,
                     metrics_log: observers.ObserverSet) -> dict:
    log.info(f"Run {run_id}: {cfg}")

    # ---- data ------------------------------------------------------------
    is_text = cfg.model != "transductive"
    if is_text:
        tokenizer = make_tokenizer(cfg)
        train_data = TextGraphData.load(
            cfg.triples_file("train"), tokenizer=tokenizer, max_len=cfg.max_len,
            drop_stopwords=cfg.model in blp.DROP_STOPWORD_MODELS,
            write_maps=True, use_cached_text=cfg.use_cached_text)
    else:
        tokenizer = None
        train_data = GraphData.load(cfg.triples_file("train"), write_maps=True)

    valid_data = GraphData.load(cfg.triples_file("dev"))
    test_data = GraphData.load(cfg.triples_file("test"))

    # Filter graph + new-entity sets (reference: train.py:296-315).
    train_ent = train_data.entities
    if not cfg.large_dataset:
        all_triples = np.concatenate(
            [train_data.triples, valid_data.triples, test_data.triples])
        filter_index = FilterIndex(all_triples)
        train_val_ent = np.unique(np.concatenate([train_ent, valid_data.entities]))
        train_val_test_ent = np.unique(
            np.concatenate([train_val_ent, test_data.entities]))
        val_new = np.setdiff1d(train_val_ent, train_ent)
        test_new = np.setdiff1d(train_val_test_ent, train_val_ent)
    else:
        filter_index = None
        train_val_ent = valid_data.entities
        train_val_test_ent = test_data.entities
        val_new = test_new = None
    metrics_log.log(0, num_train_entities=int(len(train_ent)))

    # ---- model + optimizer ----------------------------------------------
    # Transductive tables are sized by the id space (len(ent_ids)), not the
    # split — entity ids index the table directly and may be sparse.
    mcfg = make_model_config(cfg, tokenizer, len(train_data.rel_ids),
                             len(train_data.ent_ids))
    k_init = jax.random.fold_in(jax.random.key(cfg.seed), 0xBEEF)
    params = init_model_params(cfg, mcfg, k_init)
    if cfg.checkpoint:
        params, meta = _load_like(cfg.checkpoint, template=params)
        log.info(f"Loaded checkpoint {cfg.checkpoint} ({meta})")

    steps_per_epoch = num_batches(train_data, cfg.batch_size)
    total_steps = max(steps_per_epoch * cfg.max_epochs, 1)
    optimizer = training.make_optimizer(cfg.lr, total_steps, cfg.use_scheduler,
                                        bf16_mu=cfg.adam_bf16_mu)

    # SPMD over a (data, model) or (data, pipe) mesh when more than one shard
    # is requested (replaces the reference's torch DataParallel,
    # train.py:329-330).
    mesh = None
    if cfg.num_pipe_shards > 1:
        if cfg.num_model_shards > 1:
            raise ValueError("num_pipe_shards and num_model_shards are "
                             "mutually exclusive meshes (data x pipe vs "
                             "data x model)")
        if cfg.model != "blp":
            raise ValueError("pipeline parallelism slices the BERT layer "
                             f"stack (model='blp'); got model={cfg.model!r}")
        from blp_tpu.parallel import pipeline as pipe_lib, train_parallel
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = pipe_lib.make_pipeline_mesh(cfg.num_data_shards,
                                           cfg.num_pipe_shards)
        log.info(f"Mesh: data={cfg.num_data_shards} pipe={cfg.num_pipe_shards}")
        specs = pipe_lib.pipeline_param_specs(params)
        shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                                 is_leaf=lambda x: isinstance(x, P))
        params, opt_state, _ = train_parallel.init_parallel_state(
            params, optimizer, mesh, shardings=shardings)
        train_step = pipe_lib.make_pipeline_train_step(
            mcfg, optimizer, mesh=mesh, batch_size=cfg.batch_size,
            num_negatives=cfg.num_negatives,
            num_microbatches=cfg.num_microbatches)
    elif cfg.num_data_shards * cfg.num_model_shards > 1:
        from blp_tpu.parallel import mesh as mesh_lib, train_parallel

        mesh = mesh_lib.make_mesh(cfg.num_data_shards, cfg.num_model_shards)
        log.info(f"Mesh: data={cfg.num_data_shards} model={cfg.num_model_shards}")
        tp = cfg.num_model_shards > 1 and cfg.model == "blp"
        if not tp:
            # DP-only meshes train in the same UNSTACKED per-layer layout as
            # the single-device path (+9% step, models/bert.py) — replicated
            # weights don't care about the stack, and each shard's dW lands
            # in its own buffer instead of a DUS into the stacked (12, ...)
            # gradient. TP stays stacked (canonical Megatron specs).
            params = training.unstack_params(params)
        params, opt_state, _ = train_parallel.init_parallel_state(
            params, optimizer, mesh, tensor_parallel=tp)
        train_step = train_parallel.make_parallel_train_step(
            mcfg, optimizer, batch_size=cfg.batch_size,
            num_negatives=cfg.num_negatives)
    else:
        # Single-device BLP training holds the BERT layers UNSTACKED (each
        # dW in its own buffer — +9% step throughput, models/bert.py); the
        # canonical stacked layout is restored at eval/best-checkpoint
        # boundaries. The opt state is built over the same view so Adam's
        # mu/nu mirror it.
        params = training.unstack_params(params)
        opt_state = optimizer.init(params)
        train_step = training.make_train_step(
            mcfg, optimizer, batch_size=cfg.batch_size,
            num_negatives=cfg.num_negatives)

    def run_eval(triples, entities, *, prefix, epoch, filtered=False,
                 new_entities=None, max_num_batches=None, return_embeddings=False):
        # Live layout straight through: the evaluator's encode path takes the
        # unstacked view itself (no-op if already unstacked) and every other
        # consumer (rel_emb, proj, ent_emb) is layout-independent — a
        # restack here would be a full on-device param copy per eval that
        # the encode immediately un-does.
        res = evaluation.eval_link_prediction(
            params, mcfg, triples, train_data, entities,
            batch_size=cfg.eval_batch_size, emb_batch_size=cfg.emb_batch_size,
            tile=cfg.tile, filter_index=filter_index if filtered else None,
            new_entities=new_entities,
            rel_categories=train_data.rel_categories if train_data.has_rel_categories else None,
            max_num_batches=max_num_batches,
            return_embeddings=return_embeddings, mesh=mesh, log=log)
        scalars = res.scalars(prefix)
        metrics_log.log(epoch, **scalars)
        log.info("  ".join(f"{k}: {v:.4f}" for k, v in scalars.items()))
        return res

    # ---- training loop ---------------------------------------------------
    # RNG streams derive deterministically from (seed, epoch, step) so a
    # resumed run replays the exact remaining schedule (the reference cannot
    # resume mid-run at all — SURVEY.md §5.4).
    best_mrr = 0.0
    start_epoch = 1
    ckpt_file = osp.join(cfg.out_dir, f"model-{run_id}.npz")
    best_ckpt = ckpt_file  # may be rebound to a prior run's file on resume
    state_file = osp.join(cfg.out_dir, f"train_state-{run_id}.npz")
    # resume="auto": pick up this run's own state file if present — a
    # preempted job relaunched with the same run_id continues where it left
    # off (set run_id= explicitly for this; the default run_id is a fresh
    # timestamp). Otherwise resume= names a state file directly.
    resume_path = state_file if cfg.resume == "auto" else cfg.resume
    if resume_path and osp.exists(resume_path):
        # _load_like re-places every leaf with the sharding the live state
        # already has — under a mesh the loaded params/opt_state come back
        # sharded exactly as init_parallel_state laid them out (a plain
        # asarray would strand them on one device against a sharded batch).
        # State files are written in the canonical STACKED layout (see the
        # per-epoch _save_state below) so any run can resume any file; when
        # the live training layout is unstacked (single-device BERT), load
        # through a stacked template and convert. Legacy marker-less files
        # were written in the live layout — load them directly.
        live_unstacked = isinstance(
            params.get("bert", {}).get("layers"), (tuple, list))
        file_stacked = False
        if live_unstacked:
            file_stacked = ckpt.peek_metadata(resume_path).get("layout") == "stacked"
            if not file_stacked:
                # Legacy marker-less file: decide by leaf count — pre-round-4
                # DP-mesh runs wrote STACKED states while single-device runs
                # wrote unstacked ones, so the marker alone can't tell.
                live_leaves = jax.tree.leaves((params, opt_state))
                if ckpt.peek_num_leaves(resume_path) != len(live_leaves):
                    file_stacked = True
                else:
                    # Counts can coincide (num_layers == 1 stacks to the same
                    # leaf count); compare leaf SHAPES — stacked layer leaves
                    # carry a leading (num_layers,) axis the unstacked live
                    # tree lacks. Header-only read (no data).
                    live_shapes = [tuple(l.shape) for l in live_leaves]
                    file_stacked = (
                        ckpt.peek_leaf_shapes(resume_path) != live_shapes)
        if file_stacked:
            stacked_p = training.restack_params(params)
            # eval_shape: the treedefs/shapes of the stacked state without
            # allocating a second 880MB mu/nu on device. Load raw through the
            # stacked treedef, convert to the live unstacked layout, THEN
            # place against the live state — under a DP mesh the live leaves
            # carry the init_parallel_state shardings the loaded copy must
            # re-acquire.
            tmpl = (stacked_p, jax.eval_shape(optimizer.init, stacked_p))
            raw, meta = ckpt.load_pytree(resume_path, template=tmpl)
            converted = (training.unstack_params(raw[0]),
                         training.unstack_opt_state(raw[1]))
            params, opt_state = jax.tree.map(_place_leaf, converted,
                                             (params, opt_state))
        else:
            (params, opt_state), meta = _load_like(
                resume_path, template=(params, opt_state))
        start_epoch = int(meta["epoch"]) + 1
        best_mrr = float(meta.get("best_mrr", 0.0))
        # The best checkpoint may live under the ORIGINAL run's id (resume
        # with a fresh run_id); without this the final filtered eval would
        # silently use last-epoch params instead of the best-valid-MRR ones.
        prior_best = meta.get("best_ckpt") or ""
        if prior_best and osp.exists(prior_best):
            best_ckpt = prior_best
        log.info(f"Resumed from {resume_path} at epoch {start_epoch}")

    base_key = jax.random.key(cfg.seed)
    global_step = (start_epoch - 1) * steps_per_epoch
    log_every = max(1, int(cfg.log_every_frac * steps_per_epoch))
    last_epoch = cfg.max_epochs if cfg.stop_after_epochs is None else \
        min(cfg.max_epochs, cfg.stop_after_epochs)
    use_multihost = jax.process_count() > 1 or cfg.multihost_data
    if use_multihost and mesh is None:
        raise ValueError(
            "multi-host runs need a mesh: set num_data_shards/num_model_shards "
            "to cover all devices (jax.device_count() across processes)")
    if use_multihost:
        # Pod-scale data path: every host derives the SAME global permutation
        # from the shared seed, materializes only its contiguous row block of
        # each global batch, and global_batch() assembles the spanning
        # jax.Array over the 'data' axis. Single-process this is exactly
        # equivalent to the plain path (tests/test_train_parallel_e2e.py).
        from blp_tpu.parallel import multihost

        batcher = multihost.LocalBatcher(
            train_data.num_triples, cfg.batch_size,
            jax.process_count(), jax.process_index())
        place_batch = lambda b: multihost.global_batch(b, mesh)  # noqa: E731

        def host_batches(epoch: int):
            # Same permutation as the plain path: Generator.permutation(n)
            # equals shuffle(arange(n)) at equal state, and LocalBatcher
            # drops the remainder exactly like epoch_batches(drop_last=True).
            for _, rows in batcher.epoch(cfg.seed * 1_000_003 + epoch):
                triples = train_data.triples[rows]
                if is_text:
                    yield text_train_batch(train_data, triples)
                else:
                    yield {"pos_pairs": triples[:, :2], "rels": triples[:, 2]}
    else:
        if mesh is not None:
            from blp_tpu.parallel import train_parallel
            place_batch = lambda b: train_parallel.shard_batch(b, mesh)  # noqa: E731
        else:
            place_batch = lambda b: {k: jnp.asarray(v) for k, v in b.items()}  # noqa: E731

        def host_batches(epoch: int):
            """One epoch of host-side batches; runs on the prefetch thread so
            the numpy description gathers overlap device compute."""
            shuffle_rng = np.random.default_rng(cfg.seed * 1_000_003 + epoch)
            for triples in epoch_batches(train_data, cfg.batch_size, rng=shuffle_rng):
                if is_text:
                    yield text_train_batch(train_data, triples)
                else:
                    yield {"pos_pairs": triples[:, :2], "rels": triples[:, 2]}

    for epoch in range(start_epoch, last_epoch + 1):
        step_losses, t0 = [], time.time()
        for step_i, batch in enumerate(prefetch.prefetch_to_device(
                host_batches(epoch), placement=place_batch)):
            params, opt_state, loss = train_step(
                params, opt_state, (base_key, global_step), batch)
            global_step += 1
            # Keep losses on device: a float(loss) here would force a
            # device->host sync EVERY step, serializing the dispatch pipeline
            # (measured ~90ms/step vs 62ms compute on a tunneled chip). Sync
            # only at log points; the epoch mean reads the stacked scalars
            # once at epoch end.
            step_losses.append(loss)
            if step_i % log_every == 0 and step_i >= log_every:
                # Log a one-interval-LAGGED loss instead of float(loss) on
                # the step just enqueued: a blocking read of the newest
                # value drains the whole dispatch queue — on the relayed
                # chip the 5%-interval syncs cost ~23% of the epoch (2,537
                # vs 3,279 t/s measured). The lagged value was dispatched a
                # full interval ago, so it is already materialized and the
                # read costs one round trip, not a pipeline drain. (The
                # reference's 5%-interval logging, train.py:354-357, doesn't
                # say WHICH step's loss — any in the window qualifies;
                # probing Array.is_ready() instead measured as slow as the
                # blocking read on this relay.) The value is recorded under
                # the global step it was COMPUTED at, and step 0 is skipped
                # (its loss was just enqueued — reading it would force the
                # very sync this avoids).
                loss_val = float(step_losses[step_i - log_every])
                log.info(f"Epoch {epoch}/{cfg.max_epochs} "
                         f"[{step_i}/{steps_per_epoch}]: {loss_val:.6f}")
                metrics_log.log(global_step - log_every, batch_loss=loss_val)
        epoch_loss = (float(np.mean(jax.device_get(jnp.stack(step_losses))))
                      if step_losses else 0.0)
        if step_losses and steps_per_epoch <= log_every:
            # Epochs too short for a lagged log point (e.g. 1 step) would
            # otherwise emit no batch_loss at all; the epoch-end sync above
            # already materialized every loss, so this read is free.
            metrics_log.log(global_step, batch_loss=float(step_losses[-1]))
        dt = time.time() - t0
        tput = steps_per_epoch * cfg.batch_size / max(dt, 1e-9)
        metrics_log.log(epoch, train_loss=epoch_loss,
                        triples_per_sec=tput)
        log.info(f"Epoch {epoch}: loss {epoch_loss:.6f} "
                 f"({tput:,.0f} triples/s)")

        if epoch % cfg.eval_every == 0:
            if not cfg.large_dataset:
                log.info("Evaluating on sample of training set")
                n_val_batches = -(-valid_data.num_triples // cfg.eval_batch_size)
                run_eval(train_data.triples, train_ent, prefix="train",
                         epoch=epoch, max_num_batches=n_val_batches)
            log.info("Evaluating on validation set")
            res = run_eval(valid_data.triples, train_val_ent, prefix="valid",
                           epoch=epoch)
            if res.mrr > best_mrr:
                best_mrr = res.mrr
                best_ckpt = ckpt_file
                # The model checkpoint is the user-facing artifact: always
                # the canonical stacked layout (serve/checkpoint= loads);
                # restacked on the host single-process (see the state save).
                best_tree = (training.restack_params(jax.device_get(params))
                             if jax.process_count() == 1
                             else training.restack_params(params))
                _save_state(ckpt_file, best_tree,
                            {"epoch": epoch, "mrr": res.mrr, "run_id": run_id})
                log.info(f"New best valid MRR {best_mrr:.4f}; saved {ckpt_file}")

        # Full training state for preemption-safe resume (resume=<file>).
        # Always the canonical stacked layout (layout marker in metadata):
        # a file written by an unstacked single-device run must resume under
        # a mesh run and vice versa — load_pytree unflattens by leaf order,
        # so a layout fork in the file would be an opaque unflatten error.
        # Single-process: pull to host FIRST and restack there (numpy), so
        # the canonicalization never allocates a transient ~1.3 GB stacked
        # params+mu+nu copy in HBM (multi-process keeps the device tree —
        # _save_state's allgather must see the live sharded arrays).
        if jax.process_count() == 1:
            host_p, host_o = jax.device_get((params, opt_state))
            state_tree = (training.restack_params(host_p),
                          training.restack_opt_state(host_o))
        else:
            state_tree = (training.restack_params(params),
                          training.restack_opt_state(opt_state))
        _save_state(state_file, state_tree,
                    {"epoch": epoch, "best_mrr": best_mrr,
                     "best_ckpt": best_ckpt if osp.exists(best_ckpt) else "",
                     "run_id": run_id, "seed": cfg.seed, "layout": "stacked"})

    # ---- final filtered evaluation from best checkpoint -------------------
    params = training.restack_params(params)
    if cfg.max_epochs > 0 and osp.exists(best_ckpt):
        params, _ = _load_like(best_ckpt, template=params)

    if cfg.large_dataset:
        filter_index = FilterIndex(valid_data.triples)
    log.info("Evaluating on validation set (with filtering)")
    run_eval(valid_data.triples, train_val_ent, prefix="valid",
             epoch=cfg.max_epochs + 1, filtered=True, new_entities=val_new)

    if cfg.large_dataset:
        filter_index = FilterIndex(test_data.triples)
    log.info("Evaluating on test set")
    test_res = run_eval(test_data.triples, train_val_test_ent, prefix="test",
                        epoch=cfg.max_epochs + 1, filtered=True,
                        new_entities=test_new, return_embeddings=True)

    emb_path = osp.join(cfg.out_dir, f"ent_emb-{run_id}.npz")
    np.savez(emb_path, ent_emb=test_res.ent_emb, entities=test_res.entities)
    log.info(f"Saved entity embeddings to {emb_path}")
    return {"run_id": run_id, "test_mrr": test_res.mrr,
            "test_mrr_filt": test_res.mrr_filt, "checkpoint": ckpt_file}


def node_classification(cfg: ExperimentConfig) -> dict:
    """Frozen-embedding entity classification (reference: train.py:408-481):
    LogisticRegression C-sweep on dev, refit on train+dev, report accuracy and
    balanced accuracy."""
    from sklearn.linear_model import LogisticRegression
    from sklearn.metrics import accuracy_score, balanced_accuracy_score

    # Accepts this framework's .npz export AND the reference's
    # ent_emb-{id}.pt/ents-{id}.pt torch pair (reference train.py:403-421).
    from blp_tpu.utils import load_embedding_export
    ent_emb, emb_ids = load_embedding_export(cfg.out_dir, cfg.checkpoint)
    log.info(f"Loaded {len(ent_emb)} embeddings dim={ent_emb.shape[1]}")

    from blp_tpu.data.datasets import load_maps
    from blp_tpu.utils import make_ent2idx
    ent_ids, _ = load_maps(cfg.dataset_dir)
    ent2idx = make_ent2idx(emb_ids, int(emb_ids.max()))

    class2label: dict[str, int] = {}
    splits = {}
    for split in ("train", "dev", "test"):
        idx, labels = [], []
        with open(osp.join(cfg.dataset_dir, f"{split}-ents-class.txt")) as f:
            for line in f:
                entity, ent_class = line.strip().split()
                pos = int(ent2idx[ent_ids[entity]])
                if pos < 0:
                    raise ValueError(f"No embedding for entity {entity}")
                idx.append(pos)
                labels.append(class2label.setdefault(ent_class, len(class2label)))
        splits[split] = (ent_emb[idx], np.asarray(labels))

    x_train, y_train = splits["train"]
    x_dev, y_dev = splits["dev"]
    x_test, y_test = splits["test"]

    best_acc, best_c = 0.0, 1.0
    for k in range(-4, 2):
        c = 10.0 ** -k
        clf = LogisticRegression(C=c, max_iter=1000)
        clf.fit(x_train, y_train)
        acc = accuracy_score(y_dev, clf.predict(x_dev))
        log.info(f"C={c:g} dev acc={acc:.3f}")
        if acc > best_acc:
            best_acc, best_c = acc, c

    log.info(f"Best C: {best_c:g}")
    clf = LogisticRegression(C=best_c, max_iter=1000)
    x_all = np.concatenate([x_train, x_dev])
    y_all = np.concatenate([y_train, y_dev])
    clf.fit(x_all, y_all)

    out = {"best_c": best_c}
    for name, fn in (("accuracy", accuracy_score),
                     ("balanced_accuracy", balanced_accuracy_score)):
        out[f"train_{name}"] = float(fn(y_all, clf.predict(x_all)))
        out[f"test_{name}"] = float(fn(y_test, clf.predict(x_test)))
        log.info(f"Train {name}: {out[f'train_{name}']:.3f}  "
                 f"Test {name}: {out[f'test_{name}']:.3f}")

    import joblib
    joblib.dump({"model": clf,
                 "id_to_class": {v: k for k, v in class2label.items()}},
                osp.join(cfg.out_dir, f"classifier-{cfg.checkpoint}.joblib"))
    return out


COMMANDS = {"link_prediction": link_prediction,
            "node_classification": node_classification}


def main(argv: list[str] | None = None):
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] not in COMMANDS:
        print(f"Usage: python -m blp_tpu.train {{{'|'.join(COMMANDS)}}} "
              f"[with key=value ...]", file=sys.stderr)
        return 2
    cfg = parse_overrides(argv[1:])
    result = COMMANDS[argv[0]](cfg)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
