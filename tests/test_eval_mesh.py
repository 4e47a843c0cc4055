"""Full evaluator under a device mesh == single-device evaluator, bit-exact."""

import jax
import numpy as np
import pytest

from blp_tpu import evaluation
from blp_tpu.data.datasets import GraphData, TextGraphData
from blp_tpu.data.filtering import FilterIndex
from blp_tpu.data.synth import write_synth_dataset
from blp_tpu.data.tokenizers import WordPieceTokenizer
from blp_tpu.models import blp
from blp_tpu.parallel import mesh as mesh_lib


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = write_synth_dataset(str(tmp_path_factory.mktemp("evalmesh")),
                            num_entities=48, num_relations=4,
                            num_triples=220, seed=9)
    tok = WordPieceTokenizer(f"{d}/vocab.txt")
    train = TextGraphData.load(f"{d}/ind-train.tsv", tokenizer=tok,
                               max_len=16, write_maps=True)
    dev = GraphData.load(f"{d}/ind-dev.tsv")
    test = GraphData.load(f"{d}/ind-test.tsv")
    return d, train, dev, test


@pytest.mark.parametrize("rel_model", ["transe", "simple"])
def test_mesh_eval_bit_identical(setup, rel_model):
    d, train, dev, test = setup
    cfg = blp.ModelConfig(model="glove-bow", rel_model=rel_model, dim=0,
                          num_relations=len(train.rel_ids), emb_dim=16,
                          vocab_size=40)
    params = blp.init_params(jax.random.key(2), cfg)
    entities = np.unique(np.concatenate([train.entities, dev.entities]))
    fidx = FilterIndex(np.concatenate([train.triples, dev.triples,
                                       test.triples]))

    kw = dict(batch_size=8, emb_batch_size=16, tile=8, filter_index=fidx,
              rel_categories=train.rel_categories)
    single = evaluation.eval_link_prediction(
        params, cfg, dev.triples, train, entities, **kw)
    meshed = evaluation.eval_link_prediction(
        params, cfg, dev.triples, train, entities,
        mesh=mesh_lib.make_mesh(4, 2), **kw)

    assert meshed.mrr == pytest.approx(single.mrr, abs=0)
    assert meshed.mrr_filt == pytest.approx(single.mrr_filt, abs=0)
    assert meshed.hits == single.hits
    assert meshed.hits_filt == single.hits_filt


def test_mesh_phase1_table_identical(setup):
    """The mesh-sharded phase-1 table build (each device encodes its slice of
    every chunk) must produce the same table as the single-device build."""
    import jax.numpy as jnp

    from blp_tpu.parallel import eval_parallel

    d, train, dev, test = setup
    cfg = blp.ModelConfig(model="glove-bow", rel_model="transe", dim=0,
                          num_relations=len(train.rel_ids), emb_dim=16,
                          vocab_size=40)
    params = blp.init_params(jax.random.key(2), cfg)
    entities = np.unique(np.concatenate([train.entities, dev.entities]))
    mesh = mesh_lib.make_mesh(4, 2)

    single = evaluation.build_entity_table(
        lambda tok, mask: blp.encode_jit(params, cfg, tok, mask),
        train, entities, emb_batch_size=16, dim=cfg.entity_dim, pad_to=32)

    params_r = eval_parallel.replicate(params, mesh)
    enc = eval_parallel.make_sharded_encode(mesh, cfg)
    meshed = evaluation.build_entity_table(
        lambda tok, mask: enc(params_r, tok, mask),
        train, entities, emb_batch_size=16, dim=cfg.entity_dim, pad_to=32,
        chunk_multiple=4 * mesh.devices.size)

    assert single.shape == meshed.shape
    np.testing.assert_allclose(np.asarray(single), np.asarray(meshed),
                               rtol=0, atol=0)


def test_mesh_eval_blp_end_to_end(setup):
    """Full mesh eval (sharded phase 1 + sharded phase 2) with the BERT
    encoder (exercises seq packing under the batch sharding) matches the
    single-device evaluator."""
    from blp_tpu.models import bert

    d, train, dev, test = setup
    cfg = blp.ModelConfig(model="blp", rel_model="transe", dim=8,
                          num_relations=len(train.rel_ids),
                          encoder=bert.BertConfig.tiny(vocab_size=len(
                              open(f"{d}/vocab.txt").read().splitlines())))
    params = blp.init_params(jax.random.key(3), cfg)
    entities = np.unique(np.concatenate([train.entities, dev.entities]))
    fidx = FilterIndex(np.concatenate([train.triples, dev.triples,
                                       test.triples]))
    kw = dict(batch_size=8, emb_batch_size=32, tile=8, filter_index=fidx)
    single = evaluation.eval_link_prediction(
        params, cfg, dev.triples, train, entities, **kw)
    meshed = evaluation.eval_link_prediction(
        params, cfg, dev.triples, train, entities,
        mesh=mesh_lib.make_mesh(4, 2), **kw)
    assert meshed.mrr == pytest.approx(single.mrr, rel=1e-6)
    assert meshed.mrr_filt == pytest.approx(single.mrr_filt, rel=1e-6)


def test_mesh_pallas_transe_bit_identical(setup):
    """Mesh phase 2 through the Pallas kernel (candidate-sharded kernel
    calls + globally-computed order-matched pivot) must equal the
    single-device Pallas evaluator bit-for-bit."""
    d, train, dev, test = setup
    cfg = blp.ModelConfig(model="glove-bow", rel_model="transe", dim=0,
                          num_relations=len(train.rel_ids), emb_dim=16,
                          vocab_size=40)
    params = blp.init_params(jax.random.key(2), cfg)
    entities = np.unique(np.concatenate([train.entities, dev.entities]))
    fidx = FilterIndex(np.concatenate([train.triples, dev.triples,
                                       test.triples]))

    # tile=128: the kernel tile is 128-divisible, so the pallas default
    # engages on BOTH the mesh and single-device paths.
    kw = dict(batch_size=8, emb_batch_size=32, tile=128, filter_index=fidx)
    single = evaluation.eval_link_prediction(
        params, cfg, dev.triples, train, entities, **kw)
    meshed = evaluation.eval_link_prediction(
        params, cfg, dev.triples, train, entities,
        mesh=mesh_lib.make_mesh(4, 2), **kw)
    assert meshed.mrr == pytest.approx(single.mrr, abs=0)
    assert meshed.mrr_filt == pytest.approx(single.mrr_filt, abs=0)
    assert meshed.hits == single.hits
    assert meshed.hits_filt == single.hits_filt
