"""Multi-host support (simulated single-process): partition balance and
disjointness, agreed global shuffle, and global-array assembly."""

import jax
import numpy as np
import pytest

from blp_tpu.parallel import mesh as mesh_lib
from blp_tpu.parallel.multihost import (LocalBatcher, global_batch,
                                        partition_edges)


def test_partition_edges_cover_disjoint():
    n, hosts = 1003, 4
    parts = [partition_edges(n, hosts, h) for h in range(hosts)]
    allidx = np.concatenate(parts)
    assert len(allidx) == n
    assert len(np.unique(allidx)) == n
    sizes = [len(p) for p in parts]
    assert max(sizes) - min(sizes) <= 1
    with pytest.raises(ValueError):
        partition_edges(n, hosts, hosts)


def test_local_batcher_reassembles_global_batches():
    n, gbs, hosts = 200, 16, 4
    per_host = [LocalBatcher(n, gbs, hosts, h) for h in range(hosts)]
    epochs = [list(b.epoch(seed=7)) for b in per_host]
    # Reassembling each batch host-major equals the single-host batcher.
    single = LocalBatcher(n, gbs, 1, 0)
    for bi, (_, full_rows) in enumerate(single.epoch(seed=7)):
        parts = [epochs[h][bi][1] for h in range(hosts)]
        np.testing.assert_array_equal(np.concatenate(parts), full_rows)
    # Local shards are disjoint within a batch.
    for bi in range(single.num_batches()):
        rows = np.concatenate([epochs[h][bi][1] for h in range(hosts)])
        assert len(np.unique(rows)) == gbs


def test_global_batch_assembly_single_process():
    mesh = mesh_lib.make_mesh(8, 1)
    local = {"x": np.arange(32, dtype=np.int32).reshape(16, 2)}
    arrs = global_batch(local, mesh)
    assert arrs["x"].shape == (16, 2)
    np.testing.assert_array_equal(np.asarray(arrs["x"]), local["x"])
    # sharded over 'data'
    assert len(arrs["x"].sharding.device_set) == 8


def test_initialize_guards(monkeypatch):
    """initialize(): single-host early-out never touches the backend; an
    already-initialized client short-circuits via is_initialized() (the only
    state probe jax 0.9 exposes — jax.distributed has no global_state
    attribute, the round-4 advisor-fix regression)."""
    from blp_tpu.parallel import multihost

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    # single-host: no-op regardless of the client state
    multihost.initialize(None)
    assert calls == []
    # already up: short-circuit
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: True)
    multihost.initialize("host:1234", 2, 0)
    assert calls == []
    # not up: passes the config through
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False)
    multihost.initialize("host:1234", 2, 0)
    assert calls == [dict(coordinator_address="host:1234",
                          num_processes=2, process_id=0)]
