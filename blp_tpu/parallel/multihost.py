"""Multi-host training support: DCN initialization and edge partitioning.

The reference is strictly single-process (SURVEY.md §2.3). Scaling BLP to a
pod slice needs three things beyond the in-process mesh:

  1. process bring-up over DCN — `initialize()` wraps jax.distributed;
  2. per-host data: each host reads only its slice of the (Wikidata5M-sized)
     edge list — `partition_edges` gives a deterministic, balanced partition,
     and `LocalBatcher` yields the host's shard of every global batch in a
     globally-agreed order (same seed => same global permutation on every
     host, each host materializes only its rows);
  3. global arrays from local shards — `global_batch` assembles a
     jax.Array spanning the 'data' mesh axis from process-local rows
     (jax.make_array_from_process_local_data), so the jitted global-batch
     train step is identical to the single-host one.

The "boundary embedding exchange" of the north star falls out of the
global-batch semantics: in-batch negatives index the global (2B, d) entity
view, and for the slots owned by other hosts XLA inserts the all-to-all /
all-gather over ICI/DCN — overlapped with encoder compute by the XLA
scheduler, not hand-written.
"""

from __future__ import annotations

import jax
import numpy as np


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bring up jax.distributed (no-op when single-process / already up).

    Order matters: jax.distributed.initialize() must run before ANY call that
    initializes the XLA backend — including jax.process_count(). So the
    single-host early-out checks only the config value, and the
    already-initialized case is detected via jax.distributed's own client
    state rather than a backend query (ADVICE r03: querying process_count
    first made every coordinator_address= run crash at startup).
    """
    if coordinator_address is None:
        return  # single-host; never touches the backend
    if jax.distributed.is_initialized():
        return  # already brought up (e.g. by an outer launcher)
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def partition_edges(num_edges: int, num_hosts: int, host_id: int) -> np.ndarray:
    """Deterministic balanced contiguous partition of edge indices.

    Contiguous slices keep host-local file reads sequential; balance is
    within 1 edge. Returns the host's edge-index array.
    """
    if not 0 <= host_id < num_hosts:
        raise ValueError(f"host_id {host_id} out of range [0, {num_hosts})")
    counts = np.full(num_hosts, num_edges // num_hosts, np.int64)
    counts[: num_edges % num_hosts] += 1
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return np.arange(starts[host_id], starts[host_id] + counts[host_id])


class LocalBatcher:
    """Host-local view of globally-shuffled fixed-shape batches.

    Every host computes the SAME global permutation of edge indices from the
    shared seed, then materializes only the rows of each global batch that
    fall in its contiguous row block (global batch row layout = host-major,
    matching a 'data'-axis sharding with processes laid out contiguously).
    """

    def __init__(self, num_edges: int, global_batch_size: int,
                 num_hosts: int, host_id: int):
        if global_batch_size % num_hosts != 0:
            raise ValueError("global batch size must divide by host count")
        self.num_edges = num_edges
        self.global_batch_size = global_batch_size
        self.local_batch_size = global_batch_size // num_hosts
        self.num_hosts = num_hosts
        self.host_id = host_id

    def num_batches(self) -> int:
        return self.num_edges // self.global_batch_size

    def epoch(self, seed: int):
        """Yield (global_batch_index, local_edge_indices) per batch."""
        rng = np.random.default_rng(seed)
        order = rng.permutation(self.num_edges)
        lo = self.host_id * self.local_batch_size
        hi = lo + self.local_batch_size
        for b in range(self.num_batches()):
            rows = order[b * self.global_batch_size:(b + 1) * self.global_batch_size]
            yield b, rows[lo:hi]


def global_batch(local_arrays: dict, mesh) -> dict:
    """Assemble global jax.Arrays from per-process local batch rows, sharded
    over the 'data' mesh axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    return {k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
            for k, v in local_arrays.items()}
