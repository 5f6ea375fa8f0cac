"""Multi-host (DCN) batch scale-out.

The single-host mesh layer (:mod:`.mesh`) shards the batch axis over the
chips of one process. Across hosts, the same ``dp`` design rides the Data
Center Network instead of ICI — and stays collective-free on the compute
path, because trajectory states are independent (the only cross-host
traffic is whatever the *user's* reduction does with the results, e.g. a
loss ``psum``). This module supplies the three pieces a multi-host
deployment needs beyond :func:`.mesh.make_mesh`:

* :func:`initialize` — the ``jax.distributed`` runtime handshake;
* :func:`global_mesh` — a (dp, cp) mesh over the *global* device set
  (every process sees all devices after initialization);
* :func:`host_local_batch` — assemble a globally-sharded batch from each
  process's local shard **without any cross-host data movement**
  (``jax.make_array_from_process_local_data``): each host feeds the states
  it generated/loaded locally, and the named sharding stitches them into
  one logical array addressed per-device.

The reference has no distributed layer at all (its only transport is
``cudaMemcpyAsync`` over three streams,
``/root/reference/GRiDCodeGenerator.py:155-188``); this is the SURVEY §5.8
DCN obligation. Every sharded entry point in :mod:`.mesh` works unchanged
on a global mesh — ``shard_map`` addresses devices, not processes.

Single-process use (tests, the virtual CPU mesh) needs no
:func:`initialize`; ``host_local_batch`` then degenerates to a plain
``device_put`` of the full batch.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import make_mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None, **kwargs) -> None:
    """Join the multi-host runtime (`jax.distributed.initialize`).

    Call once per process before any other JAX API. On TPU pods the three
    arguments are auto-detected from the environment and may be omitted;
    on CPU/GPU clusters pass them explicitly. No-op if already
    initialized (makes per-entry-point calls safe)."""
    try:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id, **kwargs)
    except RuntimeError as e:          # double-init → idempotent no-op
        msg = str(e).lower()
        if "already" not in msg and "once" not in msg:
            raise


def global_mesh(dp: int | None = None, cp: int = 1) -> Mesh:
    """(dp, cp) mesh over the global device set. Lay ``dp`` out so
    same-host devices are contiguous (the default `jax.devices()` order):
    batch shards then split host-locally and DCN carries no compute-path
    traffic."""
    return make_mesh(dp, cp, devices=jax.devices())


def host_local_batch(mesh: Mesh, *arrays, axis: str = "dp"):
    """Assemble globally-``dp``-sharded state arrays from per-process data.

    ``arrays`` are the process-local shards, shape ``(B_local, ...)``;
    the result is one logical ``(B_global, ...)`` array per input,
    ``B_global = B_local × num_processes``, with each device holding only
    its local rows (no cross-host transfer happens here). In a
    single-process run this is just a sharded ``device_put`` of the full
    batch."""
    out = []
    for a in arrays:
        spec = P(axis, *([None] * (np.ndim(a) - 1)))
        sharding = NamedSharding(mesh, spec)
        if jax.process_count() == 1:
            # device_put accepts device-resident jax arrays directly — no
            # host round-trip for the single-process case
            out.append(jax.device_put(a, sharding))
        else:
            out.append(jax.make_array_from_process_local_data(
                sharding, np.asarray(a)))
    return out[0] if len(out) == 1 else tuple(out)
