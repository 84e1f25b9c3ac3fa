"""Device mesh + SPMD data-parallel training step.

The reference's only parallelism is single-process ``torch.nn.DataParallel``
(src/solver.py:144-145), which replicates the model every step and gathers
outputs on GPU 0. The TPU-native replacement is SPMD: the jitted train step
is ``shard_map``-ped over a 1-D ``data`` mesh axis; each device holds a full
replica of the parameters (replicated spec), consumes its batch shard, and
gradients/batch-stats are reduced with ``lax.pmean`` over ICI.

Multi-host story (tested only on a virtual single-host mesh in this image):
the compiled program is host-count agnostic — the same shard_map program
runs under multi-process JAX with XLA routing the pmean over ICI/DCN — and
the host data path shards file lists per process via
``data.loader.shard_for_process`` (jax.process_index), so each host feeds
only its slice of the global batch. What is NOT yet exercised anywhere:
a real multi-process launch (jax.distributed.initialize); Solver assumes
its ``batch_size`` is the per-host batch.

A ``model`` axis is reserved in :func:`make_mesh` for tensor-parallel
shardings of larger models (none of the reference's models need it — the
largest is Demucs at 510 MB — but the mesh plumbing accepts it).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh; data defaults to all devices / model."""
    devices = devices if devices is not None else jax.devices()
    if data is None:
        data = len(devices) // model
    n = data * model
    assert n <= len(devices), f"need {n} devices, have {len(devices)}"
    grid = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(grid, ("data", "model"))


def shard_batch(mesh: Mesh, batch):
    """Place host arrays sharded along the data axis (dim 0)."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def shard_train_step(step_fn, mesh: Mesh):
    """Wrap ``step_fn(state, rng, mixture, sources, axis_name=...)`` in SPMD.

    State/rng are replicated; mixture/sources are sharded on the batch dim.
    ``step_fn`` must pmean its gradients over ``axis_name`` (the Solver's
    step does), so the returned state stays replica-consistent.
    """
    sharded = shard_map(
        partial(step_fn, axis_name="data"),
        mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data")),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def shard_multi_step(multi_fn, mesh: Mesh):
    """SPMD wrap of the N-steps-per-dispatch scan (Solver._build_multi_step).

    Batches arrive stacked [N, B, ...]; the batch dim (1) is sharded over
    ``data``, the scan dim replicated, per-step losses/grad-norms [N]
    returned replicated (they are pmean'd inside the step).
    """
    sharded = shard_map(
        partial(multi_fn, axis_name="data"),
        mesh=mesh,
        in_specs=(P(), P(), P(None, "data"), P(None, "data")),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))
