"""Device mesh + SPMD data-parallel training step.

The reference's only parallelism is single-process ``torch.nn.DataParallel``
(src/solver.py:144-145), which replicates the model every step and gathers
outputs on GPU 0. The TPU-native replacement is SPMD: the jitted train step
is ``shard_map``-ped over a 1-D ``data`` mesh axis; each device holds a full
replica of the parameters (replicated spec), consumes its batch shard, and
gradients/batch-stats are reduced with ``lax.pmean`` over ICI.

Multi-host story: ``parallel.multihost: true`` makes ``main()`` call
:func:`init_distributed` (jax.distributed.initialize — auto-detected on
TPU pods, or explicit coordinator_address/num_processes/process_id from
the config) before any backend use. The compiled program is host-count
agnostic — the same shard_map program runs under multi-process JAX with
XLA routing the pmean over ICI/DCN. The host data path shards file lists
per process via ``data.loader.shard_for_process`` (jax.process_index), so
each host feeds only its slice of the global batch; ``shard_batch``
assembles per-process local batches into global arrays with
``jax.make_array_from_process_local_data``. ``solver.batch_size`` is the
PER-HOST batch (global = batch_size * process_count; config.py). Tested
in this single-host image: the launch wiring (mocked initialize,
test_parallel.py), 2-"host" disjoint loader shards assembling the exact
global batch end-to-end through a DP step on the virtual mesh, and the
shard_map program itself; a physical multi-process launch needs real
multi-host hardware by definition.

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


def init_distributed(parallel_config) -> bool:
    """Multi-host launch: ``jax.distributed.initialize`` from config.

    Called by ``main()`` before any backend use when
    ``parallel.multihost: true``. With no explicit settings the initialize
    call auto-detects the cluster (TPU-pod metadata / cloud environment);
    ``coordinator_address`` / ``num_processes`` / ``process_id`` override
    it for hand-rolled launches. Returns True when initialize was called.
    Safe to call twice (already-initialized errors are swallowed so a
    notebook re-run of main() does not die).
    """
    if not parallel_config.get("multihost"):
        return False
    kwargs = {}
    addr = str(parallel_config.get("coordinator_address", "") or "")
    if addr:
        kwargs["coordinator_address"] = addr
    nproc = int(parallel_config.get("num_processes", 0) or 0)
    if nproc > 0:
        kwargs["num_processes"] = nproc
    pid = int(parallel_config.get("process_id", -1))
    if pid >= 0:
        kwargs["process_id"] = pid
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as err:  # already initialized -> keep going
        if "already" not in str(err).lower():
            raise
    return True


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
    """Place host arrays sharded along the data axis (dim 0).

    Single-process: one device_put with the sharded layout. Multi-process:
    each host holds only its per-host batch (its loader shard), so the
    global array is assembled from process-local data — dim 0 of the
    global batch is batch_size * process_count.
    """
    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() > 1:
        def put(x):
            global_shape = (x.shape[0] * jax.process_count(),) + tuple(x.shape[1:])
            return jax.make_array_from_process_local_data(sharding, x, global_shape)

        return jax.tree_util.tree_map(put, batch)
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
