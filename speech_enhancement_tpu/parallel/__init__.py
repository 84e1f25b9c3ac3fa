"""SPMD parallelism over jax.sharding meshes."""

from speech_enhancement_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    shard_train_step,
)
