#!/usr/bin/env python
"""Pre-populate the persistent XLA compile cache for shipped configs.

First compiles on a fresh machine absorb the remote compile service wall —
measured up to 361 s for demucs' 510 MB-parameter train step through the
relay (docs/RESULTS.md §3b); every later run (and every epoch) hits the
cache in `.jax_cache/` instead. Run this once per machine/TPU generation
before production training:

    python tools/warm_cache.py                  # all shipped configs
    python tools/warm_cache.py demucs_clarity   # just one

For each config this traces + compiles the exact jitted programs the
Solver dispatches (scan-N train step, validation step) at the shipped
batch size, without running a data pipeline. ~25 min total on a fresh
relay-backed chip, seconds when already cached.
"""

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def warm(config_name: str) -> None:
    import jax

    from speech_enhancement_tpu.config import load_config
    from speech_enhancement_tpu.data.loader import encode_wire_int16
    from speech_enhancement_tpu.main import _enable_compile_cache
    from speech_enhancement_tpu.models import build_model
    from speech_enhancement_tpu.train.solver import Solver

    _enable_compile_cache()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(root, "configs", f"{config_name}.yaml"))
    import tempfile

    cfg.solver.root = tempfile.mkdtemp(prefix="warm_cache_")  # no repo junk
    model, spec = build_model(cfg.model)
    solver = Solver(cfg, model, spec, train_loader=None, val_loader=None)

    mixture, sources = solver._example_batch()
    if str(cfg.dset.get("wire", "f32")) == "int16":
        import numpy as np

        mixture = encode_wire_int16(np.asarray(mixture))
        sources = encode_wire_int16(np.asarray(sources))

    t0 = time.perf_counter()
    rng = jax.random.PRNGKey(0)
    steps = max(1, int(cfg.solver.get("steps_per_call", 1)))
    if steps > 1:
        import jax.numpy as jnp

        multi = solver._build_multi_step(steps)
        stack = lambda x: jax.tree.map(  # noqa: E731
            lambda a: jnp.stack([a] * steps), x)
        state, losses, _ = multi(solver.state, rng, stack(mixture),
                                 stack(sources))
        float(losses[-1])  # true sync through the relay
    else:
        state, loss, _ = solver._train_step(solver.state, rng, mixture,
                                            sources)
        float(loss)
    solver.state = state  # donated buffers: the old state is dead
    print(f"{config_name:24s} train step ({steps}/dispatch) compiled+run in "
          f"{time.perf_counter() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    names = sys.argv[1:]
    if not names:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        names = sorted(
            os.path.splitext(os.path.basename(p))[0]
            for p in glob.glob(os.path.join(root, "configs", "*.yaml"))
            if "ha_" not in os.path.basename(p)
        )
    for name in names:
        warm(name)
