"""Orchestration entry point (reference: src/train.py:18-110 ``main``).

Builds datasets -> loaders -> model -> solver from one YAML config and
dispatches on mode train / validation / test. Returns the Solver when
``return_solver`` so notebooks/tests can poke at it (the reference offers
the same knob, train.py:20).
"""

from __future__ import annotations

import faulthandler
import signal
from typing import Optional, Union

# Diagnosability for every entry path (CLI, tools, tests): `kill -USR1 <pid>`
# dumps all thread stacks. Registered here (not only in the repo-root
# main.py) because SIGUSR1's DEFAULT disposition terminates the process —
# probing an unregistered long run kills it instead of tracing it.
# chain=True so an embedding application's own SIGUSR1 handler (if any)
# still runs — importing a library must not eat the host app's signals.
if hasattr(signal, "SIGUSR1"):
    faulthandler.register(signal.SIGUSR1, all_threads=True, chain=True)

from speech_enhancement_tpu.config import Config, load_config, with_defaults
from speech_enhancement_tpu.data.loader import get_dataloader, get_train_wav_dataset
from speech_enhancement_tpu.models import build_model
from speech_enhancement_tpu.train.solver import Solver
from speech_enhancement_tpu.utils import seed_everything


def _enable_compile_cache() -> None:
    """Persistent XLA compile cache (unless the user configured their own).

    Remote-compiled TPU programs can take minutes; with the cache, reruns
    of the same config (and the eval program across epochs) are instant.
    """
    import jax

    try:
        if jax.config.jax_compilation_cache_dir is None:
            import os

            jax.config.update(
                "jax_compilation_cache_dir",
                os.path.expanduser("~/.cache/speech_enhancement_tpu/jax"),
            )
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization, never fatal
        pass


def main(
    config: Union[str, Config],
    mode: str = "train",
    return_solver: bool = False,
    save: bool = False,
    dev: bool = False,
    device: Optional[str] = None,
    run_dir: Optional[str] = None,
    mesh=None,
):
    if device:
        # pin the JAX platform (reference train.py's device={'gpu','cpu'}
        # knob, train.py:20); must run before any backend use
        import jax

        jax.config.update("jax_platforms", str(device))
    if isinstance(config, str):
        config = load_config(config)
    else:
        config = with_defaults(config)

    # multi-host launch (parallel.multihost: true): jax.distributed must
    # initialize before the first backend touch so every process sees the
    # global device set (semantics in config.py / parallel/mesh.py)
    from speech_enhancement_tpu.parallel.mesh import init_distributed

    init_distributed(config.parallel)
    _enable_compile_cache()

    seed = int(config.get("seed", 10))
    seed_everything(seed)

    train_set, val_set, test_set = get_train_wav_dataset(
        config.dset, config.model, seed=seed
    )
    if dev:
        # dev-set swap (reference: src/train.py:20,36 → get_dev_wav_clarity):
        # evaluate against the Clarity dev scenes instead of the test split
        from speech_enhancement_tpu.data.loader import get_dev_wav_clarity

        test_set = get_dev_wav_clarity(config.dset, seed=seed)
    train_loader = get_dataloader(train_set, config, train=True, seed=seed)
    val_loader = get_dataloader(val_set, config, train=True, seed=seed + 1,
                                validation=True)
    test_loader = get_dataloader(test_set, config, train=False)

    model, spec = build_model(config.model)

    if mesh is None and int(config.parallel.get("data", 1)) > 1:
        from speech_enhancement_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=int(config.parallel.data), model=int(config.parallel.model))

    solver = Solver(
        config, model, spec, train_loader, val_loader, test_loader,
        run_dir=run_dir, mesh=mesh,
    )

    if mode == "train":
        solver.train()
    elif mode == "validation":
        solver._run_one_epoch(0, train=False)
    elif mode == "test":
        solver.inference(save=save)
    elif mode is None:
        pass  # build-only: caller drives the solver (tools, notebooks)
    else:
        raise ValueError(f"unknown mode {mode!r}")

    if return_solver:
        return solver
    return None
