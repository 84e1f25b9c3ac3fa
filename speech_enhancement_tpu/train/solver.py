"""Training engine (reference: src/solver.py:109-746 ``Solver``).

Functionally restructured for TPU: one donated, jitted ``train_step`` pure
function over a ``TrainState`` pytree replaces the reference's stateful god
class + DataParallel (solver.py:132-145). Data parallelism is SPMD: when
``config.parallel.data > 1`` the step is wrapped in ``shard_map`` over a
1-D device mesh with ``psum`` gradient/batch-stat reduction over ICI (see
speech_enhancement_tpu/parallel/mesh.py).

Reproduced behaviors: early stopping with patience (solver.py:355-384),
gradient clipping (487-490), grad-norm telemetry (494-498), per-epoch
validation interval, checkpoint artifacts + resume/preload (233-341),
enhanced-vs-mixture dual metric scoring at test (595-604), TensorBoard
scalars when available (504-519).
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from speech_enhancement_tpu.config import save_json, save_yaml
from speech_enhancement_tpu.data.loader import EvalLoader
from speech_enhancement_tpu.models.types import SignalSpec
from speech_enhancement_tpu.ops.stft import stft_custom
from speech_enhancement_tpu.train import checkpoints as ckpt
from speech_enhancement_tpu.train import losses as losses_lib
from speech_enhancement_tpu.train import metrics as metrics_lib
from speech_enhancement_tpu.train.evaluate import (_BUCKET as _EVAL_BUCKET,
                                                   _num_windows,
                                                   evaluate_utterance)

METRIC_HIGHER_BETTER = {"loss": False, "sisdr": True, "stoi": True, "pesq": True}


def get_optimizer(optim_config) -> optax.GradientTransformation:
    """Optimizer factory (reference: src/distrib.py:244-261) + global-norm clip."""
    name = str(optim_config.optim)
    if name == "adam":
        opt = optax.adam(
            float(optim_config.lr), b1=float(optim_config.beta1), b2=float(optim_config.beta2)
        )
    elif name == "adamw":
        opt = optax.adamw(
            float(optim_config.lr), b1=float(optim_config.beta1), b2=float(optim_config.beta2)
        )
    elif name == "sgd":
        opt = optax.sgd(float(optim_config.lr), momentum=float(optim_config.get("momentum", 0.9)))
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    clip = float(optim_config.get("clip_grad", 0) or 0)
    if clip > 0:
        opt = optax.chain(optax.clip_by_global_norm(clip), opt)
    return opt


class Solver:
    """Train/validate/test driver for one model + dataset configuration."""

    def __init__(
        self,
        config,
        model,
        spec: SignalSpec,
        train_loader,
        val_loader,
        test_loader: Optional[EvalLoader] = None,
        run_dir: Optional[str] = None,
        mesh=None,
    ):
        self.config = config
        self.model = model
        self.spec = spec
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.test_loader = test_loader
        self.mesh = mesh
        if mesh is not None:
            n_data = int(mesh.shape.get("data", 1))
            batch = int(config.solver.batch_size)
            if batch % max(n_data, 1) != 0:
                raise ValueError(
                    f"solver.batch_size={batch} is not divisible by the data-"
                    f"parallel mesh axis (data={n_data}); each device must "
                    f"receive an equal batch shard. Use a batch size that is "
                    f"a multiple of {n_data}."
                )

        # Clarity hearing-aid scoring (reference solver.py:124-130: config.ha
        # points at the OmegaConf HA YAML whose listeners.json provides the
        # audiogram list). Built lazily-but-eagerly here so a bad path fails
        # at init, like the reference's OmegaConf.load would.
        self.clarity_scorer = None
        ha_path = str(config.get("ha", "") or "")
        if ha_path:
            from speech_enhancement_tpu.ha.scoring import ClarityScorer

            self.clarity_scorer = ClarityScorer(
                ha_path, input_sr=int(config.dset.sample_rate)
            )

        self.loss_name = str(config.optim.loss)
        self.loss_fn = losses_lib.get_loss_function(self.loss_name)
        self.use_pit = bool(config.optim.get("pit", False)) and spec.multi_speaker
        self.pit_discard_compat = bool(config.optim.get("pit_discard_compat", False))
        self.optimizer = get_optimizer(config.optim)

        root = str(config.solver.get("root", "."))
        stamp = time.strftime("%Y%m%d-%H%M%S")
        self.run_dir = run_dir or os.path.join(root, "result", str(config.model.name), stamp)
        self.checkpoint_dir = os.path.join(self.run_dir, "checkpoints")
        self.log_dir = os.path.join(self.run_dir, "logs")
        # multi-host write discipline: process 0 owns every artifact
        # (checkpoints, TB logs, config.yaml, results.csv); other hosts
        # compute the same replicated state and write nothing, resuming
        # from the shared filesystem path like every host does
        self.is_primary = jax.process_index() == 0
        if self.is_primary:
            os.makedirs(self.checkpoint_dir, exist_ok=True)
            os.makedirs(self.log_dir, exist_ok=True)
            save_yaml(config, os.path.join(self.run_dir, "config.yaml"))

        self.writer = self._make_writer() if self.is_primary else None
        self.scores: Dict[str, Any] = {"train_loss": [], "val_loss": [],
                                       "best_score": None, "epoch_wall_s": []}
        self.start_epoch = 0
        self.early_stop_count = 0

        self._rng = jax.random.PRNGKey(int(config.get("seed", 10)))
        self.state = self._init_state()
        # host-side mirror of state["step"] so per-step TB bookkeeping never
        # forces a device sync (deferred-sync epoch loop, _run_one_epoch)
        self._global_step = 0
        self._train_step = self._build_train_step()
        self.steps_per_call = max(1, int(config.solver.get("steps_per_call", 1)))
        # lazily-built n-step scan programs, keyed by chunk length. The
        # final partial chunk of an epoch dispatches as a few power-of-2
        # scans (e.g. 14 -> 8+4+2) instead of n slow single-step round
        # trips; restricting lengths to powers of two <= steps_per_call
        # bounds the number of compiled programs even when epoch lengths
        # drift between runs/datasets.
        self._multi_cache: Dict[int, Any] = {}
        self._val_step = self._build_val_step()

        resume = str(config.solver.get("resume", "") or "")
        preload = str(config.solver.get("preloaded_model", "") or "")
        if resume:
            self._resume_checkpoint(resume)
        elif preload:
            self._preload_model(preload)

    # ------------------------------------------------------------------ setup
    def _make_writer(self):
        try:
            from torch.utils.tensorboard import SummaryWriter

            return SummaryWriter(self.log_dir, max_queue=5, flush_secs=30)
        except Exception:
            return None

    def _example_batch(self):
        cfg = self.config
        seg = int(cfg.dset.sample_rate * cfg.dset.segment)
        batch = int(cfg.solver.batch_size)
        channels = int(cfg.dset.audio_channels)
        n_spk = max(1, int(cfg.model.get("num_spk", 1)))
        mixture = jnp.zeros((batch, channels, seg), jnp.float32)
        sources = jnp.zeros((batch, n_spk, channels, seg), jnp.float32)
        return mixture, sources

    @staticmethod
    def _decode_wire(x):
        """int16 wire batches ({"q", "scale"}, data/loader.py
        encode_wire_int16) -> f32 inside the jitted step; f32 passes
        through. One fused multiply — upload bytes quarter, math in f32."""
        if isinstance(x, dict):
            return x["q"].astype(jnp.float32) * x["scale"]
        return x

    def _adapt(self, mixture: jnp.ndarray, sources: jnp.ndarray):
        """Shape adaptation per SignalSpec (reference solver.py:440-458)."""
        if self.spec.monarch:
            target = sources[:, 0]  # squeeze speaker axis
        else:
            target = sources
        if self.spec.domain == "stft":
            mixture = stft_custom(mixture, self.config.model)
            target = stft_custom(target, self.config.model)
        return mixture, target

    def _init_state(self) -> Dict[str, Any]:
        mixture, sources = self._example_batch()
        inputs, _ = self._adapt(mixture, sources)
        self._rng, init_rng = jax.random.split(self._rng)

        # One jitted executable for the ENTIRE state construction
        # (model.init + post-init transform + optimizer.init). Unjitted,
        # flax init dispatches every layer op eagerly — ~100-200 separate
        # device programs whose async relay backlog measured minutes on the
        # remote-TPU transport (NOTES_DEV.md round 4, the --mode test
        # "wedge"); as one program it is a single dispatch.
        def make_state(rng, inputs):
            variables = self.model.init({"params": rng, "dropout": rng}, inputs)
            params = variables.get("params", {})
            if hasattr(self.model, "post_init_params"):
                # model-specific init transform (e.g. Demucs weight rescale)
                params = self.model.post_init_params(params)
            return {
                "params": params,
                "batch_stats": variables.get("batch_stats", {}),
                "opt_state": self.optimizer.init(params),
                "step": jnp.zeros((), jnp.int32),
            }

        return jax.jit(make_state)(init_rng, inputs)

    def _forward_train(self, params, batch_stats, rng, inputs):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out = self.model.apply(
            variables, inputs, train=True, mutable=["batch_stats"], rngs={"dropout": rng}
        )
        output, mutated = out
        return output, mutated.get("batch_stats", batch_stats)

    def _compute_loss(self, output, target, inputs):
        if self.use_pit and target.ndim >= 2 and target.shape[1] >= 2:
            # psa losses need the mixture; bind it so PIT's 2-arg pairwise
            # calls work (the reference threads mixture through its PIT
            # routine the same way, src/loss.py:58-72)
            if self.loss_name.startswith("psa"):
                pair_fn = lambda e, t: self.loss_fn(e, t, inputs)  # noqa: E731
            else:
                pair_fn = self.loss_fn
            pit_value, _ = losses_lib.pit_loss(output, target, pair_fn)
            if not self.pit_discard_compat:
                return pit_value
            # reference computes PIT then overwrites it (solver.py:469-480)
        if self.loss_name.startswith("psa"):
            return self.loss_fn(output, target, inputs)
        return self.loss_fn(output, target)

    def _build_train_step(self):
        def step_fn(state, rng, mixture, sources, axis_name=None):
            if axis_name is not None:
                rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
            mixture = self._decode_wire(mixture)
            sources = self._decode_wire(sources)
            inputs, target = self._adapt(mixture, sources)

            def loss_of(params):
                output, new_stats = self._forward_train(
                    params, state["batch_stats"], rng, inputs
                )
                loss = self._compute_loss(output, target, inputs)
                return loss, new_stats

            (loss, new_stats), grads = jax.value_and_grad(loss_of, has_aux=True)(
                state["params"]
            )
            if axis_name is not None:
                # SPMD data parallelism: all-reduce over ICI (replaces
                # DataParallel's gather, reference solver.py:144-145)
                grads = jax.lax.pmean(grads, axis_name)
                loss = jax.lax.pmean(loss, axis_name)
                new_stats = jax.lax.pmean(new_stats, axis_name)
            grad_norm = optax.global_norm(grads)
            updates, new_opt = self.optimizer.update(grads, state["opt_state"], state["params"])
            new_params = optax.apply_updates(state["params"], updates)
            new_state = {
                "params": new_params,
                "batch_stats": new_stats,
                "opt_state": new_opt,
                "step": state["step"] + 1,
            }
            return new_state, loss, grad_norm

        self._step_fn = step_fn  # core, reused by the multi-step driver
        if self.mesh is not None:
            from speech_enhancement_tpu.parallel.mesh import shard_train_step

            return shard_train_step(step_fn, self.mesh)
        return jax.jit(step_fn, donate_argnums=(0,))

    def _build_multi_step(self, n_steps: int):
        """N optimizer steps per device dispatch via ``lax.scan``.

        Host<->device round-trips cost tens of ms on remote/relayed TPU
        runtimes; scanning N steps inside ONE jitted call amortizes that
        overhead to ~1/N per step. Identical math to N single steps — the
        scan carries (state, rng) and splits a fresh step RNG per iteration.
        Enabled by ``solver.steps_per_call`` (> 1).
        """
        step_fn = self._step_fn

        def multi_fn(state, rng, mixtures, sources, axis_name=None):
            def body(carry, batch):
                st, key = carry
                key, sub = jax.random.split(key)
                st, loss, grad_norm = step_fn(
                    st, sub, batch[0], batch[1], axis_name=axis_name
                )
                return (st, key), (loss, grad_norm)

            (state, _), (losses, grad_norms) = jax.lax.scan(
                body, (state, rng), (mixtures, sources), length=n_steps
            )
            return state, losses, grad_norms

        if self.mesh is not None:
            from speech_enhancement_tpu.parallel.mesh import shard_multi_step

            return shard_multi_step(multi_fn, self.mesh)
        return jax.jit(multi_fn, donate_argnums=(0,))

    def _build_val_step(self):
        def val_fn(state, mixture, sources, mask):
            mixture = self._decode_wire(mixture)
            sources = self._decode_wire(sources)
            inputs, target = self._adapt(mixture, sources)
            variables = {"params": state["params"]}
            if state["batch_stats"]:
                variables["batch_stats"] = state["batch_stats"]
            output = self.model.apply(variables, inputs, train=False)
            # Per-example losses (vmap re-adds a singleton batch dim so the
            # scalar loss machinery — incl. PIT/psa — applies unchanged),
            # weighted by the validity mask: the final short batch of a
            # validation epoch is zero-padded by the loader, and padded rows
            # must not dilute the epoch val loss (the reference counts every
            # utterance exactly once because its batches are variable-size,
            # src/distrib.py:38-98).
            per_example = jax.vmap(
                lambda o, t, i: self._compute_loss(o[None], t[None], i[None])
            )(output, target, inputs)
            return jnp.sum(per_example * mask), jnp.sum(mask)

        return jax.jit(val_fn)

    # ----------------------------------------------------------------- epochs
    def _run_one_epoch(self, epoch: int, train: bool = True) -> float:
        loader = self.train_loader if train else self.val_loader
        cfg = self.config.solver
        limit = None
        # step caps apply only when all_steps is false, train AND validation
        # alike (reference src/solver.py:409-417; with the default
        # all_steps: true the full validation set scores every epoch)
        if not bool(cfg.get("all_steps", True)):
            if train:
                limit = int(cfg.get("total_steps", 0)) or None
            else:
                limit = int(cfg.validation.get("total_steps", 0)) or None

        total, count = 0.0, 0.0
        chunk: list = []  # staged batches for the multi-step dispatcher
        # Deferred synchronization: every dispatch returns DEVICE scalars
        # that are only fetched in ONE batched jax.device_get at epoch end.
        # Blocking on the loss after each dispatch (the obvious loop) costs
        # a full relay round trip per step AND serializes the next chunk's
        # host->device uploads behind the previous dispatch's compute; with
        # the fetch deferred, uploads overlap compute and the epoch pays one
        # round trip total (measured: 13.0 s -> see NOTES_DEV round-2 log).
        # Draining every DRAIN_EVERY dispatches (not only at epoch end)
        # bounds how long a NaN can poison training on long epochs to
        # ~DRAIN_EVERY * steps_per_call steps while still amortizing the
        # round trip to a negligible fraction.
        DRAIN_EVERY = 64
        pending: list = []  # (losses_dev [n], grad_norms_dev [n], first_gstep)

        def run_train_batch(mixture, sources):
            self._rng, rng = jax.random.split(self._rng)
            self.state, loss, grad_norm = self._train_step(
                self.state, rng, mixture, sources
            )
            self._global_step += 1
            # raw 0-d device scalars — no device-side reshape (each [None]
            # would be its own tiny relay dispatch); drain_pending atleast_1d's
            pending.append((loss, grad_norm, self._global_step))

        def run_train_chunk():
            """Dispatch the staged chunk: one device call, N optimizer steps."""
            nonlocal chunk
            batches, chunk = chunk, []
            if not batches:
                return
            while batches:
                n = 1
                while n * 2 <= min(len(batches), self.steps_per_call):
                    n *= 2
                part, batches = batches[:n], batches[n:]
                if n == 1:
                    run_train_batch(*part[0])
                    continue
                multi = self._multi_cache.get(n)
                if multi is None:
                    multi = self._build_multi_step(n)
                    self._multi_cache[n] = multi
                mixtures = jax.tree.map(lambda *xs: jnp.stack(xs),
                                        *[b[0] for b in part])
                sources = jax.tree.map(lambda *xs: jnp.stack(xs),
                                       *[b[1] for b in part])
                self._rng, rng = jax.random.split(self._rng)
                self.state, losses, grad_norms = multi(
                    self.state, rng, mixtures, sources
                )
                self._global_step += n
                pending.append((losses, grad_norms, self._global_step - n + 1))

        def drain_pending():
            """One batched device fetch for every staged dispatch result."""
            nonlocal total, count
            if not pending:
                return
            fetched = jax.device_get([(p[0], p[1]) for p in pending])
            for (losses, grad_norms), (_, _, first) in zip(fetched, pending):
                losses = np.atleast_1d(losses)
                grad_norms = np.atleast_1d(grad_norms)
                for offset, (loss_value, gn) in enumerate(zip(losses, grad_norms)):
                    loss_value = float(loss_value)
                    if not np.isfinite(loss_value):
                        # failure detection: the reference only scaffolds
                        # detect_anomaly (solver.py:460); a non-finite loss
                        # aborts with a clear message (at the epoch-end sync
                        # point — per-step checks would cost a round trip
                        # per step).
                        raise FloatingPointError(
                            f"non-finite loss {loss_value} at epoch {epoch} "
                            f"global step {first + offset}"
                        )
                    if self.writer:
                        gstep = first + offset
                        self.writer.add_scalar("train/step_loss", loss_value, gstep)
                        self.writer.add_scalar("train/grad_norm", float(gn), gstep)
                    total += loss_value
                    count += 1
            pending.clear()

        val_pending: list = []
        for step, batch in enumerate(loader):
            if limit is not None and step >= limit:
                break
            # batches are f32 arrays or int16 wire pytrees ({"q","scale"})
            mixture = jax.tree.map(jnp.asarray, batch["mixture"])
            sources = jax.tree.map(jnp.asarray, batch["sources"])
            if train:
                if self.steps_per_call > 1:
                    chunk.append((mixture, sources))
                    if len(chunk) == self.steps_per_call:
                        run_train_chunk()
                else:
                    run_train_batch(mixture, sources)
                if len(pending) >= DRAIN_EVERY:
                    drain_pending()
            else:
                n_items = (mixture["q"] if isinstance(mixture, dict)
                           else mixture).shape[0]
                mask = jnp.asarray(
                    batch.get("mask", np.ones(n_items, np.float32))
                )
                val_pending.append(
                    self._val_step(self.state, mixture, sources, mask)
                )
        if train and chunk:
            run_train_chunk()
        if train:
            drain_pending()
        else:
            for loss_sum, n_valid in jax.device_get(val_pending):
                total += float(loss_sum)
                count += float(n_valid)
        return total / max(count, 1)

    def train(self) -> Dict[str, Any]:
        cfg = self.config.solver
        epochs = int(cfg.epochs)
        patience = int(cfg.get("patience", 40))
        val_interval = int(cfg.validation.get("interval", 1))
        save_interval = int(cfg.get("save_checkpoint_interval", 1))
        metric_name = str(cfg.validation.get("metric", "loss"))

        profile = bool(cfg.get("profile", False))
        for epoch in range(self.start_epoch, epochs):
            t0 = time.time()
            if profile and epoch == self.start_epoch:
                self.start_profiler()
            train_loss = self._run_one_epoch(epoch, train=True)
            if profile and epoch == self.start_epoch:
                self.stop_profiler()
            self.scores["train_loss"].append(train_loss)
            if self.writer:
                self.writer.add_scalar("train/epoch_loss", train_loss, epoch)

            val_loss = None
            if (epoch + 1) % val_interval == 0:
                val_loss = self._run_one_epoch(epoch, train=False)
                self.scores["val_loss"].append(val_loss)
                if self.writer:
                    self.writer.add_scalar("val/epoch_loss", val_loss, epoch)

            # best-checkpoint / early-stop bookkeeping runs only on epochs
            # where a validation pass happened — the reference gates is_best
            # and the patience counter the same way (src/solver.py:370-377);
            # comparing train loss against a best score made of val losses
            # would skew both.
            score = val_loss if val_loss is not None else train_loss
            is_best = False
            if val_loss is not None:
                is_best = self._is_best(metric_name, val_loss)
                if is_best:
                    self.early_stop_count = 0
                else:
                    self.early_stop_count += 1
            if self.is_primary and ((epoch + 1) % save_interval == 0
                                    or is_best):
                ckpt.save_checkpoint(
                    self.checkpoint_dir,
                    {k: self.state[k]
                     for k in ("params", "batch_stats", "opt_state", "step")},
                    epoch,
                    metric_name,
                    float(score),
                    self.scores,
                    is_best,
                )
            best = self.scores.get("best_score")
            # epoch-0 wall includes the one-time train/val-step compiles;
            # tools (headtohead_quality) split it out of steady-state cost
            self.scores.setdefault("epoch_wall_s", []).append(
                round(time.time() - t0, 2))
            print(
                f"epoch {epoch}: train_loss={train_loss:.5f}"
                + (f" val_loss={val_loss:.5f}" if val_loss is not None else "")
                + (f" best={best:.5f}" if best is not None else "")
                + f" ({time.time() - t0:.1f}s)"
            )
            if self.early_stop_count > patience:
                print(f"early stopping at epoch {epoch} (patience {patience})")
                break
        if self.is_primary:
            save_json(self.scores,
                      os.path.join(self.checkpoint_dir, "state.json"))
        return self.scores

    def _is_best(self, metric_name: str, score: float) -> bool:
        higher_better = METRIC_HIGHER_BETTER.get(metric_name, False)
        best = self.scores.get("best_score")
        if best is None or (score > best if higher_better else score < best):
            self.scores["best_score"] = float(score)
            return True
        return False

    # -------------------------------------------------------------- inference
    def inference(self, save: bool = False, results_csv: Optional[str] = None) -> Dict[str, Any]:
        """Full-utterance test pass with dual scoring (solver.py:534-641)."""
        assert self.test_loader is not None, "no test loader configured"
        cfg = self.config.solver.test
        limit = int(cfg.get("total_steps", 0)) or None
        sr = int(self.config.dset.sample_rate)

        # jitted once; window-count bucketing in evaluate_utterance keeps the
        # number of distinct shapes (and thus compilations) small
        apply_eval = jax.jit(lambda variables, inputs: self.model.apply(
            variables, inputs, train=False))

        variables = {"params": self.state["params"]}
        if self.state["batch_stats"]:
            variables["batch_stats"] = self.state["batch_stats"]

        # process-0-only artifact, like checkpoints: on non-primary hosts
        # inference computes (replicated) but writes nothing
        results = metrics_lib.SpeechMetricResultsFile(
            results_csv or os.path.join(self.run_dir, "results.csv")
        ) if self.is_primary else None
        if results is not None:
            results.clear()
        agg = {"enhanced": {"sisdr": [], "stoi": [], "pesq": []},
               "mixture": {"sisdr": [], "stoi": [], "pesq": []}}
        # the reference scores every test utterance with {stoi, pesq, sisdr}
        # (solver.py:190-192, applied at 704-721); pesq is None only when
        # neither the wheel nor the native fallback (train/pesq_native.py)
        # is available. `solver.test.metrics` can narrow the set (e.g.
        # [sisdr] for throughput work / smoke evals on a weak host — the
        # host-side STOI/PESQ scoring is the eval bottleneck on few-core
        # machines); the default is the full reference contract.
        include = tuple(cfg.get("metrics", ("sisdr", "stoi", "pesq")))

        def _score_utterance(clean, enhanced_np, mixture_np, name):
            """Host-side scoring, run OFF the device critical path: while a
            worker computes STOI/PESQ/HA for utterance k, the main thread is
            already waiting on the device for utterance k+1."""
            m_enh = metrics_lib.compute_metrics(clean, enhanced_np, sr, include)
            m_mix = metrics_lib.compute_metrics(clean, mixture_np, sr, include)
            # Clarity HA scoring path (reference solver.py:610-616): resample
            # to the HA rate, amplify per scene listener, HASPI/HASQI. The
            # metric values are "gated" without the external clarity package;
            # the amplification chain runs either way.
            ha_scores = {}
            if (self.clarity_scorer is not None
                    and str(self.config.dset.name).lower() == "clarity"):
                ha_scores = self.compute_metric_clarity(
                    mixture_np[0], enhanced_np[0], clean[0], name
                )
            if save and self.is_primary:
                from speech_enhancement_tpu.data.wav_io import write_wav

                out_dir = os.path.join(self.run_dir, "enhanced")
                write_wav(os.path.join(out_dir, f"{name}.wav"), enhanced_np[0], sr)
            return m_enh, m_mix, ha_scores

        def _consume(name, future):
            """Fold one finished scoring task into agg + the CSV (called in
            utterance order, so rows match the reference's layout)."""
            m_enh, m_mix, ha_scores = future.result()
            for key in include:
                if m_enh.get(key) is not None:
                    agg["enhanced"][key].append(m_enh[key])
                if m_mix.get(key) is not None:
                    agg["mixture"][key].append(m_mix[key])
            for key in ("haspi", "hasqi"):
                for side in ("enhance", "mixture"):
                    value = ha_scores.get(f"{key}_{side}")
                    if value is not None:
                        agg_side = "enhanced" if side == "enhance" else "mixture"
                        agg[agg_side].setdefault(key, []).append(value)

            def _ha_col(col):
                if self.clarity_scorer is None:
                    return None
                value = ha_scores.get(col)
                return "gated" if value is None else value

            if results is None:
                return
            results.add_result(
                name,
                sisdr_enhance=m_enh.get("sisdr"), sisdr_mixture=m_mix.get("sisdr"),
                stoi_enhance=m_enh.get("stoi"), stoi_mixture=m_mix.get("stoi"),
                pesq_enhance=m_enh.get("pesq"), pesq_mixture=m_mix.get("pesq"),
                haspi_enhance=_ha_col("haspi_enhance"),
                haspi_mixture=_ha_col("haspi_mixture"),
                hasqi_enhance=_ha_col("hasqi_enhance"),
                hasqi_mixture=_ha_col("hasqi_mixture"),
            )

        from concurrent.futures import ThreadPoolExecutor

        # batched test-time eval (solver.test.batch_size, default 1 = the
        # reference's batch-1-per-utterance contract, solver.py:546): pack
        # window-count-bucket peers into one fixed-shape device batch so
        # `--mode test` on a real corpus fills the chip instead of running
        # one utterance's windows at a time. Groups are keyed by the padded
        # window-count bucket and padded to a FIXED batch (rows repeat the
        # last utterance) so there is exactly one executable per bucket.
        # Per-utterance masked statistics keep every row's normalization
        # that of its own samples; results are bit-identical to the batch-1
        # path (asserted by tests/test_eval_batched.py) and rows are emitted
        # in loader order.
        eval_batch = max(1, int(cfg.get("batch_size", 1)))
        num_sources = int(self.config.model.get("num_spk", 1))
        window = int(self.config.dset.sample_rate * self.config.model.segment)
        stride = int(self.config.model.win_length)

        pending: dict = {}  # step -> (name, future)
        next_emit = 0

        def _drain(everything: bool) -> None:
            nonlocal next_emit
            # emit rows strictly in loader order; block only when asked or
            # when the head is done (scoring overlaps the device compute)
            while next_emit in pending and (
                    everything or len(pending) > 2 * eval_batch
                    or pending[next_emit][1].done()):
                _consume(*pending.pop(next_emit))
                next_emit += 1

        # cap the TOTAL windows per packed dispatch: under the reference's
        # stride==win_length eval protocol a long utterance is already a
        # big window batch on its own (10 s ≈ 188 windows of 4 s), and
        # utterance-packing multiplies it — 8 × 10 s utterances lowered to
        # a 36 GB eval program on the 16 GB chip. Short utterances (few
        # windows) keep the full eval_batch; long ones degrade gracefully
        # toward the batch-1 contract.
        max_windows = max(_EVAL_BUCKET, int(cfg.get("max_windows", 256)))

        def _pack(bucket: int) -> int:
            return max(1, min(eval_batch,
                              max_windows // (bucket * _EVAL_BUCKET)))

        def _flush(bucket, group, pool) -> None:
            rows = len(group)
            if rows == 0:
                return
            pack = _pack(bucket)
            t_max = max(item["mixture"].shape[-1] for _, item in group)
            channels = group[0][1]["mixture"].shape[0]
            mix = np.zeros((pack, channels, t_max), np.float32)
            lengths = np.zeros(pack, np.int32)
            for b, (_, item) in enumerate(group):
                t_b = item["mixture"].shape[-1]
                mix[b, :, :t_b] = item["mixture"]
                lengths[b] = t_b
            # pad the batch dim with the last row so every bucket uses one
            # fixed [pack, C, total] executable; extras are dropped
            for b in range(rows, pack):
                mix[b] = mix[rows - 1]
                lengths[b] = lengths[rows - 1]
            enhanced = evaluate_utterance(
                mix, apply_eval, variables, self.spec, self.config,
                num_sources=num_sources, lengths=lengths,
            )
            if self.spec.multi_speaker:
                enhanced = enhanced[:, 0]  # score the target-speaker estimate
            for b, (step, item) in enumerate(group):
                t_b = int(lengths[b])
                enhanced_np = enhanced[b:b + 1, ..., :t_b]
                mixture_np = np.asarray(item["mixture"])[None]
                clean = np.asarray(item["sources"][0])[None]
                if step < int(cfg.get("num_show", 0)):
                    self.spec_audio_visualization(
                        mixture_np[0], enhanced_np[0], clean[0],
                        item["name"], step)
                pending[step] = (item["name"], pool.submit(
                    _score_utterance, clean, enhanced_np, mixture_np,
                    item["name"]))

        groups: dict = {}  # window-count bucket -> [(step, item), ...]
        with ThreadPoolExecutor(max_workers=2) as pool:
            for step, item in enumerate(self.test_loader):
                if limit is not None and step >= limit:
                    break
                # numpy in, numpy out: evaluate_utterance pads host-side,
                # runs ONE jitted executable per (batch, bucket), and
                # fetches — the device queue never holds an eager-op backlog
                # (the remote-TPU transport drains those at minutes per
                # utterance, NOTES_DEV.md round 4)
                n_win = _num_windows(item["mixture"].shape[-1], window,
                                     stride)
                bucket = -(-n_win // _EVAL_BUCKET)
                groups.setdefault(bucket, []).append((step, item))
                if len(groups[bucket]) >= _pack(bucket):
                    _flush(bucket, groups.pop(bucket), pool)
                _drain(everything=False)
            for bucket in sorted(groups):
                _flush(bucket, groups.pop(bucket), pool)
            _drain(everything=True)

        summary = {
            side: {k: float(np.mean(v)) for k, v in vals.items() if v}
            for side, vals in agg.items()
        }
        if self.writer:
            for side, vals in summary.items():
                for k, v in vals.items():
                    self.writer.add_scalar(f"test/{side}_{k}", v, 0)
        if self.is_primary:
            save_json(summary, os.path.join(self.run_dir, "test_summary.json"))
        return summary

    def compute_metric_clarity(self, mixture: np.ndarray, enhanced: np.ndarray,
                               clean: np.ndarray, name: str) -> Dict[str, Any]:
        """Clarity hearing-aid scoring (reference: solver.py:723-746).

        Resamples to the HA chain's rate, amplifies enhanced AND mixture
        through each scene listener's NAL-R + compressor chain, and returns
        ``{haspi,hasqi}_{enhance,mixture}`` means. The HASPI/HASQI metric
        values are None when the external ``clarity`` package is absent —
        the same gate as the reference's ``evaluate_clarity`` import
        (solver.py:82-89) — but the amplification path runs regardless.
        """
        assert self.clarity_scorer is not None, "config.ha not set"
        return self.clarity_scorer.score(clean, mixture, enhanced, name)

    # ---------------------------------------------------------- observability
    def spec_audio_visualization(
        self, mixture: np.ndarray, enhanced: np.ndarray, clean: np.ndarray,
        name: str, step: int,
    ) -> None:
        """3-row waveform + magma spectrogram panels to TensorBoard
        (reference: solver.py:643-702). No-op without a writer/matplotlib."""
        if self.writer is None:
            return
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return
        sr = int(self.config.dset.sample_rate)
        rows = [("mixture", mixture), ("enhanced", enhanced), ("clean", clean)]

        fig_w, axes_w = plt.subplots(3, 1, figsize=(8, 6), constrained_layout=True)
        for ax, (label, wav) in zip(axes_w, rows):
            flat = np.asarray(wav).reshape(-1)
            ax.plot(np.arange(len(flat)) / sr, flat, linewidth=0.4)
            ax.set_title(f"{label}  mean={flat.mean():.3f} max={np.abs(flat).max():.3f}")
        self.writer.add_figure(f"waveform/{name}", fig_w, step)
        plt.close(fig_w)

        from speech_enhancement_tpu.ops.stft import stft

        fig_s, axes_s = plt.subplots(3, 1, figsize=(8, 6), constrained_layout=True)
        for ax, (label, wav) in zip(axes_s, rows):
            flat = jnp.asarray(np.asarray(wav).reshape(-1))
            # abs on device: complex-array host transfer is unsupported on
            # some backends (axon relay)
            mag = np.asarray(jnp.abs(stft(flat[None], 512, 128, 512)))[0]
            ax.imshow(20 * np.log10(mag + 1e-8), origin="lower", aspect="auto",
                      cmap="magma")
            ax.set_title(label)
        self.writer.add_figure(f"spectrogram/{name}", fig_s, step)
        plt.close(fig_s)

    def start_profiler(self) -> None:
        """jax.profiler trace into the run's log dir (config
        ``solver.profile: true``); the reference's torch profiler is
        scaffolded but commented out (solver.py:60, 209-212)."""
        jax.profiler.start_trace(self.log_dir)

    def stop_profiler(self) -> None:
        jax.profiler.stop_trace()

    # ------------------------------------------------------------ checkpoints
    def _resume_checkpoint(self, run_dir: str) -> None:
        path = ckpt.latest_checkpoint(run_dir)
        if path is None:
            raise FileNotFoundError(f"no latest_model.ckpt under {run_dir}")
        template = {k: self.state[k]
                    for k in ("params", "batch_stats", "opt_state", "step")}
        restored = ckpt.load_checkpoint(path, template)
        self.state["params"] = restored["params"]
        self.state["batch_stats"] = restored["batch_stats"]
        if bool(self.config.optim.get("load", False)):
            self.state["opt_state"] = restored["opt_state"]
        # single source of truth for the global step: the restored device
        # counter seeds the host-side TB mirror so step indices continue
        # across resume instead of restarting at 0 (round-2 checkpoints
        # lacked "step"; load_checkpoint leaves the template zero then)
        self.state["step"] = restored.get("step", self.state["step"])
        self._global_step = int(self.state["step"])
        scores = ckpt.load_scores(run_dir)
        if scores:
            self.scores["best_score"] = scores.get("best_score")
        print(f"resumed from {path}")

    def _preload_model(self, path: str) -> None:
        if path.endswith((".pth", ".pt", ".tar")):
            # reference torch checkpoint: convert in place (the reference's
            # own preload also takes bare .pth weights, solver.py:262-279)
            from speech_enhancement_tpu.compat import params_from_torch_checkpoint

            params, batch_stats = params_from_torch_checkpoint(
                path, self.config.model)
            self.state["params"] = jax.tree.map(
                lambda old, new: jnp.asarray(new, old.dtype),
                self.state["params"], jax.device_put(params))
            if batch_stats:
                self.state["batch_stats"] = jax.tree.map(
                    lambda old, new: jnp.asarray(new, old.dtype),
                    self.state["batch_stats"], jax.device_put(batch_stats))
            print(f"imported torch weights from {path}")
            return
        restored = ckpt.load_checkpoint(path, {"params": self.state["params"]})
        self.state["params"] = restored["params"]
        print(f"preloaded weights from {path}")
