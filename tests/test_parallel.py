"""SPMD data-parallel tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_enhancement_tpu.config import Config, with_defaults
from speech_enhancement_tpu.data.synthetic import make_voicebank_demand
from speech_enhancement_tpu.main import main
from speech_enhancement_tpu.parallel.mesh import make_mesh, shard_batch


def test_mesh_shapes():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(data=8)
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh(data=4, model=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh(data=8)
    batch = {"mixture": np.zeros((16, 1, 100), np.float32)}
    sharded = shard_batch(mesh, batch)
    sharding = sharded["mixture"].sharding
    assert sharding.shard_shape((16, 1, 100)) == (2, 1, 100)


@pytest.fixture(scope="module")
def vbd_root(tmp_path_factory):
    return make_voicebank_demand(
        str(tmp_path_factory.mktemp("vbd")), n_utterances=8, min_seconds=1.1,
        max_seconds=1.4,
    )


def _config(vbd_root, run_root, data_parallel):
    return with_defaults(Config({
        "seed": 3,
        "optim": {"optim": "adam", "lr": 1e-3, "loss": "mse", "clip_grad": 5},
        "model": {
            "name": "dnn", "audio_channels": 1, "num_spk": 1, "segment": 1,
            "sample_rate": 16000, "n_fft": 256, "hop_length": 128,
            "win_length": 256, "n_layers": 2, "hidden_layer": 32,
            "drop_out": 0.0, "dnn_method": "mask", "dnn_ema": False,
        },
        "dset": {
            "name": "VoiceBankDEMAND", "wav": vbd_root, "split": [0.6, 0.2, 0.2],
            "segment": 1, "audio_channels": 1, "sample_rate": 16000,
            "norm": "z-score",
        },
        "solver": {
            "root": run_root, "epochs": 1, "batch_size": 8, "all_steps": False,
            "total_steps": 2, "save_checkpoint_interval": 1,
            "validation": {"total_steps": 1, "interval": 1, "metric": "loss"},
            "test": {"total_steps": 1, "interval": 1, "num_show": 0, "metric": "sisdr"},
        },
        "parallel": {"data": data_parallel, "model": 1},
    }))


def test_data_parallel_training_runs(vbd_root, tmp_path):
    cfg = _config(vbd_root, str(tmp_path), data_parallel=8)
    solver = main(cfg, mode="train", return_solver=True)
    assert np.isfinite(solver.scores["train_loss"][0])
    # params stayed replica-consistent: fully-replicated arrays are addressable
    leaf = jax.tree_util.tree_leaves(solver.state["params"])[0]
    assert np.all(np.isfinite(np.asarray(leaf)))


def test_data_parallel_matches_single_device_loss(vbd_root, tmp_path):
    # identical data order (same seed), pmean over 8 shards == global mean
    cfg_dp = _config(vbd_root, str(tmp_path / "dp"), data_parallel=8)
    cfg_sd = _config(vbd_root, str(tmp_path / "sd"), data_parallel=1)
    s_dp = main(cfg_dp, mode="train", return_solver=True)
    s_sd = main(cfg_sd, mode="train", return_solver=True)
    # mse decomposes exactly over equal shards; dropout disabled
    assert s_dp.scores["train_loss"][0] == pytest.approx(
        s_sd.scores["train_loss"][0], rel=1e-4
    )


def test_graft_dryrun_multichip():
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)


def test_data_parallel_multi_step(vbd_root, tmp_path):
    # steps_per_call > 1 composes with the shard_map data-parallel path
    # (scan dim replicated, batch dim sharded).
    import numpy as np

    from speech_enhancement_tpu.main import main as main_fn

    cfg = _config(vbd_root, str(tmp_path), data_parallel=8)
    cfg.solver.steps_per_call = 2
    cfg.solver.all_steps = False
    cfg.solver.total_steps = 4
    solver = main_fn(cfg, mode="train", return_solver=True)
    assert np.isfinite(solver.scores["train_loss"][0])


def test_data_parallel_int16_wire(vbd_root, tmp_path):
    # the int16 wire batches are pytrees; the shard_map P("data") prefix
    # specs must shard every leaf (q AND scale) on the batch axis, and the
    # DP loss must still match the f32 wire
    cfg_q = _config(vbd_root, str(tmp_path / "q"), data_parallel=8)
    cfg_q.dset.wire = "int16"
    cfg_f = _config(vbd_root, str(tmp_path / "f"), data_parallel=8)
    s_q = main(cfg_q, mode="train", return_solver=True)
    s_f = main(cfg_f, mode="train", return_solver=True)
    assert s_q.scores["train_loss"][0] == pytest.approx(
        s_f.scores["train_loss"][0], rel=2e-3
    )


def test_init_distributed_wiring(monkeypatch):
    """parallel.multihost: true -> jax.distributed.initialize before any
    backend use, with config overrides passed through (VERDICT r2 item 8)."""
    from speech_enhancement_tpu.parallel import mesh as mesh_lib

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    assert mesh_lib.init_distributed(Config({"multihost": False})) is False
    assert calls == []
    cfg = Config({"multihost": True, "coordinator_address": "10.0.0.1:1234",
                  "num_processes": 4, "process_id": 2})
    assert mesh_lib.init_distributed(cfg) is True
    assert calls == [{"coordinator_address": "10.0.0.1:1234",
                      "num_processes": 4, "process_id": 2}]
    # pod auto-detection: no overrides -> bare initialize()
    assert mesh_lib.init_distributed(Config({"multihost": True})) is True
    assert calls[-1] == {}


def test_multihost_loader_shards_assemble_global_batch(vbd_root, monkeypatch):
    """Two mocked hosts: disjoint train shards whose loaders assemble the
    global batch, pushed through shard_batch + a pmean collective on the
    virtual mesh — the per-host batch semantics documented in config.py."""
    from speech_enhancement_tpu.data.loader import (SegmentLoader,
                                                    get_train_wav_dataset)

    cfg = _config(vbd_root, "/tmp/unused", data_parallel=8)

    host_sets = []
    for host in (0, 1):
        monkeypatch.setattr(jax, "process_index", lambda h=host: h)
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        train_set, _, _ = get_train_wav_dataset(cfg.dset, cfg.model, seed=3)
        host_sets.append(train_set)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    monkeypatch.setattr(jax, "process_count", lambda: 1)
    full_train, _, _ = get_train_wav_dataset(cfg.dset, cfg.model, seed=3)

    s0, s1 = (set(s.mixture_files) for s in host_sets)
    assert s0.isdisjoint(s1)
    assert s0 | s1 == set(full_train.mixture_files)

    # each host's loader feeds batch_size=2 (the fixture has ~2-3 train
    # utterances per host shard); the global batch is their concatenation
    # (dim 0 = per-host batch * process_count = 4)
    batches = []
    for ds in host_sets:
        loader = SegmentLoader(ds, batch_size=2, segment_length=16000,
                               shuffle=False, drop_last=True, seed=0)
        batches.append(next(iter(loader)))
    global_batch = {
        k: np.concatenate([b[k] for b in batches], axis=0)
        for k in ("mixture", "sources")
    }
    assert global_batch["mixture"].shape[0] == 4

    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(data=4)
    sharded = shard_batch(mesh, global_batch)
    spmd_mean = jax.jit(shard_map(
        lambda x: jax.lax.pmean(jnp.mean(x), "data"),
        mesh=mesh, in_specs=P("data"), out_specs=P(), check_vma=False,
    ))
    got = float(spmd_mean(sharded["mixture"]))
    # f32 reduction order differs between the sharded pmean and numpy
    assert got == pytest.approx(float(np.mean(global_batch["mixture"])), rel=1e-3)


def test_multihost_checkpoint_discipline(vbd_root, tmp_path, monkeypatch):
    """Process-0-only writes + all-host resume (VERDICT r3 task 7): a
    non-primary host must write NO artifacts (checkpoints, config.yaml,
    TB logs, results.csv, test_summary.json), and resume from process-0's
    checkpoint must load the identical state on every host."""
    import glob
    import os

    # host 1 trains: nothing written
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    cfg1 = _config(vbd_root, str(tmp_path / "h1"), data_parallel=1)
    s1 = main(cfg1, mode="train", return_solver=True)
    assert not s1.is_primary
    assert s1.writer is None
    assert not os.path.exists(os.path.join(s1.run_dir, "config.yaml"))
    assert glob.glob(os.path.join(s1.checkpoint_dir, "*.ckpt")) == []
    summary = s1.inference()  # computes, writes nothing
    assert np.isfinite(summary["enhanced"]["sisdr"])
    assert not os.path.exists(os.path.join(s1.run_dir, "results.csv"))
    assert not os.path.exists(os.path.join(s1.run_dir, "test_summary.json"))

    # host 0 trains the same config: artifacts exist
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    cfg0 = _config(vbd_root, str(tmp_path / "h0"), data_parallel=1)
    s0 = main(cfg0, mode="train", return_solver=True)
    assert s0.is_primary
    assert os.path.exists(os.path.join(s0.checkpoint_dir, "latest_model.ckpt"))

    # all-host resume: both a primary and a non-primary host load
    # process-0's checkpoint and end up with identical params
    def resumed(host):
        monkeypatch.setattr(jax, "process_index", lambda: host)
        cfg = _config(vbd_root, str(tmp_path / f"r{host}"), data_parallel=1)
        cfg.solver.resume = s0.run_dir
        cfg.solver.epochs = 0
        return main(cfg, mode="train", return_solver=True)

    r0, r1 = resumed(0), resumed(1)
    leaves0 = jax.tree_util.tree_leaves(r0.state["params"])
    leaves1 = jax.tree_util.tree_leaves(r1.state["params"])
    for a, b in zip(leaves0, leaves1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the restored global step (and the best-score mirror) must agree on
    # every host — the step counter is the single source of truth that
    # seeds TB indices across resume
    assert r0._global_step == r1._global_step == s0._global_step
    assert r0.scores["best_score"] == r1.scores["best_score"]
