"""Map reference PyTorch DCCRN weights onto the flax DCCRN pytree.

The reference trains torch ``nn.Module`` models and checkpoints raw
``state_dict``s (src/solver.py:295-341). This module converts such a
state_dict — loaded with torch, or any mapping of numpy arrays with the
same keys — into this framework's ``params`` / ``batch_stats`` pytrees so a
reference-trained DCCRN runs on TPU unchanged (waveform-level parity is
asserted in tests/test_parity.py against the reference implementation).

Key layout facts (reference src/model/dccrn.py):
* ``encoder.{i}.0.{real,imag}_conv.weight``  [Cout, Cin, 5, 2]  (Conv2d)
* ``decoder.{i}.0.{real,imag}_conv.weight``  [Cin, Cout, 5, 2]  (ConvTranspose2d)
  — torch's transposed conv correlates with the *flipped* kernel relative
  to ``lax.conv_transpose(transpose_kernel=False)``, hence the spatial flip.
* ``encoder.{i}.1.{Wrr,Wri,Wii,Br,Bi}`` ComplexBatchNorm affine;
  ``{RMr,RMi,RVrr,RVri,RVii}`` running stats (dccrn.py:457-634)
* ``encoder.{i}.2.weight`` PReLU alpha
* ``enhance.{l}.{real,imag}_lstm.*_l0`` torch LSTM mats [4H, D] (gate order
  i,f,g,o — the same order ops/rnn.LSTMLayer splits)
* ``enhance.{last}.{r,i}_trans`` the complex LSTM output projections
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np


def _np(value) -> np.ndarray:
    if hasattr(value, "detach"):  # torch tensor without importing torch
        value = value.detach().cpu().numpy()
    return np.asarray(value, dtype=np.float32)


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a reference ``.pth``/``.tar`` checkpoint into numpy arrays.

    Accepts both the bare weights files (``model_*.pth``) and the full
    ``latest_model.tar`` dicts ({"model": state_dict, ...}) the reference
    writes (src/solver.py:317-337).
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "model" in blob and not any(
        key.startswith(("encoder", "decoder", "enhance", "stft"))
        for key in blob
    ):
        blob = blob["model"]
    return {key: _np(value) for key, value in blob.items()}


def _conv(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """encoder Conv2d pair -> {wr, wi, br, bi} in HWIO."""
    return {
        "wr": _np(sd[f"{prefix}.real_conv.weight"]).transpose(2, 3, 1, 0),
        "wi": _np(sd[f"{prefix}.imag_conv.weight"]).transpose(2, 3, 1, 0),
        "br": _np(sd[f"{prefix}.real_conv.bias"]),
        "bi": _np(sd[f"{prefix}.imag_conv.bias"]),
    }


def _deconv(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """decoder ConvTranspose2d pair -> {wr, wi, br, bi}: spatial flip then
    [in, out, kh, kw] -> [kh, kw, in, out] (verified vs torch)."""
    def w(key):
        kernel = _np(sd[key])[:, :, ::-1, ::-1]
        return np.ascontiguousarray(kernel.transpose(2, 3, 0, 1))

    return {
        "wr": w(f"{prefix}.real_conv.weight"),
        "wi": w(f"{prefix}.imag_conv.weight"),
        "br": _np(sd[f"{prefix}.real_conv.bias"]),
        "bi": _np(sd[f"{prefix}.imag_conv.bias"]),
    }


def _cbn(sd: Mapping[str, np.ndarray], prefix: str) -> Tuple[dict, dict]:
    params = {
        "gamma_rr": _np(sd[f"{prefix}.Wrr"]),
        "gamma_ri": _np(sd[f"{prefix}.Wri"]),
        "gamma_ii": _np(sd[f"{prefix}.Wii"]),
        "beta_r": _np(sd[f"{prefix}.Br"]),
        "beta_i": _np(sd[f"{prefix}.Bi"]),
    }
    stats = {
        "mean_r": _np(sd[f"{prefix}.RMr"]),
        "mean_i": _np(sd[f"{prefix}.RMi"]),
        "vrr": _np(sd[f"{prefix}.RVrr"]),
        "vri": _np(sd[f"{prefix}.RVri"]),
        "vii": _np(sd[f"{prefix}.RVii"]),
    }
    return params, stats


def _lstm(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "w_ih": _np(sd[f"{prefix}.weight_ih_l0"]).T,
        "w_hh": _np(sd[f"{prefix}.weight_hh_l0"]).T,
        "b_ih": _np(sd[f"{prefix}.bias_ih_l0"]),
        "b_hh": _np(sd[f"{prefix}.bias_hh_l0"]),
    }


def dccrn_from_torch_state(
    state_dict: Mapping[str, np.ndarray],
    n_encoder: int = 6,
    rnn_layers: int = 2,
) -> Tuple[dict, dict]:
    """Reference DCCRN state_dict -> (params, batch_stats) pytrees for
    :class:`speech_enhancement_tpu.models.dccrn.DCCRN`."""
    params: Dict[str, dict] = {}
    batch_stats: Dict[str, dict] = {}

    for i in range(n_encoder):
        block = _conv(state_dict, f"encoder.{i}.0")
        cbn_params, cbn_stats = _cbn(state_dict, f"encoder.{i}.1")
        block["cbn"] = cbn_params
        block["prelu"] = {"alpha": _np(state_dict[f"encoder.{i}.2.weight"])}
        params[f"enc_{i}"] = block
        batch_stats[f"enc_{i}"] = {"cbn": cbn_stats}

    for i in range(n_encoder):
        block = _deconv(state_dict, f"decoder.{i}.0")
        if f"decoder.{i}.1.Wrr" in state_dict:  # last block has no BN/PReLU
            cbn_params, cbn_stats = _cbn(state_dict, f"decoder.{i}.1")
            block["cbn"] = cbn_params
            block["prelu"] = {"alpha": _np(state_dict[f"decoder.{i}.2.weight"])}
            batch_stats[f"dec_{i}"] = {"cbn": cbn_stats}
        params[f"dec_{i}"] = block

    for layer in range(rnn_layers):
        block = {
            "real_lstm": _lstm(state_dict, f"enhance.{layer}.real_lstm"),
            "imag_lstm": _lstm(state_dict, f"enhance.{layer}.imag_lstm"),
        }
        if f"enhance.{layer}.r_trans.weight" in state_dict:
            block["proj_r"] = {
                "kernel": _np(state_dict[f"enhance.{layer}.r_trans.weight"]).T,
                "bias": _np(state_dict[f"enhance.{layer}.r_trans.bias"]),
            }
            block["proj_i"] = {
                "kernel": _np(state_dict[f"enhance.{layer}.i_trans.weight"]).T,
                "bias": _np(state_dict[f"enhance.{layer}.i_trans.bias"]),
            }
        params[f"clstm_{layer}"] = block

    return params, batch_stats
