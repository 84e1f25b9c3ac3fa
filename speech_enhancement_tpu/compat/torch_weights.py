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


# ---------------------------------------------------------------------------
# MelRNN (reference src/model/mel_rnn.py:35-123)
# ---------------------------------------------------------------------------

def _rnn_stack(sd: Mapping[str, np.ndarray], prefix: str, layers: int,
               rnn_type: str, bidirectional: bool = False) -> Dict[str, dict]:
    """torch {RNN,LSTM,GRU}(num_layers=L, bias=False) -> RNNStack params.

    torch packs per-layer mats as ``weight_ih_l{k}`` [G*H, D] (reverse
    direction: ``_reverse`` suffix -> ``l{k}_bwd``); the flax layers store
    the transpose. Gate orders already agree (LSTM i,f,g,o; GRU r,z,n —
    ops/rnn.py docstrings).
    """
    def one(k, suffix):
        layer = {
            "w_ih": _np(sd[f"{prefix}.weight_ih_l{k}{suffix}"]).T,
            "w_hh": _np(sd[f"{prefix}.weight_hh_l{k}{suffix}"]).T,
        }
        if f"{prefix}.bias_ih_l{k}{suffix}" in sd:
            layer["b_ih"] = _np(sd[f"{prefix}.bias_ih_l{k}{suffix}"])
            layer["b_hh"] = _np(sd[f"{prefix}.bias_hh_l{k}{suffix}"])
        if rnn_type == "rnn":  # VanillaRNNLayer folds the biases into one
            folded = {"w_ih": layer["w_ih"], "w_hh": layer["w_hh"]}
            if "b_ih" in layer:
                folded["b"] = layer["b_ih"] + layer["b_hh"]
            return folded
        return layer

    out: Dict[str, dict] = {}
    for k in range(layers):
        out[f"l{k}_fwd"] = one(k, "")
        if bidirectional:
            out[f"l{k}_bwd"] = one(k, "_reverse")
    return out


def mel_rnn_from_torch_state(
    state_dict: Mapping[str, np.ndarray],
    rnn_layer: int = 2,
    rnn_type: str = "lstm",
) -> Tuple[dict, dict]:
    """Reference MelRNN state_dict -> (params, batch_stats) for
    :class:`speech_enhancement_tpu.models.mel_rnn.MelRNN`.

    Key layout (reference src/model/mel_rnn.py:40-80): ``rnn.weight_*_l{k}``
    (bias=False), ``batchnorm.*`` (BatchNorm1d over rnn_hidden),
    ``fc_layers.0/2.{weight,bias}`` (the two Linears; 1/3 are activations).
    """
    params = {
        "rnn": _rnn_stack(state_dict, "rnn", rnn_layer, rnn_type),
        "bn": {
            "scale": _np(state_dict["batchnorm.weight"]),
            "bias": _np(state_dict["batchnorm.bias"]),
        },
        "fc1": {"kernel": _np(state_dict["fc_layers.0.weight"]).T,
                "bias": _np(state_dict["fc_layers.0.bias"])},
        "fc2": {"kernel": _np(state_dict["fc_layers.2.weight"]).T,
                "bias": _np(state_dict["fc_layers.2.bias"])},
    }
    batch_stats = {
        "bn": {
            "mean": _np(state_dict["batchnorm.running_mean"]),
            "var": _np(state_dict["batchnorm.running_var"]),
        }
    }
    return params, batch_stats


# ---------------------------------------------------------------------------
# Conv-TasNet (reference src/model/conv_tasnet.py:34-204,207-402)
# ---------------------------------------------------------------------------

def _conv1d(sd: Mapping[str, np.ndarray], key: str) -> Dict[str, np.ndarray]:
    """torch Conv1d weight [Cout, Cin/groups, K] -> flax kernel [K, Cin/g, Cout]."""
    return {"kernel": _np(sd[key]).transpose(2, 1, 0)}


def _cln(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """reference cLN/gLN affine [1, N, 1] -> flat (N,) (ops/norms.py)."""
    return {"gamma": _np(sd[f"{prefix}.gamma"]).reshape(-1),
            "beta": _np(sd[f"{prefix}.beta"]).reshape(-1)}


def conv_tasnet_from_torch_state(
    state_dict: Mapping[str, np.ndarray],
    R: int = 2,
    X: int = 7,
    skip: bool = False,
) -> Tuple[dict, dict]:
    """Reference ConvTasNet state_dict -> (params, {}) for
    :class:`speech_enhancement_tpu.models.conv_tasnet.ConvTasNet`.

    The reference wires the separator two ways (conv_tasnet.py:266-275):
    ``skip=False`` packs everything into one ``nn.Sequential`` named
    ``network``; ``skip=True`` keeps named attributes. Both layouts map to
    the same flax tree. Depthwise convs ([H, 1, P], groups=H) land on
    ``feature_group_count`` kernels [P, 1, H]; the decoder's
    ``basis_signals`` Linear transposes onto the Dense kernel.
    """
    if skip:
        ln, bottleneck = "separator.layer_norm", "separator.bottleneck_conv1x1"
        tcn, mask = "separator.temporal_conv_net", "separator.mask_conv1x1"
    else:
        ln, bottleneck = "separator.network.0", "separator.network.1"
        tcn, mask = "separator.network.2", "separator.network.3"

    params: Dict[str, dict] = {
        "encoder": _conv1d(state_dict, "encoder.conv1d_U.weight"),
        "layer_norm": _cln(state_dict, ln),
        "bottleneck": _conv1d(state_dict, f"{bottleneck}.weight"),
        "mask_conv": _conv1d(state_dict, f"{mask}.weight"),
        "decoder": {"kernel": _np(state_dict["decoder.basis_signals.weight"]).T},
    }
    for r in range(R):
        for x in range(X):
            p = f"{tcn}.{r}.{x}"
            block = {
                "conv1x1": _conv1d(state_dict, f"{p}.net.0.weight"),
                "prelu": {"alpha": _np(state_dict[f"{p}.net.1.weight"])},
                "norm": _cln(state_dict, f"{p}.net.2"),
                "dsconv": {
                    "depthwise": _conv1d(state_dict, f"{p}.net.3.net.0.weight"),
                    "prelu": {"alpha": _np(state_dict[f"{p}.net.3.net.1.weight"])},
                    "norm": _cln(state_dict, f"{p}.net.3.net.2"),
                    "pointwise": _conv1d(state_dict,
                                         f"{p}.net.3.pointwise_conv.weight"),
                },
            }
            if skip:
                block["dsconv"]["skip_conv"] = _conv1d(
                    state_dict, f"{p}.net.3.skip_conv.weight")
            params[f"block_{r}_{x}"] = block
    return params, {}


def rnn_stft_mask_from_torch_state(
    state_dict: Mapping[str, np.ndarray],
    rnn_layer: int = 2,
    rnn_type: str = "lstm",
    bidirectional: bool = False,
) -> Tuple[dict, dict]:
    """Reference STFT_RNN state_dict -> (params, batch_stats) for
    :class:`speech_enhancement_tpu.models.stft_rnn.RNNSTFTMask`.

    Key layout (reference src/model/stft_rnn.py:39-75): ``rnn.*``
    (bias=False, optional ``_reverse`` direction), ``batchnorm.*``
    (BatchNorm1d over rnn_hidden or 2*rnn_hidden), ``fc_layers.0`` (the
    single Linear to n_features * num_spk; index 1 is the activation).
    """
    params = {
        "rnn": _rnn_stack(state_dict, "rnn", rnn_layer, rnn_type,
                          bidirectional=bidirectional),
        "bn": {
            "scale": _np(state_dict["batchnorm.weight"]),
            "bias": _np(state_dict["batchnorm.bias"]),
        },
        "fc": {"kernel": _np(state_dict["fc_layers.0.weight"]).T,
               "bias": _np(state_dict["fc_layers.0.bias"])},
    }
    batch_stats = {
        "bn": {
            "mean": _np(state_dict["batchnorm.running_mean"]),
            "var": _np(state_dict["batchnorm.running_var"]),
        }
    }
    return params, batch_stats


# ---------------------------------------------------------------------------
# CRN (reference src/model/crn.py:9-141)
# ---------------------------------------------------------------------------

def _bn2d(sd: Mapping[str, np.ndarray], prefix: str) -> Tuple[dict, dict]:
    """torch BatchNorm{1,2}d -> flax BatchNorm params + batch_stats."""
    return (
        {"scale": _np(sd[f"{prefix}.weight"]),
         "bias": _np(sd[f"{prefix}.bias"])},
        {"mean": _np(sd[f"{prefix}.running_mean"]),
         "var": _np(sd[f"{prefix}.running_var"])},
    )


def crn_from_torch_state(
    state_dict: Mapping[str, np.ndarray],
) -> Tuple[dict, dict]:
    """Reference CRN state_dict -> (params, batch_stats) for
    :class:`speech_enhancement_tpu.models.crn.CRN`.

    Key layout (reference src/model/crn.py:78-95): five
    ``conv_block_{i}`` CausalConvBlocks (Conv2d k=(3,2) s=(2,1) + BN),
    the 1792-wide 2-layer ``lstm_layer`` (batch_first=True — no
    recurrence quirk here), five ``tran_conv_block_{i}``
    CausalTransConvBlocks (ConvTranspose2d + BN; the transposed kernels
    need the spatial flip, and the bias lands on the block-level ``bias``
    param so torch's output_padding row — bias-only — matches exactly).
    """
    params: Dict[str, dict] = {}
    batch_stats: Dict[str, dict] = {}
    for i in range(1, 6):
        p = f"conv_block_{i}"
        bn_p, bn_s = _bn2d(state_dict, f"{p}.norm")
        params[f"enc_{i}"] = {
            "conv": {
                "kernel": _np(state_dict[f"{p}.conv.weight"]).transpose(2, 3, 1, 0),
                "bias": _np(state_dict[f"{p}.conv.bias"]),
            },
            "bn": bn_p,
        }
        batch_stats[f"enc_{i}"] = {"bn": bn_s}

    for layer in (1, 2):
        params[f"lstm{layer}"] = {
            "w_ih": _np(state_dict[f"lstm_layer.weight_ih_l{layer - 1}"]).T,
            "w_hh": _np(state_dict[f"lstm_layer.weight_hh_l{layer - 1}"]).T,
            "b_ih": _np(state_dict[f"lstm_layer.bias_ih_l{layer - 1}"]),
            "b_hh": _np(state_dict[f"lstm_layer.bias_hh_l{layer - 1}"]),
        }

    for i in range(1, 6):
        p = f"tran_conv_block_{i}"
        kernel = _np(state_dict[f"{p}.conv.weight"])[:, :, ::-1, ::-1]
        bn_p, bn_s = _bn2d(state_dict, f"{p}.norm")
        params[f"dec_{i}"] = {
            "conv": {"kernel": np.ascontiguousarray(kernel.transpose(2, 3, 0, 1))},
            "bias": _np(state_dict[f"{p}.conv.bias"]),
            "bn": bn_p,
        }
        batch_stats[f"dec_{i}"] = {"bn": bn_s}
    return params, batch_stats


# ---------------------------------------------------------------------------
# Wave-U-Net (reference src/model/wav_unet.py:8-110)
# ---------------------------------------------------------------------------

def wav_unet_from_torch_state(
    state_dict: Mapping[str, np.ndarray],
    unet_nlayers: int = 12,
) -> Tuple[dict, dict]:
    """Reference WavUnet state_dict -> (params, batch_stats) for
    :class:`speech_enhancement_tpu.models.wav_unet.WavUNet`.

    Key layout: ``encoder.{i}.main.{0,1}`` / ``middle.{0,1}`` /
    ``decoder.{i}.main.{0,1}`` Conv1d+BatchNorm1d sandwiches and the
    ``out.0`` 1x1 conv (wav_unet.py:44-77).
    """
    def conv_bn(conv_key, bn_key):
        conv = {
            "kernel": _np(state_dict[f"{conv_key}.weight"]).transpose(2, 1, 0),
            "bias": _np(state_dict[f"{conv_key}.bias"]),
        }
        bn_p, bn_s = _bn2d(state_dict, bn_key)
        return conv, bn_p, bn_s

    params: Dict[str, dict] = {}
    batch_stats: Dict[str, dict] = {}
    for i in range(unet_nlayers):
        conv, bn_p, bn_s = conv_bn(f"encoder.{i}.main.0", f"encoder.{i}.main.1")
        params[f"enc_{i}"] = {"conv": conv, "bn": bn_p}
        batch_stats[f"enc_{i}"] = {"bn": bn_s}
    conv, bn_p, bn_s = conv_bn("middle.0", "middle.1")
    params["middle"] = {"conv": conv, "bn": bn_p}
    batch_stats["middle"] = {"bn": bn_s}
    for i in range(unet_nlayers):
        conv, bn_p, bn_s = conv_bn(f"decoder.{i}.main.0", f"decoder.{i}.main.1")
        params[f"dec_{i}"] = {"conv": conv, "bn": bn_p}
        batch_stats[f"dec_{i}"] = {"bn": bn_s}
    params["out"] = {
        "kernel": _np(state_dict["out.0.weight"]).transpose(2, 1, 0),
        "bias": _np(state_dict["out.0.bias"]),
    }
    return params, batch_stats


# ---------------------------------------------------------------------------
# UNet (reference src/model/unet.py:9-146)
# ---------------------------------------------------------------------------

def _double_conv(sd: Mapping[str, np.ndarray], prefix: str) -> Tuple[dict, dict]:
    """DoubleConv (conv/BN/LeakyReLU x2, unet.py:65-86) -> flax params."""
    bn1_p, bn1_s = _bn2d(sd, f"{prefix}.1")
    bn2_p, bn2_s = _bn2d(sd, f"{prefix}.4")
    params = {
        "conv1": {"kernel": _np(sd[f"{prefix}.0.weight"]).transpose(2, 3, 1, 0)},
        "bn1": bn1_p,
        "conv2": {"kernel": _np(sd[f"{prefix}.3.weight"]).transpose(2, 3, 1, 0)},
        "bn2": bn2_p,
    }
    return params, {"bn1": bn1_s, "bn2": bn2_s}


def _up2x2(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """ConvTranspose2d k=2 s=2 -> flax ConvTranspose (spatial flip)."""
    kernel = _np(sd[f"{prefix}.weight"])[:, :, ::-1, ::-1]
    return {
        "kernel": np.ascontiguousarray(kernel.transpose(2, 3, 0, 1)),
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def unet_from_torch_state(
    state_dict: Mapping[str, np.ndarray],
    unet_layer: int = 4,
    bilinear: bool = False,
) -> Tuple[dict, dict]:
    """Reference UNet state_dict -> (params, batch_stats) for
    :class:`speech_enhancement_tpu.models.unet.UNet` (bilinear=False
    layout; the bilinear variant has no transposed-conv weights).

    Key layout (unet.py:21-37): ``encoder.{n}.maxpool_conv.0.double_conv``
    Downs, ``middle.double_conv``, ``decoder.{n}.conv.double_conv`` with
    ``decoder.{n}.up`` ConvTranspose2d for n >= 1 (decoder 0 is
    ``first=True`` — no up), and ``outconv.{up,conv.double_conv}``.
    """
    params: Dict[str, dict] = {}
    batch_stats: Dict[str, dict] = {}
    for n in range(unet_layer):
        p, s = _double_conv(state_dict, f"encoder.{n}.maxpool_conv.0.double_conv")
        params[f"down_{n}"] = p
        batch_stats[f"down_{n}"] = s
    p, s = _double_conv(state_dict, "middle.double_conv")
    params["middle"] = p
    batch_stats["middle"] = s
    for n in range(unet_layer):
        if n > 0 and not bilinear:  # bilinear Ups have no conv weights
            params[f"up_{n}"] = _up2x2(state_dict, f"decoder.{n}.up")
        p, s = _double_conv(state_dict, f"decoder.{n}.conv.double_conv")
        params[f"dec_{n}"] = p
        batch_stats[f"dec_{n}"] = s
    if not bilinear:
        params["up_out"] = _up2x2(state_dict, "outconv.up")
    p, s = _double_conv(state_dict, "outconv.conv.double_conv")
    params["dec_out"] = p
    batch_stats["dec_out"] = s
    return params, batch_stats


# ---------------------------------------------------------------------------
# DCUnet (reference src/model/dcunet.py:8-306, complex path)
# ---------------------------------------------------------------------------

def dcunet_from_torch_state(
    state_dict: Mapping[str, np.ndarray],
    model_depth: int = 10,
) -> Tuple[dict, dict]:
    """Reference DCUnet (data_type=True) state_dict -> (params, batch_stats)
    for :class:`speech_enhancement_tpu.models.dcunet.DCUnet`.

    The reference's complex modules are the simple paired-real kind
    (dcunet.py:309-370: conv_re/conv_im pairs combined as a complex
    product, independent BatchNorm2d per part) — unlike DCCRN's whitening
    ComplexBatchNorm — so each part maps onto the ``_r``/``_i`` twins and
    ``ComplexBatchNormSimple``'s bn_r/bn_i.
    """
    def conv2d(key):
        return {"kernel": _np(state_dict[f"{key}.weight"]).transpose(2, 3, 1, 0),
                "bias": _np(state_dict[f"{key}.bias"])}

    def tconv2d(key):
        kernel = _np(state_dict[f"{key}.weight"])[:, :, ::-1, ::-1]
        return {"kernel": np.ascontiguousarray(kernel.transpose(2, 3, 0, 1)),
                "bias": _np(state_dict[f"{key}.bias"])}

    def cbn(prefix):
        re_p, re_s = _bn2d(state_dict, f"{prefix}.bn_re")
        im_p, im_s = _bn2d(state_dict, f"{prefix}.bn_im")
        return ({"bn_r": re_p, "bn_i": im_p}, {"bn_r": re_s, "bn_i": im_s})

    params: Dict[str, dict] = {}
    batch_stats: Dict[str, dict] = {}
    for i in range(model_depth // 2):
        bn_p, bn_s = cbn(f"encoder{i}.bn")
        params[f"enc_{i}"] = {
            "conv_r": conv2d(f"encoder{i}.conv.conv_re"),
            "conv_i": conv2d(f"encoder{i}.conv.conv_im"),
            "bn": bn_p,
        }
        batch_stats[f"enc_{i}"] = {"bn": bn_s}
        bn_p, bn_s = cbn(f"decoder{i}.bn")
        params[f"dec_{i}"] = {
            "tconv_r": tconv2d(f"decoder{i}.transconv.tconv_re"),
            "tconv_i": tconv2d(f"decoder{i}.transconv.tconv_im"),
            "bn": bn_p,
        }
        batch_stats[f"dec_{i}"] = {"bn": bn_s}
    params["linear_r"] = conv2d("linear.conv_re")
    params["linear_i"] = conv2d("linear.conv_im")
    return params, batch_stats


# ---------------------------------------------------------------------------
# DNN (reference src/model/dnn.py:7-141)
# ---------------------------------------------------------------------------

def dnn_from_torch_state(
    state_dict: Mapping[str, np.ndarray],
    n_layers: int = 4,
) -> Tuple[dict, dict]:
    """Reference DeepNeuralNetwork state_dict -> (params, batch_stats) for
    :class:`speech_enhancement_tpu.models.dnn.DNN`.

    Key layout: ``context`` (the EMA-context Linear), ``model.{n}.model.0``
    Linears + ``model.{n}.model.1`` BatchNorm1ds (dnn.py:20-49). The EMA
    coefficients (0.1 in / 0.85 out) are constants on both sides
    (ema.py:18-20 buffers vs ops/norms.ema_scan args).
    """
    params: Dict[str, dict] = {
        "context": {"kernel": _np(state_dict["context.weight"]).T,
                    "bias": _np(state_dict["context.bias"])},
    }
    batch_stats: Dict[str, dict] = {}
    for n in range(n_layers):
        linear = {"kernel": _np(state_dict[f"model.{n}.model.0.weight"]).T}
        if f"model.{n}.model.0.bias" in state_dict:
            linear["bias"] = _np(state_dict[f"model.{n}.model.0.bias"])
        params[f"linear_{n}"] = linear
        bn_p, bn_s = _bn2d(state_dict, f"model.{n}.model.1")
        params[f"bn_{n}"] = bn_p
        batch_stats[f"bn_{n}"] = bn_s
    return params, batch_stats


# ---------------------------------------------------------------------------
# Demucs (reference src/model/demucs.py:52-491)
# ---------------------------------------------------------------------------

def _conv1d_k(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 1, 0),
            "bias": _np(sd[f"{prefix}.bias"])}


def _tconv1d(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    kernel = _np(sd[f"{prefix}.weight"])[:, :, ::-1]  # ConvTranspose1d flip
    return {"kernel": np.ascontiguousarray(kernel.transpose(2, 0, 1)),
            "bias": _np(sd[f"{prefix}.bias"])}


def _gn(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"])}


def _blstm(sd: Mapping[str, np.ndarray], prefix: str, layers: int) -> Dict[str, dict]:
    out: Dict[str, dict] = {}
    for k in range(layers):
        for suffix, name in (("", f"l{k}_fwd"), ("_reverse", f"l{k}_bwd")):
            out[name] = {
                "w_ih": _np(sd[f"{prefix}.lstm.weight_ih_l{k}{suffix}"]).T,
                "w_hh": _np(sd[f"{prefix}.lstm.weight_hh_l{k}{suffix}"]).T,
                "b_ih": _np(sd[f"{prefix}.lstm.bias_ih_l{k}{suffix}"]),
                "b_hh": _np(sd[f"{prefix}.lstm.bias_hh_l{k}{suffix}"]),
            }
    out["linear"] = {"kernel": _np(sd[f"{prefix}.linear.weight"]).T,
                     "bias": _np(sd[f"{prefix}.linear.bias"])}
    return out


def _demucs_dconv(sd: Mapping[str, np.ndarray], base: str, depth: int,
                  attn: bool, lstm: bool, norm: bool = True) -> Dict[str, dict]:
    """DConv residual branch (demucs.py:139-208): per layer the Sequential
    is [conv, norm, act, (BLSTM), (LocalState), 1x1, norm, GLU,
    LayerScale] — the optional modules shift the later indices."""
    out: Dict[str, dict] = {}
    for d in range(depth):
        p = f"{base}.layers.{d}"
        j = 3
        out[f"d{d}_conv"] = _conv1d_k(sd, f"{p}.0")
        if norm:
            out[f"d{d}_norm1"] = _gn(sd, f"{p}.1")
        if lstm:
            out[f"d{d}_lstm"] = _blstm(sd, f"{p}.{j}", layers=2)
            j += 1
        if attn:
            a = f"{p}.{j}"
            attn_params = {
                name: _conv1d_k(sd, f"{a}.{name}")
                for name in ("content", "query", "key", "proj")
            }
            if f"{a}.query_decay.weight" in sd:
                attn_params["query_decay"] = _conv1d_k(sd, f"{a}.query_decay")
            out[f"d{d}_attn"] = attn_params
            j += 1
        out[f"d{d}_rewrite"] = _conv1d_k(sd, f"{p}.{j}")
        if norm:
            out[f"d{d}_norm2"] = _gn(sd, f"{p}.{j + 1}")
        out[f"d{d}_scale"] = {"scale": _np(sd[f"{p}.{j + 3}.scale"])}
    return out


def demucs_from_torch_state(
    state_dict: Mapping[str, np.ndarray],
    depth: int = 6,
    norm_starts: int = 4,
    dconv_attn: int = 4,
    dconv_lstm: int = 4,
    dconv_depth: int = 2,
    dconv_mode: int = 1,
    lstm_layers: int = 0,
) -> Tuple[dict, dict]:
    """Reference Demucs state_dict -> (params, {}) for
    :class:`speech_enhancement_tpu.models.demucs.Demucs`.

    Sequential index layout follows the constructor
    (demucs.py:362-425); note torch's ``decoder`` ModuleList is built
    with ``insert(0, ...)`` so list position p corresponds to original
    index ``depth - 1 - p``.
    """
    params: Dict[str, dict] = {}
    for i in range(depth):
        use_norm = i >= norm_starts
        params[f"enc_{i}_conv"] = _conv1d_k(state_dict, f"encoder.{i}.0")
        if use_norm:
            params[f"enc_{i}_norm"] = _gn(state_dict, f"encoder.{i}.1")
        j = 3
        if dconv_mode & 1:
            params[f"enc_{i}_dconv"] = _demucs_dconv(
                state_dict, f"encoder.{i}.{j}", dconv_depth,
                attn=i >= dconv_attn, lstm=i >= dconv_lstm)
            j += 1
        params[f"enc_{i}_rewrite"] = _conv1d_k(state_dict, f"encoder.{i}.{j}")
        if use_norm:
            params[f"enc_{i}_rwnorm"] = _gn(state_dict, f"encoder.{i}.{j + 1}")

        p = depth - 1 - i  # torch decoder list position for index i
        use_norm = i >= norm_starts
        params[f"dec_{i}_rewrite"] = _conv1d_k(state_dict, f"decoder.{p}.0")
        if use_norm:
            params[f"dec_{i}_rwnorm"] = _gn(state_dict, f"decoder.{p}.1")
        j = 3
        if dconv_mode & 2:
            params[f"dec_{i}_dconv"] = _demucs_dconv(
                state_dict, f"decoder.{p}.{j}", dconv_depth,
                attn=i >= dconv_attn, lstm=i >= dconv_lstm)
            j += 1
        params[f"dec_{i}_tconv"] = _tconv1d(state_dict, f"decoder.{p}.{j}")
        if i > 0 and use_norm:
            params[f"dec_{i}_norm"] = _gn(state_dict, f"decoder.{p}.{j + 1}")
    if lstm_layers:
        params["lstm"] = _blstm(state_dict, "lstm", lstm_layers)
    return params, {}


# ---------------------------------------------------------------------------
# Sepformer (reference src/model/sepformer/, vendored speechbrain)
# ---------------------------------------------------------------------------

def _sb_mha(sd: Mapping[str, np.ndarray], prefix: str, nhead: int) -> Dict[str, dict]:
    """torch nn.MultiheadAttention -> flax MHA param-tree (query/key/value
    DenseGeneral [E, H, D] + out [H, D, E])."""
    w = _np(sd[f"{prefix}.in_proj_weight"])  # [3E, E]
    b = _np(sd[f"{prefix}.in_proj_bias"])
    embed = w.shape[1]
    head = embed // nhead
    out: Dict[str, dict] = {}
    for i, name in enumerate(("query", "key", "value")):
        out[name] = {
            "kernel": w[i * embed:(i + 1) * embed].T.reshape(embed, nhead, head),
            "bias": b[i * embed:(i + 1) * embed].reshape(nhead, head),
        }
    out["out"] = {
        "kernel": _np(sd[f"{prefix}.out_proj.weight"]).T.reshape(nhead, head, embed),
        "bias": _np(sd[f"{prefix}.out_proj.bias"]),
    }
    return out


def _sb_transformer_block(sd: Mapping[str, np.ndarray], prefix: str,
                          num_layers: int, nhead: int) -> Dict[str, dict]:
    """SBTransformerBlock.mdl (TransformerEncoder) -> SBTransformerBlock."""
    def ln(key):
        return {"scale": _np(sd[f"{key}.norm.weight"]),
                "bias": _np(sd[f"{key}.norm.bias"])}

    out: Dict[str, dict] = {}
    for j in range(num_layers):
        p = f"{prefix}.layers.{j}"
        out[f"layer_{j}"] = {
            "mha": _sb_mha(sd, f"{p}.self_att.att", nhead),
            "ln1": ln(f"{p}.norm1"),
            "ln2": ln(f"{p}.norm2"),
            "ffn1": {"kernel": _np(sd[f"{p}.pos_ffn.ffn.0.weight"]).T,
                     "bias": _np(sd[f"{p}.pos_ffn.ffn.0.bias"])},
            "ffn2": {"kernel": _np(sd[f"{p}.pos_ffn.ffn.3.weight"]).T,
                     "bias": _np(sd[f"{p}.pos_ffn.ffn.3.bias"])},
        }
    out["norm"] = ln(f"{prefix}.norm")
    return out


def sepformer_from_torch_state(
    state_dict: Mapping[str, np.ndarray],
    masknet_numlayers: int = 2,
    intra_numlayers: int = 8,
    inter_numlayers: int = 8,
    intra_nhead: int = 8,
    inter_nhead: int = 8,
) -> Tuple[dict, dict]:
    """Reference SepformerSeparation state_dict -> (params, {}) for
    :class:`speech_enhancement_tpu.models.sepformer.Sepformer`.

    Note the reference's TransformerEncoder LayerNorms vendor speechbrain's
    ``LayerNorm`` wrapper, whose parameter lives under ``.norm`` (hence the
    ``norm1.norm.weight``-style keys). ``select_norm("ln")`` GroupNorms map
    onto the GlobalLayerNorm gamma/beta.
    """
    def gln(key):
        return {"gamma": _np(sd_get(f"{key}.weight")),
                "beta": _np(sd_get(f"{key}.bias"))}

    def sd_get(key):
        return state_dict[key]

    params: Dict[str, dict] = {
        "encoder": {"kernel": _np(state_dict["encoder.conv1d.weight"]).transpose(2, 1, 0)},
        "input_norm": gln("masknet.norm"),
        "input_proj": {"kernel": _np(state_dict["masknet.conv1d.weight"])[:, :, 0].T},
        "prelu": {"alpha": _np(state_dict["masknet.prelu.weight"])},
        "spk_expand": {
            "kernel": _np(state_dict["masknet.conv2d.weight"])[:, :, 0, 0].T,
            "bias": _np(state_dict["masknet.conv2d.bias"]),
        },
        "end_proj": {"kernel": _np(state_dict["masknet.end_conv1x1.weight"])[:, :, 0].T},
        "output": {
            "kernel": _np(state_dict["masknet.output.0.weight"]).transpose(2, 1, 0),
            "bias": _np(state_dict["masknet.output.0.bias"]),
        },
        "output_gate": {
            "kernel": _np(state_dict["masknet.output_gate.0.weight"]).transpose(2, 1, 0),
            "bias": _np(state_dict["masknet.output_gate.0.bias"]),
        },
        "decoder": {
            "kernel": np.ascontiguousarray(
                _np(state_dict["decoder.weight"])[:, :, ::-1].transpose(2, 0, 1)),
        },
    }
    for i in range(masknet_numlayers):
        p = f"masknet.dual_mdl.{i}"
        params[f"dual_{i}"] = {
            "intra": _sb_transformer_block(
                state_dict, f"{p}.intra_mdl.mdl", intra_numlayers, intra_nhead),
            "inter": _sb_transformer_block(
                state_dict, f"{p}.inter_mdl.mdl", inter_numlayers, inter_nhead),
            "intra_norm": gln(f"{p}.intra_norm"),
            "inter_norm": gln(f"{p}.inter_norm"),
        }
    return params, {}


def params_from_torch_checkpoint(path: str, model_cfg) -> Tuple[dict, dict]:
    """Load a reference ``.pth``/``.tar`` checkpoint and convert it for the
    model named in ``model_cfg`` (a config mapping with ``.get``).

    The config-driven face of the per-family converters above: this is what
    lets ``solver.preloaded_model: <reference .pth>`` work directly, the
    migration analogue of the reference's own weights-only preload
    (src/solver.py:262-279). tcn has nothing to import (the reference's
    tcn.py is an unimplemented stub).
    """
    sd = load_torch_checkpoint(path)
    get = model_cfg.get
    name = get("name")
    if name == "dccrn":
        kernel_num = get("kernel_num", (16, 32, 64, 128, 256, 256))
        return dccrn_from_torch_state(
            sd, n_encoder=len(tuple(kernel_num)),
            rnn_layers=int(get("rnn_layers", 2)))
    if name == "mel-rnn":
        return mel_rnn_from_torch_state(
            sd, rnn_layer=int(get("rnn_layer", 2)),
            rnn_type=str(get("rnn_type", "rnn")))
    if name == "rnn-stft-mask":
        return rnn_stft_mask_from_torch_state(
            sd, rnn_layer=int(get("rnn_layer", 2)),
            rnn_type=str(get("rnn_type", "rnn")),
            bidirectional=bool(get("bidirectional", False)))
    if name == "crn":
        return crn_from_torch_state(sd)
    if name == "unet":
        return unet_from_torch_state(
            sd, unet_layer=int(get("unet_layer", 4)),
            bilinear=bool(get("bilinear", False)))
    if name == "dcunet":
        return dcunet_from_torch_state(sd, model_depth=int(get("model_depth", 10)))
    if name == "dnn":
        return dnn_from_torch_state(sd, n_layers=int(get("n_layers", 4)))
    if name == "wav-unet":
        return wav_unet_from_torch_state(
            sd, unet_nlayers=int(get("unet_nlayers", 12)))
    if name == "conv-tasnet":
        return conv_tasnet_from_torch_state(
            sd, R=int(get("R", 2)), X=int(get("X", 7)),
            skip=bool(get("skip", False)))
    if name == "demucs":
        return demucs_from_torch_state(
            sd, depth=int(get("depth", 6)),
            norm_starts=int(get("norm_starts", 4)),
            dconv_attn=int(get("dconv_attn", 4)),
            dconv_lstm=int(get("dconv_lstm", 4)),
            dconv_depth=int(get("dconv_depth", 2)),
            dconv_mode=int(get("dconv_mode", 1)),
            lstm_layers=int(get("lstm_layers", 0)))
    if name == "sepformer":
        return sepformer_from_torch_state(
            sd, masknet_numlayers=int(get("masknet_numlayers", 2)),
            intra_numlayers=int(get("intra_numlayers", 8)),
            inter_numlayers=int(get("inter_numlayers", 8)),
            intra_nhead=int(get("intra_nhead", 8)),
            inter_nhead=int(get("inter_nhead", 8)))
    raise ValueError(
        f"no torch-checkpoint importer for model {name!r} "
        "(tcn is an unimplemented stub in the reference)")
