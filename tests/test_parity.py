"""Full-model waveform parity vs the reference PyTorch implementation.

BASELINE.md promises "bit-comparable within float tolerance": load the
reference DCCRN's torch weights into the flax DCCRN via
speech_enhancement_tpu.compat and assert the two frameworks produce the
same waveform on the same input. This pins every layout/convention choice
(ConvSTFT basis, causal pads, complex conv combination, CBN whitening,
LSTM gate order, transposed-conv flip, masking mode 'E', iSTFT envelope).

The reference source itself is only available in the build image; the test
skips cleanly elsewhere. It imports the reference module (torch code) to
EXECUTE it as a golden oracle — no reference code is copied.
"""

import importlib.util
import os

import numpy as np
import pytest

REF_DCCRN = "/root/reference/src/model/dccrn.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_DCCRN), reason="reference repo not present"
)


def _load_reference_dccrn():
    spec = importlib.util.spec_from_file_location("ref_dccrn", REF_DCCRN)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("masking_mode", ["E", "C", "R"])
def test_dccrn_waveform_parity_with_torch(masking_mode, rng):
    import torch

    import jax
    from speech_enhancement_tpu.compat import dccrn_from_torch_state
    from speech_enhancement_tpu.models.dccrn import DCCRN

    mod = _load_reference_dccrn()
    kernel_num = [16, 32, 64]  # stacked (r,i) channels, reference arg style
    torch_model = mod.DCCRN(
        rnn_layers=2, rnn_units=64, masking_mode=masking_mode,
        use_clstm=True, kernel_num=kernel_num,
    )
    torch_model.eval()

    wav = rng.standard_normal((1, 16000)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref_out = torch_model(torch.from_numpy(wav))
        if isinstance(ref_out, (tuple, list)):
            ref_out = ref_out[-1]
        ref_out = ref_out.numpy()

    params, batch_stats = dccrn_from_torch_state(
        torch_model.state_dict(), n_encoder=len(kernel_num), rnn_layers=2
    )
    flax_model = DCCRN(
        rnn_layers=2, rnn_units=64, masking_mode=masking_mode,
        kernel_num=tuple(kernel_num),
    )
    out = flax_model.apply(
        {"params": params, "batch_stats": batch_stats},
        jax.numpy.asarray(wav), train=False,
    )
    out = np.asarray(out)

    n = min(out.shape[-1], ref_out.shape[-1])
    np.testing.assert_allclose(
        out.reshape(-1)[:n], ref_out.reshape(-1)[:n], atol=2e-4,
        err_msg=f"DCCRN masking_mode={masking_mode} diverged from torch reference",
    )


def test_dccrn_parity_training_stats_mode(rng):
    """Same check with train=True batch stats (the path training uses)."""
    import torch

    import jax
    from speech_enhancement_tpu.compat import dccrn_from_torch_state
    from speech_enhancement_tpu.models.dccrn import DCCRN

    mod = _load_reference_dccrn()
    kernel_num = [16, 32]
    torch_model = mod.DCCRN(rnn_layers=1, rnn_units=32, masking_mode="E",
                            use_clstm=True, kernel_num=kernel_num)
    torch_model.train()
    wav = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref_out = torch_model(torch.from_numpy(wav))
        if isinstance(ref_out, (tuple, list)):
            ref_out = ref_out[-1]
        ref_out = ref_out.numpy()

    params, batch_stats = dccrn_from_torch_state(
        torch_model.state_dict(), n_encoder=2, rnn_layers=1
    )
    flax_model = DCCRN(rnn_layers=1, rnn_units=32, masking_mode="E",
                       kernel_num=(16, 32))
    out, _ = flax_model.apply(
        {"params": params, "batch_stats": batch_stats},
        jax.numpy.asarray(wav), train=True, mutable=["batch_stats"],
    )
    out = np.asarray(out)
    n = min(out.shape[-1], ref_out.shape[-1])
    # 1e-3: the flax mask head uses the trig-free identity (pole-free
    # gradients, models/dccrn.py) which differs from the reference's
    # arctan2/cos/sin composition by O(eps / |M|) in near-zero-mask bins.
    np.testing.assert_allclose(
        out.reshape(-1, out.shape[-1])[:, :n],
        ref_out.reshape(-1, ref_out.shape[-1])[:, :n], atol=1e-3,
    )


# ---------------------------------------------------------------------------
# MelRNN + Conv-TasNet waveform/mask parity (round-3: pin two more families)
# ---------------------------------------------------------------------------

REF_MEL_RNN = "/root/reference/src/model/mel_rnn.py"
REF_CONV_TASNET = "/root/reference/src/model/conv_tasnet.py"


def _load_reference_module(path, name):
    import sys
    import types

    if name == "ref_mel_rnn" and "torchaudio" not in sys.modules:
        # the reference imports torchaudio at module top but only touches it
        # when n_mels > 0; this image has no torchaudio wheel, so inject a
        # stub (the parity config uses n_mels=0 — MelScale never constructed)
        ta = types.ModuleType("torchaudio")
        tf = types.ModuleType("torchaudio.transforms")
        tf.MelScale = tf.InverseMelScale = object
        ta.transforms = tf
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.transforms"] = tf
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("rnn_type", ["lstm", "gru", "rnn"])
def test_mel_rnn_parity_with_torch(rnn_type, rng):
    """Executed-reference parity for the MelRNN family (n_mels=0 path):
    pins the RNN mats/gate order, BatchNorm1d mapping, the two FC layers,
    the |re^2-im^2| amplitude quirk, AND the reference's batch_first=False
    recurrence-over-batch execution (rnn_over_batch_compat)."""
    import torch

    from speech_enhancement_tpu.compat import mel_rnn_from_torch_state
    from speech_enhancement_tpu.models.mel_rnn import MelRNN

    mod = _load_reference_module(REF_MEL_RNN, "ref_mel_rnn")
    torch_model = mod.MelRNN(n_fft=256, n_mels=0, rnn_hidden=32,
                             rnn_layer=2, rnn_type=rnn_type)
    torch_model.eval()

    # [B, 1, F, T, 2] complex-as-last-dim spectrogram input
    x = rng.standard_normal((3, 1, 129, 20, 2)).astype(np.float32)
    with torch.no_grad():
        ref_out = torch_model(torch.from_numpy(x)).numpy()

    params, batch_stats = mel_rnn_from_torch_state(
        torch_model.state_dict(), rnn_layer=2, rnn_type=rnn_type)
    model = MelRNN(n_fft=256, n_mels=0, rnn_hidden=32, rnn_layer=2,
                   rnn_type=rnn_type, rnn_over_batch_compat=True)
    out = model.apply({"params": params, "batch_stats": batch_stats},
                      np.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-5, rtol=2e-4)


@pytest.mark.parametrize("skip", [False, True])
def test_conv_tasnet_parity_with_torch(skip, rng):
    """Executed-reference waveform parity for Conv-TasNet: pins the
    encoder/decoder basis conventions, depthwise-separable block layout,
    cLN/gLN affine mapping, mask nonlinearity, and the overlap-add
    (reference conv_tasnet.py:157-204 vs the scatter-free OLA)."""
    import torch

    from speech_enhancement_tpu.compat import conv_tasnet_from_torch_state
    from speech_enhancement_tpu.models.conv_tasnet import ConvTasNet

    mod = _load_reference_module(REF_CONV_TASNET, "ref_conv_tasnet")
    kwargs = dict(N=32, L=16, B=16, H=24, P=3, X=3, R=2, audio_channels=1,
                  norm_type="gLN")
    torch_model = mod.ConvTasNet(sources=["a", "b"], skip=skip, **kwargs)
    torch_model.eval()

    wav = rng.standard_normal((2, 1, 4000)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref_out = torch_model(torch.from_numpy(wav)).numpy()

    params, _ = conv_tasnet_from_torch_state(
        torch_model.state_dict(), R=2, X=3, skip=skip)
    model = ConvTasNet(sources=("a", "b"), skip=skip, **kwargs)
    out = model.apply({"params": params}, np.asarray(wav), train=False)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-5, rtol=2e-4)


REF_STFT_RNN = "/root/reference/src/model/stft_rnn.py"


@pytest.mark.parametrize("rnn_type,bidirectional",
                         [("lstm", False), ("gru", True)])
def test_rnn_stft_mask_parity_with_torch(rnn_type, bidirectional, rng):
    """Executed-reference parity for the multi-speaker STFT masker: pins
    the (bi)RNN stack (incl. _reverse-direction weights), BatchNorm1d,
    the FC head, the speaker un-merge reshapes, and the recurrence-over-
    batch quirk (rnn_over_batch_compat — same class as MelRNN's)."""
    import torch

    from speech_enhancement_tpu.compat import rnn_stft_mask_from_torch_state
    from speech_enhancement_tpu.models.stft_rnn import RNNSTFTMask

    mod = _load_reference_module(REF_STFT_RNN, "ref_stft_rnn")
    torch_model = mod.RNNBaseSTFTMask(n_fft=256, num_spk=2, rnn_hidden=32,
                               rnn_layer=2, rnn_type=rnn_type, drop_out=0.0,
                               bidirectional=bidirectional)
    torch_model.eval()

    x = rng.standard_normal((2, 2, 129, 12, 2)).astype(np.float32)
    with torch.no_grad():
        ref_out = torch_model(torch.from_numpy(x)).numpy()

    params, batch_stats = rnn_stft_mask_from_torch_state(
        torch_model.state_dict(), rnn_layer=2, rnn_type=rnn_type,
        bidirectional=bidirectional)
    model = RNNSTFTMask(n_fft=256, num_spk=2, rnn_hidden=32, rnn_layer=2,
                        rnn_type=rnn_type, drop_out=0.0,
                        bidirectional=bidirectional,
                        rnn_over_batch_compat=True)
    out = model.apply({"params": params, "batch_stats": batch_stats},
                      np.asarray(x), train=False)
    # reference returns [B, S, C, F, T, 2]; ours matches that contract
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-5, rtol=2e-4)


REF_CRN = "/root/reference/src/model/crn.py"


def test_crn_parity_with_torch(rng):
    """Executed-reference parity for CRN: pins the causal conv/trans-conv
    pad+chomp arithmetic, BatchNorm2d mapping, the channel-major LSTM
    flatten (crn.py:115-124), the transposed-kernel flip, the
    output_padding row (bias-only — block-level bias param), and the
    sqrt(re^2 - im^2) amplitude quirk (amplitude_compat)."""
    import torch

    from speech_enhancement_tpu.compat import crn_from_torch_state
    from speech_enhancement_tpu.models.crn import CRN

    mod = _load_reference_module(REF_CRN, "ref_crn")
    torch_model = mod.CRN(use_lstm=True)
    torch_model.eval()

    # amplitude_compat computes sqrt(re^2 - im^2): keep |re| > |im| so the
    # reference itself stays finite (its README flags training as broken)
    re = (1.0 + rng.random((2, 1, 257, 12))).astype(np.float32)
    im = (0.5 * rng.random((2, 1, 257, 12))).astype(np.float32)
    x = np.stack([re, im], axis=-1)
    with torch.no_grad():
        ref_out = torch_model(torch.from_numpy(x)).numpy()

    params, batch_stats = crn_from_torch_state(torch_model.state_dict())
    model = CRN(use_lstm=True, amplitude_compat=True)
    out = model.apply({"params": params, "batch_stats": batch_stats},
                      np.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=5e-4, rtol=5e-4)


REF_WAV_UNET = "/root/reference/src/model/wav_unet.py"


def test_wav_unet_parity_with_torch(rng):
    """Executed-reference parity for Wave-U-Net: pins the Conv1d+BN
    sandwiches, stride-2 decimation, align_corners 2x linear upsampling,
    skip-concat channel order, and the tanh head."""
    import torch

    from speech_enhancement_tpu.compat import wav_unet_from_torch_state
    from speech_enhancement_tpu.models.wav_unet import WavUNet

    mod = _load_reference_module(REF_WAV_UNET, "ref_wav_unet")
    torch_model = mod.WavUnet(unet_nlayers=6, channels_interval=8)
    torch_model.eval()

    wav = (rng.standard_normal((2, 1, 1024)) * 0.3).astype(np.float32)
    with torch.no_grad():
        ref_out = torch_model(torch.from_numpy(wav)).numpy()

    params, batch_stats = wav_unet_from_torch_state(
        torch_model.state_dict(), unet_nlayers=6)
    model = WavUNet(unet_nlayers=6, channels_interval=8)
    out = model.apply({"params": params, "batch_stats": batch_stats},
                      np.asarray(wav), train=False)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-5, rtol=2e-4)


REF_UNET = "/root/reference/src/model/unet.py"


@pytest.mark.parametrize("bilinear", [False, True])
def test_unet_parity_with_torch(bilinear, rng):
    """Executed-reference parity for UNet: pins the DoubleConv/Down/Up
    wiring, BatchNorm2d mapping, the 2x2 transposed-conv flip (or the
    align_corners bilinear upsampling), skip-concat order, the
    center-pad, and the power-amplitude quirk (|re^2 + im^2|,
    unet.py:40)."""
    import torch

    from speech_enhancement_tpu.compat import unet_from_torch_state
    from speech_enhancement_tpu.models.unet import UNet

    mod = _load_reference_module(REF_UNET, "ref_unet")
    torch_model = mod.UNet(unet_channels=1, unet_layer=2, bilinear=bilinear)
    torch_model.eval()

    x = (rng.standard_normal((2, 1, 64, 32, 2)) * 0.5).astype(np.float32)
    with torch.no_grad():
        ref_out = torch_model(torch.from_numpy(x)).numpy()

    params, batch_stats = unet_from_torch_state(
        torch_model.state_dict(), unet_layer=2, bilinear=bilinear)
    model = UNet(unet_channels=1, unet_layer=2, bilinear=bilinear)
    out = model.apply({"params": params, "batch_stats": batch_stats},
                      np.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=5e-5, rtol=5e-4)


REF_DCUNET = "/root/reference/src/model/dcunet.py"


@pytest.mark.parametrize("masking_mode", ["E", "C"])
def test_dcunet_parity_with_torch(masking_mode, rng):
    """Executed-reference parity for DCUnet's complex path (data_type=True,
    depth 10) at the reference's demo geometry: pins the paired-real
    complex conv/tconv combination, per-part BatchNorm2d, the depth-10
    kernel/stride/padding tables, skip-concat order, and the E/C masking
    heads."""
    import torch

    from speech_enhancement_tpu.compat import dcunet_from_torch_state
    from speech_enhancement_tpu.models.dcunet import DCUnet

    mod = _load_reference_module(REF_DCUNET, "ref_dcunet")
    torch_model = mod.DCUnet(audio_channels=1, data_type=True,
                             model_complexity=12, model_depth=10,
                             masking_mode=masking_mode)
    torch_model.eval()

    # reference demo geometry (dcunet.py:__main__): F=257, T=65
    x = (rng.standard_normal((1, 1, 257, 65, 2)) * 0.5).astype(np.float32)
    with torch.no_grad():
        ref_out = torch_model(torch.from_numpy(x)).numpy()

    params, batch_stats = dcunet_from_torch_state(
        torch_model.state_dict(), model_depth=10)
    model = DCUnet(audio_channels=1, data_type=True, model_complexity=12,
                   model_depth=10, masking_mode=masking_mode)
    out = model.apply({"params": params, "batch_stats": batch_stats},
                      np.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=1e-4, rtol=1e-3)


REF_DNN = "/root/reference/src/model/dnn.py"
REF_EMA = "/root/reference/src/model/ema.py"


def test_dnn_parity_with_torch(rng):
    """Executed-reference parity for the DNN masker: pins the Linear+BN1d
    stack, the EMA context path (per-timestep torch loop vs the
    associative scan), and the mask head."""
    import importlib
    import sys
    import types

    import torch

    # dnn.py does ``from .ema import ...`` — give it a package home
    pkg = types.ModuleType("ref_model_pkg")
    pkg.__path__ = ["/root/reference/src/model"]
    sys.modules["ref_model_pkg"] = pkg
    spec = importlib.util.spec_from_file_location(
        "ref_model_pkg.ema", REF_EMA)
    ema_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ema_mod)
    sys.modules["ref_model_pkg.ema"] = ema_mod
    spec = importlib.util.spec_from_file_location("ref_model_pkg.dnn", REF_DNN)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from speech_enhancement_tpu.compat import dnn_from_torch_state
    from speech_enhancement_tpu.models.dnn import DNN

    torch_model = mod.DeepNeuralNetwork(
        n_layer=3, nfft=256, n_fft=256, hidden_layer=64, bias=True,
        activation="leaky-relu", drop_out=0.0, dnn_ema=True)
    torch_model.eval()

    x = (rng.standard_normal((2, 1, 129, 10, 2)) * 0.5).astype(np.float32)
    with torch.no_grad():
        ref_out = torch_model(torch.from_numpy(x)).numpy()

    params, batch_stats = dnn_from_torch_state(
        torch_model.state_dict(), n_layers=3)
    model = DNN(n_layers=3, n_fft=256, hidden_layer=64, bias=True,
                activation="leaky-relu", drop_out=0.0, dnn_ema=True)
    out = model.apply({"params": params, "batch_stats": batch_stats},
                      np.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-5, rtol=2e-4)


REF_DEMUCS = "/root/reference/src/model/demucs.py"


def test_demucs_parity_with_torch(rng):
    """Executed-reference parity for Demucs (resample=False — the
    reference's julius dependency is absent; the resampling is orthogonal
    to the weights): pins the encoder/decoder Sequential layouts, DConv
    residual branches incl. framed BLSTM and decay-windowed LocalState,
    GroupNorm/GLU/LayerScale mapping, transposed-kernel flip, skip
    center-trims, and the normalize/denormalize envelope."""
    import sys
    import types

    import torch

    if "julius" not in sys.modules:  # imported at demucs.py top, unused
        sys.modules["julius"] = types.ModuleType("julius")
    mod = _load_reference_module(REF_DEMUCS, "ref_demucs")

    from speech_enhancement_tpu.compat import demucs_from_torch_state
    from speech_enhancement_tpu.models.demucs import Demucs

    kwargs = dict(channels=8, growth=2.0, depth=3, kernel_size=8, stride=4,
                  norm_starts=1, norm_groups=2, dconv_attn=1, dconv_lstm=2,
                  dconv_depth=2, lstm_layers=2, audio_channels=1,
                  resample=False, normalize=True, rescale=0.1)
    torch_model = mod.Demucs(sources=["a", "b"], **kwargs)
    torch_model.eval()

    wav = (rng.standard_normal((2, 1, 1000)) * 0.3).astype(np.float32)
    with torch.no_grad():
        ref_out = torch_model(torch.from_numpy(wav)).numpy()

    params, _ = demucs_from_torch_state(
        torch_model.state_dict(), depth=3, norm_starts=1, dconv_attn=1,
        dconv_lstm=2, dconv_depth=2, lstm_layers=2)
    model = Demucs(sources=("a", "b"), **kwargs)
    out = model.apply({"params": params}, np.asarray(wav), train=False)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=1e-4, rtol=1e-3)


REF_SEPFORMER_DIR = "/root/reference/src/model/sepformer"


def test_sepformer_parity_with_torch(rng):
    """Executed-reference parity for Sepformer (the vendored speechbrain
    stack): pins the encoder/decoder filterbanks, the dual-path
    segmentation/overlap-add, per-layer pre-norm MHA+FFN wiring incl. the
    final stack LayerNorm and ReLU FFN, the GroupNorm('ln') mappings, the
    gated output head, and the [B, S, C, T] engine-contract reshape."""
    import sys
    import types

    import torch

    pkg = types.ModuleType("ref_sepformer_pkg")
    pkg.__path__ = [REF_SEPFORMER_DIR]
    sys.modules["ref_sepformer_pkg"] = pkg
    for name in ("normalization", "basic", "Transformer", "sepformer"):
        spec = importlib.util.spec_from_file_location(
            f"ref_sepformer_pkg.{name}", os.path.join(REF_SEPFORMER_DIR, f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"ref_sepformer_pkg.{name}"] = mod
        spec.loader.exec_module(mod)
    ref = sys.modules["ref_sepformer_pkg.sepformer"]

    from speech_enhancement_tpu.compat import sepformer_from_torch_state
    from speech_enhancement_tpu.models.sepformer import Sepformer

    kwargs = dict(encoder_kernel_size=16, encoder_in_nchannels=1,
                  encoder_out_nchannels=32, masknet_chunksize=50,
                  masknet_numlayers=2, masknet_numspks=2,
                  intra_numlayers=2, inter_numlayers=1,
                  intra_nhead=4, inter_nhead=4, intra_dffn=64, inter_dffn=64)
    torch_model = ref.SepformerSeparation(**kwargs)
    torch_model.eval()

    wav = (rng.standard_normal((2, 1, 2000)) * 0.3).astype(np.float32)
    with torch.no_grad():
        # reference contract: [B, T] in, [B, T, spks] out
        ref_out = torch_model(torch.from_numpy(wav[:, 0])).numpy()
    ref_out = np.transpose(ref_out, (0, 2, 1))[:, :, None, :]  # [B, S, 1, T]

    params, _ = sepformer_from_torch_state(
        torch_model.state_dict(), masknet_numlayers=2, intra_numlayers=2,
        inter_numlayers=1, intra_nhead=4, inter_nhead=4)
    model = Sepformer(**kwargs)
    out = model.apply({"params": params}, np.asarray(wav), train=False)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=1e-4, rtol=1e-3)


def test_params_from_torch_checkpoint_dispatch(rng, tmp_path):
    """The config-driven dispatcher (Solver .pth preload) must thread each
    family's architecture kwargs from the model config — exercised here on
    the two trickiest: UNet (bilinear) and Conv-TasNet (skip + R/X)."""
    import torch

    from speech_enhancement_tpu.compat import params_from_torch_checkpoint
    from speech_enhancement_tpu.config import Config
    from speech_enhancement_tpu.models.conv_tasnet import ConvTasNet
    from speech_enhancement_tpu.models.unet import UNet

    mod = _load_reference_module(REF_UNET, "ref_unet")
    torch_model = mod.UNet(unet_channels=1, unet_layer=2, bilinear=True)
    torch_model.eval()
    pth = str(tmp_path / "unet.pth")
    torch.save(torch_model.state_dict(), pth)
    cfg = Config({"name": "unet", "unet_channels": 1, "unet_layer": 2,
                  "bilinear": True})
    params, batch_stats = params_from_torch_checkpoint(pth, cfg)
    x = (rng.standard_normal((1, 1, 64, 16, 2)) * 0.5).astype(np.float32)
    with torch.no_grad():
        ref_out = torch_model(torch.from_numpy(x)).numpy()
    out = UNet(unet_channels=1, unet_layer=2, bilinear=True).apply(
        {"params": params, "batch_stats": batch_stats}, np.asarray(x),
        train=False)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=5e-5, rtol=5e-4)

    mod = _load_reference_module(REF_CONV_TASNET, "ref_conv_tasnet")
    kwargs = dict(N=16, L=16, B=16, H=32, P=3, X=2, R=3, audio_channels=1,
                  norm_type="gLN")
    torch_model = mod.ConvTasNet(sources=["a", "b"], skip=True, **kwargs)
    torch_model.eval()
    pth = str(tmp_path / "tasnet.pth")
    torch.save(torch_model.state_dict(), pth)
    cfg = Config({"name": "conv-tasnet", "R": 3, "X": 2, "skip": True})
    params, _ = params_from_torch_checkpoint(pth, cfg)
    wav = (rng.standard_normal((1, 1, 1600)) * 0.3).astype(np.float32)
    with torch.no_grad():
        ref_out = torch_model(torch.from_numpy(wav)).numpy()
    model = ConvTasNet(sources=("a", "b"), skip=True, **kwargs)
    out = model.apply({"params": params}, np.asarray(wav), train=False)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=1e-4, rtol=1e-3)
