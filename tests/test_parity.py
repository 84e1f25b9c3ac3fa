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
