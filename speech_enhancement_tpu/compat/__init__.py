"""Reference (PyTorch) checkpoint interop.

Lets users of the reference framework (ooshyun/Speech-Enhancement-Pytorch)
carry their trained ``.pth``/``.tar`` weights into this framework's flax
models. See :mod:`.torch_weights`.
"""

from speech_enhancement_tpu.compat.torch_weights import (  # noqa: F401
    conv_tasnet_from_torch_state,
    crn_from_torch_state,
    dccrn_from_torch_state,
    dcunet_from_torch_state,
    demucs_from_torch_state,
    dnn_from_torch_state,
    load_torch_checkpoint,
    mel_rnn_from_torch_state,
    params_from_torch_checkpoint,
    rnn_stft_mask_from_torch_state,
    sepformer_from_torch_state,
    unet_from_torch_state,
    wav_unet_from_torch_state,
)
