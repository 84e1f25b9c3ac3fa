"""Device-side signal ops and shared neural building blocks (TPU-first)."""

from speech_enhancement_tpu.ops.frame import frame_signal, overlap_add  # noqa: F401
from speech_enhancement_tpu.ops.stft import (  # noqa: F401
    hann_window,
    istft,
    istft_custom,
    stft,
    stft_custom,
)
