"""Hearing-aid processing chain (Clarity challenge): NAL-R EQ + compressor."""

from speech_enhancement_tpu.ha.amplifier import NALR  # noqa: F401
from speech_enhancement_tpu.ha.audio import amplify, convert_audio_channels  # noqa: F401
from speech_enhancement_tpu.ha.compressor import Compressor  # noqa: F401
