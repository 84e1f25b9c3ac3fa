"""Model capability declaration.

The reference dispatches input/output shapes on model-name string sets
(src/model/types.py:1-6: MULTI_SPEECH_SEPERATION_MODELS /
MONARCH_SPEECH_SEPARTAION_MODELS / STFT_MODELS / WAV_MODELS, consumed by
shape-policing code in src/solver.py:440-452 and src/evaluate.py). Here
every model *declares* a ``SignalSpec`` and the engine dispatches on it —
adding a model never touches engine code.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class SignalSpec:
    """What a model consumes and produces.

    domain: "stft" (input [B, C, F, T, 2]) or "wav" (input [B, C, T]).
    multi_speaker: output carries a speaker axis [B, S, C, ...].
    monarch: monaural model — engine squeezes the speaker axis of targets
             and merges batch x channel before the forward pass
             (reference solver.py:446-452).
    """

    domain: str = "wav"
    multi_speaker: bool = False
    monarch: bool = True

    def __post_init__(self):
        assert self.domain in ("stft", "wav"), self.domain
        assert not (self.multi_speaker and self.monarch)


STFT_MONO = SignalSpec(domain="stft", multi_speaker=False, monarch=True)
STFT_MULTI = SignalSpec(domain="stft", multi_speaker=True, monarch=False)
WAV_MONO = SignalSpec(domain="wav", multi_speaker=False, monarch=True)
WAV_MULTI = SignalSpec(domain="wav", multi_speaker=True, monarch=False)
