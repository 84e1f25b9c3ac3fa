"""speech_enhancement_tpu — a TPU-native speech-enhancement framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
ooshyun/Speech-Enhancement-Pytorch (reference mounted at /root/reference):
training and evaluation of speech-enhancement / speech-separation models on
VoiceBank-DEMAND and Clarity-2023-style datasets.

Design stance (TPU-first, not a port):
  * models are pure flax.linen modules dispatched on a declared
    ``SignalSpec`` (domain / sources / channels), replacing the reference's
    model-name string sets (reference: src/model/types.py:1-6);
  * the STFT front-end is an MXU-friendly framed matmul / XLA FFT
    (reference: src/evaluate.py:101-162, torch.stft);
  * recurrences are ``lax.scan`` with hoisted input projections
    (reference: cuDNN LSTM + Python EMA loop, src/model/ema.py:24-40);
  * data parallelism is SPMD ``shard_map`` over a ``jax.sharding.Mesh``
    with ``psum`` gradient sync (reference: torch.nn.DataParallel,
    src/solver.py:144-145);
  * shapes are static everywhere under ``jit`` (pad + mask), replacing the
    reference's data-dependent effective batch (src/distrib.py:38-98).
"""

__version__ = "0.1.0"

from speech_enhancement_tpu.config import Config, load_yaml  # noqa: F401
