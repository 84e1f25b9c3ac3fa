"""Real-time serving: streaming (frame-in/frame-out) enhancement.

The reference framework is batch-only — inference segments a whole
utterance and stitches windows (src/evaluate.py:10-98). This subpackage
adds what a production deployment of a *causal* enhancer actually serves:
a stateful stream that consumes fixed-size audio chunks and emits enhanced
audio with a fixed algorithmic latency, bit-matching the offline forward.
"""

from speech_enhancement_tpu.serve.streaming import CRNStreamer, DCCRNStreamer

__all__ = ["CRNStreamer", "DCCRNStreamer"]
