"""Measured-negative Pallas kernels kept for the record, NOT shipped paths.

conv_block.py: blocked-banded fused DCCRN conv/deconv kernels. Measured
WORSE than the XLA path at every operating point that matters — batch 16:
69.2 vs 65.2 ms; batch-128 knee round 3: 565.9 vs 300.0 ms; re-measured
round 4 AFTER the split-weight skip join landed in the XLA path: 563.0 vs
260.3 ms (2.16x worse; per-row banded-matmul issue overhead scales with
batch while XLA's conv padding waste amortizes). The kernels' one
transferable idea — computing the decoder skip join without materializing
the concatenated tensor via split-weight tap matmuls — WAS ported back to
the shipped XLA path (models/dccrn.py _ComplexDeconvBlock), worth +15%
throughput and the removal of the batch-knee OOM constraint. Kept under
experimental/ with tests as an honest negative result; `use_fused_blocks`
stays default-off everywhere.
"""

from speech_enhancement_tpu.ops.pallas.experimental import conv_block

__all__ = ["conv_block"]
