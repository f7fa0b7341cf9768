"""4K-NeRF TPU: a TPU-native (JAX/XLA/Pallas/pjit) rebuild of the 4K-NeRF pipeline.

Two-stage neural radiance field pipeline:

1. VC-Encoder: DVGO-style voxel-grid radiance fields (dense density grid +
   feature grid + shallow MLP), optimized per scene with direct voxel
   optimization (reference: /root/reference/lib/dvgo.py, lib/dmpigo.py).
2. VC-Decoder: RRDB super-resolution network with SFT conditioning that
   upsamples rendered feature maps 4x to 4K, trained jointly under
   L1 + perceptual + GAN losses (reference: /root/reference/run_sr.py,
   lib/sr_esrnet.py).

This package is a ground-up TPU-first redesign, NOT a port: ray marching is
fixed-shape `[rays, samples]` masked compute (exactly equivalent to the
reference's ragged compaction -- a dropped sample contributes alpha=0, which
leaves the transmittance product unchanged), compositing is a cumprod scan
along the sample axis instead of `segment_coo` scatters, and the hot path is
fused by XLA/Pallas instead of hand-written CUDA.
"""

__version__ = "0.1.0"
