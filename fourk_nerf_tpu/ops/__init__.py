"""TPU-native compute primitives: ray generation, grid sampling, volume
rendering math, regularizers. Pure JAX (XLA-fused) with Pallas kernels for
the hot paths in :mod:`fourk_nerf_tpu.ops.pallas`."""
