"""TripleD-TPU: a TPU-native self-supervised monocular depth estimation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
"TripleDNet: Exploring Depth Estimation with Self-Supervised Representation
Learning" (BMVC 2022; reference implementation is PyTorch/mmcv).

Layout (TPU-first design, not a port):
  ops/      pure-functional geometry / photometric / loss kernels (jnp + Pallas)
  models/   flax.linen encoders & decoders (NHWC layout, MXU-friendly convs)
  data/     KITTI & friends input pipeline (host-side numpy, device prefetch)
  train/    optax optimizer, jit+NamedSharding data-parallel train step, Orbax
  eval/     KITTI Eigen depth protocol, odometry ATE, Make3D
  cli/      train / eval_depth / infer entry points
"""

__version__ = "0.1.0"
