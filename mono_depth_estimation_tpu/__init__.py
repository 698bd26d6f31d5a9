"""mono_depth_estimation_tpu — a TPU-native monocular depth estimation framework.

A from-scratch JAX / Flax / Pallas re-design of the capabilities of
xeTaiz/mono-depth-estimation (PyTorch + PyTorch Lightning):

* 7 registered depth-estimation methods (eigen, laina/FCRN, bts, dorn, midas,
  vnl, my) + sharpnet, as Flax modules running in NHWC layout on the MXU.
* 6 dataset families (nyu, floorplan3d, structured3d, stdepth, stdepthmulti,
  stdepthmulti2) behind a host-side loader + device-side fused preprocessing.
* The full loss library (criteria.py of the reference) as pure jnp functions
  with masked (static-shape) reductions.
* The metric suite (metrics.py of the reference) computed on device,
  including the reference's nonstandard 'rmse' formula for parity.
* Layered RGBA+Depth ("stdepth") compositing utilities as vectorized ops.
* Data-parallel training over a jax.sharding.Mesh with bf16 compute policy.

Layout convention: images are NHWC (TPU-native); layer stacks for the
stdepth pipeline are (B, L, H, W, C). The reference uses NCHW/(B,L,C,H,W);
converters live at the IO boundary.
"""

__version__ = "0.1.0"
