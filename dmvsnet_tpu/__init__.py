"""dmvsnet_tpu — a TPU-native multi-view-stereo framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
DMVSNet ("Constraining Depth Map Geometry for Multi-View Stereo: A
Dual-Depth Approach with Saddle-shaped Depth Cells", ICCV 2023),
designed TPU-first:

- channels-last (NHWC / NDHWC) layouts that map onto the MXU,
- a functional core (`apply(params, batch) -> outputs`) under `jax.jit`,
- SPMD scaling through `jax.sharding.Mesh` + GSPMD (data / spatial /
  view parallel), not hand-written collectives,
- Pallas kernels for the gather-heavy plane-sweep warp hot loop,
- host-side numpy pipelines for DTU / BlendedMVS / generic eval data.

Reference behavior citations in docstrings point into the upstream
PyTorch codebase (read-only at /root/reference) as `file:line`.
"""

__version__ = "0.1.0"
