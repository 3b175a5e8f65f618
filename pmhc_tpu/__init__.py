"""pmhc_tpu: a TPU-native JAX framework for pMHC peptide-backbone diffusion.

A ground-up re-design of the capabilities of cmbi/pmhc-diffusion-model
(reference: /root/reference) for TPU hardware:

- Quaternion-native SE(3) geometry (``pmhc_tpu.geometry``): no
  eigendecomposition in any hot path (the reference pays a 4x4 ``eigh``
  per matrix->quat conversion inside its forward pass,
  reference ``diffusion/model.py:125-133`` via OpenFold's dual-backed
  ``Rotation``). Rotations here are always scalar-first quaternions.
- Fixed-shape, fully jittable compute: the whole train step is one jitted,
  donated function; the 1000-step reverse-diffusion sampler is a single
  ``lax.scan`` (the reference runs a Python ``while`` loop with one model
  forward per iteration, reference ``diffusion/optimizer.py:236-249``).
- SPMD scaling via ``jax.sharding.Mesh`` + ``shard_map`` with ``psum``
  gradient reduction over ICI (``pmhc_tpu.parallel``). The reference is
  single-process, single-device.
- Host-side HDF5 ingestion with threaded prefetch + double buffering
  (``pmhc_tpu.data``), replicating the SwiftMHC schema and the reference's
  exact padding policy (reference ``diffusion/data.py:35-119``).
"""

__version__ = "0.1.0"
