"""xrsfm_tpu — a TPU-native incremental Structure-from-Motion framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of openxrlab/xrsfm
(reference layout documented in SURVEY.md): SIFT feature extraction, pairwise
descriptor matching with covisibility-based match expansion, RANSAC two-view
geometry, incremental mapping (P3P registration, multi-view triangulation,
track processing), and a from-scratch Levenberg-Marquardt bundle adjuster with
Schur-complement reduction replacing Ceres — all batched for the TPU MXU/VPU,
with multi-chip scale-out expressed via jax.sharding meshes.
"""

__version__ = "0.1.0"
