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


def enable_compilation_cache(path: str = "/root/.cache/xrsfm_tpu_jax"):
    """Enable JAX's persistent compilation cache — first-compile of the
    big kernels (SIFT pyramid, BA step) is minutes on a small host, and
    the cache makes it once-ever per shape."""
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    # persist EVERY compile: on this 2-vCPU host even "small" XLA
    # compiles cost ~0.5 s each, and a mapper run issues hundreds
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

