"""f2nerf_tpu: a TPU-native neural radiance field framework with the
capabilities of F2-NeRF (CVPR 2023, arxiv 2303.15951).

Built from scratch in JAX/XLA/Pallas; see ARCHITECTURE.md. The reference
implementation surveyed in SURVEY.md is a single-GPU LibTorch/CUDA app;
this package keeps its user-facing surface (config tree, dataset formats,
output layout) while re-designing the compute path for TPU.
"""

__version__ = "0.1.0"

import os as _os


def _enable_compilation_cache():
    """Persistent XLA compilation cache: step compiles cost 30-45 s through
    the TPU tunnel and the adaptive batch controller touches ~a dozen
    (bucket, capacity) jit keys per run — caching them across processes
    turns every rerun's compile cost into a disk hit. Opt out with
    F2_JAX_CACHE=0 or by pre-setting JAX_COMPILATION_CACHE_DIR."""
    if _os.environ.get("F2_JAX_CACHE", "1") == "0":
        return
    try:
        import jax
        if _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
            return  # user already configured it via env
        if getattr(jax.config, "jax_compilation_cache_dir", None):
            return  # embedding app already configured it programmatically
        path = _os.path.join(_os.path.expanduser("~"), ".cache", "f2nerf_jax")
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # cache is an optimization, never a requirement
        pass


def _honor_platform_env():
    """Make the JAX_PLATFORMS env var authoritative for platform selection.

    Some deployment images register an accelerator plugin from
    ``sitecustomize`` at interpreter startup and programmatically set
    ``jax_platforms`` (e.g. to "axon,cpu"), silently overriding the env
    var. Tests work around it per-process (tests/conftest.py); this makes
    the documented contract — ``JAX_PLATFORMS=cpu python scripts/run.py``
    runs on CPU — hold for every entry point. A no-op when the env var is
    unset or backends already initialized."""
    envp = _os.environ.get("JAX_PLATFORMS")
    if not envp:
        return
    try:
        import jax
        from jax._src import xla_bridge as _xb
        if _xb.backends_are_initialized():
            return  # too late; selection is already pinned
        if jax.config.jax_platforms != envp:
            jax.config.update("jax_platforms", envp)
    except Exception:  # selection hygiene, never a requirement
        pass


_enable_compilation_cache()
_honor_platform_env()
