"""Platform selection helper.

The container pre-registers the axon TPU PJRT plugin via sitecustomize and
pins JAX_PLATFORMS=axon; plain env vars cannot override it. Setting
``LVD_PLATFORM=cpu`` routes around that through jax.config (used by CLIs,
tests and CI smoke runs)."""

from __future__ import annotations

import os


def maybe_force_platform():
    plat = os.environ.get("LVD_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def enable_persistent_compile_cache(path: str | None = None):
    """Point JAX's persistent compilation cache at a repo-local directory.

    Works over the axon remote-TPU plugin too (the cache stores the
    serialized executable host-side, keyed by HLO): a cold Zeroscope
    pipeline compile drops from minutes to seconds on the second run.
    Disable with LVD_NO_COMPILE_CACHE=1.
    """
    if os.environ.get("LVD_NO_COMPILE_CACHE") == "1":
        return
    if path is None and os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # the caller's environment already configured a cache
    import jax

    if path is None:
        path = os.environ.get(
            "LVD_COMPILE_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_tpu_cache"),
        )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
