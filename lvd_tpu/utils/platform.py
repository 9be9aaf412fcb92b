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
