"""Device-platform selection robust to the environment's backend flavor.

The container historically exposed the TPU through an experimental `axon`
remote PJRT plugin (selected via JAX_PLATFORMS by sitecustomize at interpreter
startup); current images attach a local `tpu` platform instead and the stale
axon selection makes every jax.devices() call raise. ``ensure_device()`` probes
the configured backend and falls back to tpu-then-cpu so entry points work on
either image unchanged.
"""
from __future__ import annotations


def ensure_device() -> str:
    """Return the active platform name, repairing a broken default backend."""
    import jax

    try:
        return jax.devices()[0].platform
    except RuntimeError:
        jax.config.update("jax_platforms", "tpu,cpu")
        try:
            return jax.devices()[0].platform
        except RuntimeError:
            jax.config.update("jax_platforms", "cpu")
            return jax.devices()[0].platform
