"""Device-platform selection robust to the environment's backend flavor.

The container historically exposed the TPU through an experimental `axon`
remote PJRT plugin (selected via JAX_PLATFORMS by sitecustomize at interpreter
startup); current images attach a local `tpu` platform instead and the stale
axon selection makes every jax.devices() call raise. ``ensure_device()`` probes
the configured backend and falls back to tpu-then-cpu so entry points work on
either image unchanged.
"""
from __future__ import annotations


def _sanitize_tpu_env() -> None:
    # The image's TPU auto-detection is flaky: in some processes it sets
    # TPU_WORKER_HOSTNAMES / TPU_ACCELERATOR_TYPE to a literal
    # "WARNING: could not determine ..." string, which makes libtpu init fail
    # and silently demotes benchmarks to CPU. Detection happens lazily at
    # backend init, so deleting the vars is not enough — pre-set the known
    # single-chip values (detection respects existing values). Only done on
    # this image (signature: PALLAS_AXON_TPU_GEN present).
    import os

    def poisoned(k):
        v = os.environ.get(k)
        return v is not None and (" " in v or "WARNING" in v.upper())

    if os.environ.get("PALLAS_AXON_TPU_GEN") == "v5e":
        for k, v in (
            ("TPU_ACCELERATOR_TYPE", "v5litepod-4"),
            ("TPU_WORKER_HOSTNAMES", "localhost"),
            ("TPU_TOPOLOGY", "1x1"),
        ):
            if k not in os.environ or poisoned(k):
                os.environ[k] = v
    else:
        for k in ("TPU_WORKER_HOSTNAMES", "TPU_ACCELERATOR_TYPE"):
            if poisoned(k):
                del os.environ[k]


def _enable_persistent_compile_cache() -> None:
    """Point JAX at an on-disk compilation cache so separate processes reuse
    each other's TPU executables. Without it every CLI invocation pays the
    full compile bill (measured: 12x12x4 solve+round = 0.4 s + 1.6 s compute
    but ~38 s of per-process compiles). BDD_TPU_COMPILE_CACHE overrides the
    location; set to 0 to disable."""
    import os

    import jax

    d = os.environ.get(
        "BDD_TPU_COMPILE_CACHE",
        os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "bdd_tpu_jax",
        ),
    )
    if not d or d == "0":
        return
    try:
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax without these flags: in-memory cache only


def ensure_device(tpu_retries: int = 0, retry_s: float = 10.0) -> str:
    """Return the active platform name, repairing a broken default backend.

    ``tpu_retries``: when the configured backend fails and a TPU seems to be
    present, retry TPU init this many times before falling back to CPU — a
    chip held by a just-killed process frees up within seconds, and a silent
    CPU fallback would let benchmarks report garbage numbers.
    """
    import os
    import sys
    import time

    import jax

    _sanitize_tpu_env()
    _enable_persistent_compile_cache()
    try:
        return jax.devices()[0].platform
    except RuntimeError:
        pass
    p = None
    # only burn retries when a TPU seems present (stale axon env, local
    # libtpu, or explicit request) — on a CPU-only machine every "tpu,cpu"
    # init attempt is a guaranteed failure costing retry_s each
    tpu_likely = bool(
        os.environ.get("PALLAS_AXON_TPU_GEN")
        or os.environ.get("TPU_SKIP_MDS_QUERY")
        or os.path.exists("/dev/accel0")
    )
    if not tpu_likely:
        tpu_retries = 0
    for attempt in range(max(tpu_retries, 0) + 1):
        jax.config.update("jax_platforms", "tpu,cpu")
        try:
            p = jax.devices()[0].platform
        except RuntimeError:
            p = None
        if p == "tpu" or attempt == tpu_retries:
            break
        print(
            f"# ensure_device: got {p!r}, retrying TPU init "
            f"({attempt + 1}/{tpu_retries})",
            file=sys.stderr,
        )
        # jax only re-initializes backends when the config value changes
        jax.config.update("jax_platforms", "cpu")
        time.sleep(retry_s)
    if p is not None:
        return p
    jax.config.update("jax_platforms", "cpu")
    return jax.devices()[0].platform
