"""User-facing command line entry points.

If VIRNET_TPU_PLATFORM is set (e.g. "cpu"), pin the JAX platform before
any backend use.  This image's sitecustomize registers a remote TPU
backend via jax.config.update, which overrides the JAX_PLATFORMS env var
— so harnesses that spawn trainer CLIs as subprocesses (tests,
cli/resilience_proof.py) need an in-process hook to force the CPU
backend on the child.
"""

import os

if os.environ.get("VIRNET_TPU_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["VIRNET_TPU_PLATFORM"])

if os.environ.get("VIRNET_TPU_COMPILE_CACHE"):
    # Persistent XLA compilation cache (opt-in): first compiles of the
    # flagship graphs cost 20-40 s on a TPU backend; caching them makes
    # every later CLI start in ~1 s.  Intended for TPU — the CPU
    # backend's AOT loader re-checks host machine features per entry and
    # logs mismatch warnings.
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["VIRNET_TPU_COMPILE_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
