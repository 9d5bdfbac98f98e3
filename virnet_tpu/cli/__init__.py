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
