"""CLI platform selection.

The axon TPU plugin registers itself at import and ``JAX_PLATFORMS=cpu``
in the environment does NOT override it; a post-import
``jax.config.update("jax_platforms", ...)`` does. Every CLI entry calls
``apply_platform_env()`` first so ``EDM_PLATFORM=cpu python run_...py``
works — for tiny-model rehearsals, for CI boxes without a chip, and for
the hours-long tunnel outages (CLAUDE.md) where CPU-testable work must
keep moving.
"""

from __future__ import annotations

import os


def apply_platform_env(var: str = "EDM_PLATFORM") -> str | None:
    """Force the jax platform from ``$EDM_PLATFORM`` (e.g. ``cpu``) if set;
    returns the applied value. Must run before any computation (platform
    choice is latched at backend init, not at import).

    Also registers SIGUSR1 to dump all thread stacks to stderr
    (``kill -USR1 <pid>``): the axon tunnel can wedge a long-running
    training process mid-transfer, and a live stack dump is the only way
    to see where without killing the run."""
    import faulthandler
    import signal

    try:
        faulthandler.register(signal.SIGUSR1, all_threads=True)
    except (AttributeError, ValueError):  # non-main thread / no SIGUSR1
        pass
    value = os.environ.get(var)
    if value:
        import jax

        jax.config.update("jax_platforms", value)
    return value or None
