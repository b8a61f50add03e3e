"""Robust accelerator selection.

The TPU relay plugin on some hosts registers nondeterministically as
platform "axon" or "tpu"; a pinned ``JAX_PLATFORMS`` then fails with
"not in the list of known backends".  Call :func:`ensure_accelerator`
before the first jax import to fall back to automatic platform choice,
and to learn which backend actually came up.
"""

from __future__ import annotations

import logging
import os
import sys

_log = logging.getLogger("sushi_tpu")


def ensure_accelerator() -> str:
    """Pick a working backend; returns the platform name ('tpu'/'cpu'/...)."""
    if "jax" not in sys.modules:
        pinned = os.environ.get("JAX_PLATFORMS")
        if pinned and pinned not in ("cpu",):
            # let jax choose among whatever actually registered
            os.environ.pop("JAX_PLATFORMS", None)
    import jax

    try:
        platform = jax.devices()[0].platform
    except RuntimeError as error:
        _log.warning("accelerator init failed (%s); falling back to CPU", error)
        # jax reads JAX_PLATFORMS from the env only at import time; after
        # import the config flag is the live switch
        jax.config.update("jax_platforms", "cpu")
        platform = jax.devices()[0].platform
    if platform == "cpu":
        _log.warning("running on CPU — no TPU backend came up")
    return platform
