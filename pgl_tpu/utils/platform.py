"""Platform selection helper.

The image's sitecustomize force-registers the TPU tunnel backend and
overrides ``JAX_PLATFORMS``; ``select_platform()`` honors the
``PGL_TPU_PLATFORM`` env var (e.g. ``cpu``) via ``jax.config`` — call it
before the first jax operation (examples do).
"""

import os


def select_platform(default=None):
    plat = os.environ.get("PGL_TPU_PLATFORM", default)
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    return plat
