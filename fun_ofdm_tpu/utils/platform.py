"""Effective-platform detection.

`jax.default_backend()` reports the highest-priority registered backend,
which stays "tpu" even when computation has been pinned to host CPU via
`jax.config.update("jax_default_device", ...)` (the test rig / multichip
dryrun do exactly that). Decisions that depend on where arrays will
actually live — superstep auto-sizing, persistent-cache gating — must use
the *effective* platform.
"""

from __future__ import annotations


def default_platform() -> str:
    """Platform name ("cpu"/"tpu"/...) of the device new arrays land on."""
    import jax

    dev = jax.config.jax_default_device
    platform = getattr(dev, "platform", None)
    if platform is not None:
        return platform
    return jax.default_backend()
