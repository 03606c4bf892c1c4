"""Backend/platform plumbing shared by the CLI entry points."""

from __future__ import annotations

import os


def force_host_cpu(device_count: int) -> None:
    """Pin this process to the host CPU backend with ``device_count``
    virtual XLA devices (the standard trick for exercising mesh code
    without real chips, SURVEY.md §4e).

    Must run before the jax backend initializes. jax itself may already
    be imported — this sandbox pre-imports it via sitecustomize — but
    the backend is lazy until the first device lookup, so a
    ``jax.config.update`` here still takes effect. A no-op when
    ``device_count`` is falsy, so CLIs can pass their flag through
    unconditionally.
    """
    if not device_count:
        return
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags +
            f" --xla_force_host_platform_device_count={device_count}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
