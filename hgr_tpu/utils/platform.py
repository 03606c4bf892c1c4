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
    import re

    flags = os.environ.get("XLA_FLAGS", "")
    new_flag = f"--xla_force_host_platform_device_count={device_count}"
    if "host_platform_device_count" in flags:
        # An explicit flag wins over an inherited environment value
        # (e.g. a parent test process exporting 8 while this process
        # was asked for 4).
        flags = re.sub(
            r"--xla_force_host_platform_device_count=\d+", new_flag, flags)
        os.environ["XLA_FLAGS"] = flags
    else:
        os.environ["XLA_FLAGS"] = (flags + " " + new_flag).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
