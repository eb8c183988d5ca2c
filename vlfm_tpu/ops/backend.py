"""Where should pallas kernels run? (shared TPU-vs-interpret policy).

The axon TPU plugin ignores JAX_PLATFORMS, so hermetic CPU runs (tests, the
multichip CPU dryrun) pin ``jax_default_device`` instead of switching
backends — kernels must honor that pin when deciding whether to lower
through Mosaic or fall back to interpret mode / plain XLA.
"""

from __future__ import annotations

import jax


def default_interpret() -> bool:
    """True when pallas kernels should run in interpret mode (no TPU)."""
    dev = jax.config.jax_default_device
    if dev is not None:
        return getattr(dev, "platform", "cpu") != "tpu"
    return jax.default_backend() != "tpu"
