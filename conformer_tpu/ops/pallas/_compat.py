"""Backend compatibility for the Pallas TPU kernels.

Every public kernel wrapper takes `interpret: bool | None = None`; None
resolves to "interpret unless we are on a real TPU", so configs that enable
the kernels (configs/*.json set use_pallas_* = true) stay loadable on CPU —
the kernels run under the Pallas interpreter there instead of raising
"Only interpret mode is supported on CPU backend". Tests that want the
interpreter explicitly still pass interpret=True.
"""

from __future__ import annotations

import jax


def resolve_interpret(interpret: bool | None) -> bool:
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret
