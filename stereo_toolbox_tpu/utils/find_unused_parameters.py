"""Find parameters that receive no gradient (debugging aid).

Analogue of the reference's forward-hook sweep
(utils/find_unused_parameters.py:3-33 — which lists modules never touched in
a forward pass, as a DDP `find_unused_parameters` aid). Under JAX there is no
DDP wrapper to configure, but the same question — "which parameters does this
loss actually train?" — is answered exactly by differentiating a sample step
and reporting all-zero gradient leaves (e.g. frozen foundation trunks, heads
gated off by flags, dead branches).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def find_unused_parameters(loss_fn: Callable, params,
                           *args, **kwargs) -> list[str]:
    """Return '/'-joined paths of params whose gradient is identically zero.

    Args:
      loss_fn: (params, *args, **kwargs) → scalar loss.
      params: parameter pytree.

    Example:
      unused = find_unused_parameters(
          lambda p: losses.multi_head_loss(
              model.apply({'params': p}, left, right, train=True),
              gt, mask, weights),
          variables['params'])
    """
    grads = jax.grad(lambda p: loss_fn(p, *args, **kwargs))(params)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]

    def path_str(p):
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in p)

    unused = []
    for path, g in flat:
        if float(jnp.abs(g).max()) == 0.0:
            unused.append(path_str(path))
    return unused
