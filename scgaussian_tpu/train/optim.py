"""Adam with torch semantics + moment surgery for densification.

The reference uses torch.optim.Adam(eps=1e-15) with per-param-group learning
rates (`scene/gaussian_model.py:486-510`) and performs *optimizer-state
surgery* on densify/prune/reset events (`scene/gaussian_model.py:758-842`):
appended Gaussians get zero moments, pruned rows drop their moments, and
`replace_tensor_to_optimizer` zeroes a group's moments entirely.

optax's Adam hides its state shape behind transforms, so this is a small
explicit implementation over pytrees:

    m = b1 m + (1-b1) g;  v = b2 v + (1-b2) g^2
    p -= lr * (m / (1-b1^t)) / (sqrt(v / (1-b2^t)) + eps)

which matches torch.optim.Adam exactly (eps outside the sqrt). The state is
a params-shaped pytree of (m, v) plus a shared step count (the reference's
groups all step together), so zeroing moments for specific leaves or rows is
plain tree surgery that stays inside jit.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AdamState:
    m: Any  # params-shaped pytree
    v: Any  # params-shaped pytree
    count: jnp.ndarray  # [] int32


def init(params: Any) -> AdamState:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return AdamState(m=zeros, v=jax.tree_util.tree_map(jnp.zeros_like, params), count=jnp.int32(0))


def apply(
    params: Any,
    grads: Any,
    state: AdamState,
    lr_tree: Any,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
):
    """One Adam step. `lr_tree` is a pytree of scalars matching `params`
    structure (per-leaf learning rates, possibly traced schedule values)."""
    count = state.count + 1
    t = count.astype(jnp.float32)
    bc1 = 1.0 - b1**t
    bc2 = 1.0 - b2**t

    new_m = jax.tree_util.tree_map(lambda m, g: b1 * m + (1 - b1) * g, state.m, grads)
    new_v = jax.tree_util.tree_map(lambda v, g: b2 * v + (1 - b2) * g * g, state.v, grads)

    def upd(p, m, v, lr):
        m_hat = m / bc1
        v_hat = v / bc2
        return p - lr * m_hat / (jnp.sqrt(v_hat) + eps)

    new_params = jax.tree_util.tree_map(upd, params, new_m, new_v, lr_tree)
    return new_params, AdamState(m=new_m, v=new_v, count=count)


def zero_moments_leaf(state: AdamState, leaf_name: str) -> AdamState:
    """Zero the full (m, v) of one named dataclass field — the semantics of
    `replace_tensor_to_optimizer` (`scene/gaussian_model.py:758-775`)."""

    def zero_field(tree):
        return dataclasses.replace(
            tree, **{leaf_name: jnp.zeros_like(getattr(tree, leaf_name))}
        )

    return AdamState(m=zero_field(state.m), v=zero_field(state.v), count=state.count)


def zero_moments_rows(state: AdamState, row_mask_map: Dict[str, jnp.ndarray]) -> AdamState:
    """Zero (m, v) rows where mask is True for the named fields — the fixed-
    capacity analog of append-with-zero-moments / prune-drops-moments
    (`scene/gaussian_model.py:777-842`)."""

    def zero_rows(tree):
        updates = {}
        for name, mask in row_mask_map.items():
            x = getattr(tree, name)
            keep = (~mask).reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)
            updates[name] = x * keep
        return dataclasses.replace(tree, **updates)

    return AdamState(m=zero_rows(state.m), v=zero_rows(state.v), count=state.count)
