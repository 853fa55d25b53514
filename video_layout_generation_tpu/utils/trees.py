"""Param-tree helpers."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def param_count(tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def tree_cast(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, tree)
