"""reshape_like: rebuilding optax/container structures from orbax's
dict/list restore representation (io/checkpoint.py).

Orbax's ``PyTreeCheckpointer.restore`` without an item template returns
namedtuples as field-name dicts and tuples as lists; a resumed optimizer
state must be rebuilt onto the live template's container types before
``tx.update`` touches it (reference resume contract: src/trainer.py
--resume restores model + optimizer + epoch).
"""

import numpy as np
import pytest

from video_layout_generation_tpu.io.checkpoint import reshape_like


def _orbaxify(tree):
    """Mimic orbax's no-template restore representation."""
    if tree is None:
        return None
    if isinstance(tree, tuple) and hasattr(tree, "_fields"):
        return {f: _orbaxify(getattr(tree, f)) for f in tree._fields}
    if isinstance(tree, (tuple, list)):
        return [_orbaxify(v) for v in tree]
    if isinstance(tree, dict):
        return {k: _orbaxify(v) for k, v in tree.items()}
    return tree


def test_reshape_like_optax_adam_state():
    import jax
    import jax.numpy as jnp

    from video_layout_generation_tpu.train.state import make_optimizer

    params = {"layer": {"w": jnp.ones((2, 3)), "b": jnp.zeros((3,))}}
    tx = make_optimizer("adam", 1e-3, 0.5)
    opt = tx.init(params)
    restored = reshape_like(opt, _orbaxify(opt))
    assert jax.tree_util.tree_structure(restored) == \
        jax.tree_util.tree_structure(opt)
    for a, b in zip(jax.tree_util.tree_leaves(opt),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the restored state must be consumable by tx.update (the crash site)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    tx.update(grads, restored, params)


def test_reshape_like_sgd_state():
    import jax
    import jax.numpy as jnp

    from video_layout_generation_tpu.train.state import make_optimizer

    params = {"w": jnp.ones((4,))}
    tx = make_optimizer("sgd", 1e-2, 0.9)
    opt = tx.init(params)
    restored = reshape_like(opt, _orbaxify(opt))
    assert jax.tree_util.tree_structure(restored) == \
        jax.tree_util.tree_structure(opt)
    grads = {"w": jnp.full((4,), 2.0)}
    tx.update(grads, restored, params)


def test_reshape_like_plain_containers():
    t = {"a": (1, [2, 3]), "b": None}
    r = {"a": [10, [20, 30]], "b": None}
    out = reshape_like(t, r)
    assert out == {"a": (10, [20, 30]), "b": None}
    assert isinstance(out["a"], tuple) and isinstance(out["a"][1], list)


def test_reshape_like_length_mismatch_raises():
    with pytest.raises(ValueError):
        reshape_like((1, 2), [1, 2, 3])
