"""Tests for tensor/periodic utilities (mirrors reference
tests/test_torchutils.py semantics)."""

import numpy as np
import jax.numpy as jnp
import pytest

from diffsci_tpu.utils import (
    bcast_right, dict_expand_dims, linear_interpolation, get_minibatch_sizes,
    periodic_getitem, periodic_getitem_extended, periodic_setitem,
)


def test_bcast_right():
    s = jnp.array([1.0, 2.0])
    x = jnp.zeros((2, 3, 4))
    out = bcast_right(s, x)
    assert out.shape == (2, 1, 1)
    np.testing.assert_allclose((out + x)[1], 2.0)


def test_dict_expand_dims():
    d = {"y": jnp.zeros((3, 4)), "p": jnp.zeros((3,))}
    out = dict_expand_dims(d, 0)
    assert out["y"].shape == (1, 3, 4)
    assert out["p"].shape == (1, 3)
    assert dict_expand_dims(None) is None


def test_linear_interpolation():
    x1 = jnp.zeros((2, 2))
    x2 = jnp.ones((2, 2))
    path = linear_interpolation(x1, x2, 3)
    assert path.shape == (5, 2, 2)
    np.testing.assert_allclose(path[0], 0.0)
    np.testing.assert_allclose(path[-1], 1.0)
    np.testing.assert_allclose(path[2], 0.5)


def test_get_minibatch_sizes():
    assert get_minibatch_sizes(10, 4) == [4, 4, 2]
    assert get_minibatch_sizes(8, 4) == [4, 4]
    assert get_minibatch_sizes(3, 4) == [3]


def test_periodic_getitem_wrap():
    a = jnp.arange(10)
    out = periodic_getitem(a, slice(7, 2))
    np.testing.assert_array_equal(out, [7, 8, 9, 0, 1])
    out = periodic_getitem(a, slice(2, 7))
    np.testing.assert_array_equal(out, [2, 3, 4, 5, 6])


def test_periodic_getitem_2d():
    a = jnp.arange(12).reshape(3, 4)
    out = periodic_getitem(a, slice(2, 1), slice(3, 1))
    assert out.shape == (2, 2)
    np.testing.assert_array_equal(out, [[11, 8], [3, 0]])


def test_periodic_getitem_rejects_oversize():
    a = jnp.arange(5)
    with pytest.raises(ValueError):
        periodic_getitem(a, slice(0, 7))


def test_periodic_getitem_extended_tiles():
    a = jnp.array([0, 1, 2])
    out = periodic_getitem_extended(a, slice(-2, 7))
    np.testing.assert_array_equal(out, [1, 2, 0, 1, 2, 0, 1, 2, 0])


def test_periodic_setitem_wraps():
    a = jnp.zeros(6)
    v = jnp.array([1.0, 2.0, 3.0])
    out = periodic_setitem(a, v, slice(5, 2))
    np.testing.assert_array_equal(out, [2, 3, 0, 0, 0, 1])
