"""Periodic slicing semantics pinned to the reference's test suite.

Every behavioral case from reference tests/test_torchutils.py:10-210 is
reproduced here against utils/periodic.py (functional JAX counterpart of
reference diffsci/torchutils.py:107-308), plus setitem cases covering the
recursive wrap-combination writes (torchutils.py:240-308).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from diffsci_tpu.utils.periodic import (periodic_getitem,
                                        periodic_getitem_extended,
                                        periodic_setitem)


def _l(x):
    return np.asarray(x).tolist()


# ---------------------------------------------------------------------------
# periodic_getitem (test_torchutils.py:10-64)
# ---------------------------------------------------------------------------
def test_getitem_basic():
    a = jnp.arange(5)
    assert _l(periodic_getitem(a, slice(1, 3))) == [1, 2]
    assert _l(periodic_getitem(a, slice(0, 5))) == [0, 1, 2, 3, 4]


def test_getitem_wrap_around():
    a = jnp.arange(5)
    assert _l(periodic_getitem(a, slice(3, 2))) == [3, 4, 0, 1]
    assert _l(periodic_getitem(a, slice(-2, 2))) == [3, 4, 0, 1]


def test_getitem_negative_start():
    a = jnp.arange(5)
    assert _l(periodic_getitem(a, slice(-1, 2))) == [4, 0, 1]
    assert _l(periodic_getitem(a, slice(-3, 1))) == [2, 3, 4, 0]


def test_getitem_empty_slice():
    a = jnp.arange(5)
    assert periodic_getitem(a, slice(2, 2)).shape == (0,)


def test_getitem_rejects_large_slices():
    a = jnp.arange(5)
    with pytest.raises(ValueError, match="too large"):
        periodic_getitem(a, slice(0, 10))


# ---------------------------------------------------------------------------
# periodic_getitem_extended (test_torchutils.py:67-190)
# ---------------------------------------------------------------------------
def test_extended_basic():
    a = jnp.arange(5)
    assert _l(periodic_getitem_extended(a, slice(1, 3))) == [1, 2]
    assert _l(periodic_getitem_extended(a, slice(0, 5))) == [0, 1, 2, 3, 4]


def test_extended_wrap_within_period():
    a = jnp.arange(5)
    assert _l(periodic_getitem_extended(a, slice(-2, 2))) == [3, 4, 0, 1]
    assert _l(periodic_getitem_extended(a, slice(-1, 2))) == [4, 0, 1]


def test_extended_larger_than_size():
    a = jnp.arange(3)
    assert _l(periodic_getitem_extended(a, slice(-2, 7))) == \
        [1, 2, 0, 1, 2, 0, 1, 2, 0]
    assert _l(periodic_getitem_extended(a, slice(0, 6))) == \
        [0, 1, 2, 0, 1, 2]
    assert _l(periodic_getitem_extended(a, slice(0, 7))) == \
        [0, 1, 2, 0, 1, 2, 0]
    assert _l(periodic_getitem_extended(a, slice(1, 8))) == \
        [1, 2, 0, 1, 2, 0, 1]


def test_extended_very_large_slice():
    a = jnp.arange(3)
    assert _l(periodic_getitem_extended(a, slice(0, 10))) == \
        [0, 1, 2, 0, 1, 2, 0, 1, 2, 0]
    b = jnp.arange(32)
    r = periodic_getitem_extended(b, slice(-5, 37))
    assert r.shape[0] == 42
    assert _l(r[:5]) == [27, 28, 29, 30, 31]
    assert _l(r[5:37]) == list(range(32))
    assert _l(r[37:]) == [0, 1, 2, 3, 4]


def test_extended_multidimensional():
    a = jnp.arange(12).reshape(3, 4)
    r = periodic_getitem_extended(a, slice(0, 6), slice(None))
    assert r.shape == (6, 4)
    assert _l(r[0]) == [0, 1, 2, 3]
    assert _l(r[3]) == [0, 1, 2, 3]
    r = periodic_getitem_extended(a, slice(None), slice(-1, 6))
    assert r.shape == (3, 7)
    assert _l(r[0]) == [3, 0, 1, 2, 3, 0, 1]


def test_extended_3d():
    a = jnp.arange(24).reshape(2, 4, 3)
    r = periodic_getitem_extended(a, slice(None), slice(-1, 6), slice(None))
    assert r.shape == (2, 7, 3)
    r = periodic_getitem_extended(a, slice(None), slice(None), slice(0, 6))
    assert r.shape == (2, 4, 6)


def test_extended_empty_slice():
    a = jnp.arange(5)
    assert periodic_getitem_extended(a, slice(2, 2)).shape == (0,)
    assert periodic_getitem_extended(a, slice(3, 1)).shape == (0,)


def test_extended_exact_size():
    a = jnp.arange(5)
    assert _l(periodic_getitem_extended(a, slice(0, 5))) == [0, 1, 2, 3, 4]
    assert _l(periodic_getitem_extended(a, slice(2, 7))) == [2, 3, 4, 0, 1]


def test_extended_matches_original_for_small_slices():
    for size in [3, 5, 7, 10]:
        a = jnp.arange(size)
        for start in range(size):
            for stop in range(start, size + 1):
                s = slice(start, stop)
                assert _l(periodic_getitem(a, s)) == \
                    _l(periodic_getitem_extended(a, s)), \
                    f"size={size}, slice({start}, {stop})"


def test_step_not_supported():
    a = jnp.arange(6)
    with pytest.raises(NotImplementedError):
        periodic_getitem(a, slice(0, 4, 2))
    with pytest.raises(NotImplementedError):
        periodic_getitem_extended(a, slice(0, 4, 2))


# ---------------------------------------------------------------------------
# periodic_setitem (torchutils.py:240-308; functional in JAX)
# ---------------------------------------------------------------------------
def test_setitem_normal():
    a = jnp.zeros(5)
    out = periodic_setitem(a, jnp.array([1.0, 2.0]), slice(1, 3))
    assert _l(out) == [0, 1, 2, 0, 0]


def test_setitem_wrap():
    a = jnp.zeros(5)
    out = periodic_setitem(a, jnp.array([1.0, 2.0, 3.0, 4.0]), slice(3, 2))
    # positions 3,4 then wrap to 0,1
    assert _l(out) == [3, 4, 0, 1, 2]


def test_setitem_negative_bounds():
    a = jnp.zeros(5)
    out = periodic_setitem(a, jnp.array([1.0, 2.0, 3.0]), slice(-1, 2))
    assert _l(out) == [2, 3, 0, 0, 1]


def test_setitem_2d_double_wrap():
    """Both dims wrapping: four corner blocks written (the recursive
    combination logic at torchutils.py:283-308)."""
    a = jnp.zeros((4, 4))
    v = jnp.arange(1.0, 10.0).reshape(3, 3)
    out = periodic_setitem(a, v, slice(3, 2), slice(3, 2))
    expect = np.zeros((4, 4))
    # rows [3,0,1] x cols [3,0,1] get v
    for ri, r in enumerate([3, 0, 1]):
        for ci, c in enumerate([3, 0, 1]):
            expect[r, c] = v[ri, ci]
    np.testing.assert_array_equal(np.asarray(out), expect)


def test_setitem_rejects_multi_period():
    a = jnp.zeros(5)
    with pytest.raises(ValueError, match="too large"):
        periodic_setitem(a, jnp.zeros(10), slice(0, 10))


def test_setitem_roundtrip_with_getitem():
    """getitem(setitem(x, v, s), s) == v for wrapping slices."""
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((6, 7)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((4, 5)).astype(np.float32))
    out = periodic_setitem(a, v, slice(4, 2), slice(5, 3))
    got = periodic_getitem(out, slice(4, 2), slice(5, 3))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(v))
