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


def test_image_grid(tmp_path):
    """Sample-grid tiling + PNG export (vaemodule.py:607-623 analogue)."""
    import numpy as np
    from diffsci_tpu.utils import make_image_grid, save_image_grid
    imgs = np.stack([np.full((4, 4, 1), float(i)) for i in range(5)])
    grid = make_image_grid(imgs, nrow=3, pad=1)
    # 2 rows x 3 cols of 4px tiles with 1px padding
    assert grid.shape == (2 * 5 + 1, 3 * 5 + 1, 1)
    assert grid[1, 1, 0] == 0.0 and grid[1, 6, 0] == 1.0  # row-major order
    assert grid[6, 1, 0] == 3.0
    p = save_image_grid(tmp_path / "grid.png", imgs * 0.25 - 1.0)
    assert p.exists() and p.stat().st_size > 100
    import pytest
    with pytest.raises(ValueError):
        make_image_grid(np.zeros((4, 4, 1)))


def test_inverse_cdf_histogram():
    """Empirical inverse CDF (reference utils.py:14-18)."""
    import numpy as np
    from diffsci_tpu.utils import inverse_cdf_histogram
    rng = np.random.default_rng(0)
    z = rng.standard_normal(20000)
    ppf = inverse_cdf_histogram(z)
    assert abs(ppf(0.5)) < 0.05                  # median ~ 0
    assert abs(ppf(0.8413) - 1.0) < 0.1          # +1 sigma
    u = rng.uniform(0.01, 0.99, 1000)
    np.testing.assert_allclose(np.std(ppf(u)), np.std(z), rtol=0.2)


def test_shapes_dataset():
    """Synthetic shapes generator (train-diffusion-shapes.py:17-105)."""
    import numpy as np
    import pytest
    from diffsci_tpu.data import ShapesDataset
    x = ShapesDataset(16, size=32, mode="geometry_test", seed=1).generate()
    assert x.shape == (16, 32, 32, 1)
    assert set(np.unique(x)) <= {-1.0, 1.0}
    # centered shape: center pixel always on, corners always off
    assert np.all(x[:, 16, 16, 0] == 1.0)
    assert np.all(x[:, 0, 0, 0] == -1.0)
    xp = ShapesDataset(32, size=64, mode="paper_replica", seed=2).generate()
    assert xp.shape == (32, 64, 64, 1)
    occupancy = (xp > 0).mean(axis=(1, 2, 3))
    assert occupancy.min() == 0.0 or occupancy.min() < 0.05  # empty images
    assert occupancy.max() > 0.01                            # populated ones
    # determinism by seed
    np.testing.assert_array_equal(
        xp, ShapesDataset(32, size=64, mode="paper_replica",
                          seed=2).generate())
    with pytest.raises(ValueError):
        ShapesDataset(1, mode="bogus")
