"""Cross-framework golden parity, round 3k: the volume-synthesis
orchestrators — grid-of-cubes filling inpainting and sequential-z
stitching — with the SAME deterministic generator stub on both sides.

Pins the orchestration logic itself: parity-ordered grid traversal,
periodic wrapping of the shared noise cube, 1=known inpaint-mask
construction, known-region extraction, overlap windows and cosine
blending (fillinginpainting.py:298-440, sequentialinpainting.py:83-330).

Fixtures: scripts/gen_reference_fixtures_r3k.py.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from test_reference_parity import FIXDIR, _check


def _vol_nchw(a):
    """torch [1, C, X, Y, Z] -> channels-last [1, X, Y, Z, C]."""
    return np.asarray(a).transpose(0, 2, 3, 4, 1)


class _GridStub:
    """Mirror of the fixture's stub: sample -> tanh(noise slice);
    inpaint -> mask * known + (1-mask) * tanh(noise)."""

    def sample(self, variables, key, nsamples, shape, orig_noise=None,
               **kw):
        return jnp.tanh(orig_noise)

    def inpaint(self, variables, key, x_orig, mask, orig_noise=None, **kw):
        gen = jnp.tanh(orig_noise[0])
        return (mask * x_orig + (1 - mask) * gen)[None]


@pytest.mark.parametrize("tag,periodic", [
    ("plain", (False, False, False)),
    ("periodic", (True, True, True)),
])
def test_grid_volume_parity(tag, periodic):
    from diffsci_tpu.extra.fillinginpainting import sample_grid_volume

    d = np.load(os.path.join(FIXDIR, "grid_volume.npz"))
    noise = jnp.asarray(_vol_nchw(d[f"{tag}_noise"]))
    vol = sample_grid_volume(_GridStub(), {}, jax.random.PRNGKey(0),
                             grid_map=[2, 2, 2], base_shape=(8, 8, 8, 1),
                             overlap_size=4, nsteps=3,
                             periodicity=periodic, noise_cube=noise)
    _check(vol, _vol_nchw(d[f"{tag}_volume"]), rtol=1e-5, atol=1e-6,
           label=f"grid volume {tag}")


class _SeqStub:
    """Mirror of the fixture's stub: a channels-first coordinate ramp
    pattern moved to channels-last."""

    def _pattern(self, shape):
        # shape: (dx, dy, dz, C) channels-last; the torch stub builds the
        # ramp in [C, dx, dy, dz] order — replicate exactly
        cf = (shape[-1],) + tuple(shape[:-1])
        n = int(np.prod(cf))
        ramp = jnp.linspace(-1.0, 1.0, n).reshape(cf)
        return jnp.moveaxis(jnp.sin(3.0 * ramp), 0, -1)

    def sample(self, variables, key, nsamples, shape, **kw):
        return self._pattern(shape)[None]

    def inpaint(self, variables, key, x_orig, mask, **kw):
        gen = self._pattern(x_orig.shape)
        return (mask * x_orig + (1 - mask) * gen)[None]


@pytest.mark.parametrize("blend", ["cosine", "latest"])
def test_sequential_z_parity(blend):
    from diffsci_tpu.extra.sequentialinpainting import sample_sequential_z

    d = np.load(os.path.join(FIXDIR, "sequential_volume.npz"))
    vol = sample_sequential_z(_SeqStub(), {}, jax.random.PRNGKey(0),
                              num_blocks=3, base_shape=(8, 8, 8, 1),
                              overlap_size=4, nsteps=3, blend_mode=blend)
    _check(vol, _vol_nchw(d[f"{blend}_volume"]), rtol=1e-5, atol=1e-6,
           label=f"sequential {blend}")


# ---------------------------------------------------------------------------
# porosity-map utilities (round 3l)
# ---------------------------------------------------------------------------
def test_porosity_map_parity():
    """Matern covariance/Cholesky, a sample with replayed z,
    interpolate_array (linear + spline), the vertical porosity grid, and
    grid centers (porosity_map.py:9-177).
    Fixture: gen_reference_fixtures_r3l.py."""
    from diffsci_tpu.extra.porosity_map import (MaternFieldSampler,
                                                interpolate_array,
                                                make_vertical_porosity_map,
                                                get_grid_center)

    d = np.load(os.path.join(FIXDIR, "porosity_map.npz"))
    gp = MaternFieldSampler(d["X"], mean_val=0.4,
                            params={"sigma_sq": 1.3, "nu": 1.5,
                                    "length_scale": 0.8})
    _check(gp._build_covariance_matrix(), d["K"], rtol=1e-10, atol=1e-12,
           label="matern covariance")
    _check(gp.L, d["L"], rtol=1e-8, atol=1e-10, label="matern cholesky")
    samples = (0.4 + gp.L @ d["z"]).T
    _check(samples, d["samples"], rtol=1e-8, atol=1e-10,
           label="matern samples")

    arr = [0.1, 0.5, 0.2, 0.9]
    _check(interpolate_array(arr, method="linear"), d["interp_linear"],
           rtol=1e-8, atol=1e-10, label="interpolate linear")
    _check(interpolate_array(arr, method="spline"), d["interp_spline"],
           rtol=1e-8, atol=1e-10, label="interpolate spline")
    _check(make_vertical_porosity_map(arr, grid_size=(3, 2),
                                      method="linear", as_condition=False),
           d["vmap_grid"], rtol=1e-6, atol=1e-8, label="vertical map")
    gc = get_grid_center((4.0, 6.0), (2, 3))
    for i, g in enumerate(gc):
        _check(g, d[f"grid_center_{i}"], rtol=1e-10, atol=1e-12,
               label=f"grid center {i}")
