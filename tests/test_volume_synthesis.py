"""Volume synthesis (grid + sequential inpainting), porosity maps,
embedders."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffsci_tpu.extra import (sample_grid_volume, get_grid_generation_order,
                               build_inpaint_mask, sample_sequential_z,
                               create_cosine_blend_weights,
                               matern_grid_sample,
                               make_vertical_porosity_map,
                               interpolate_array)
from diffsci_tpu.models.si import SIModel, SIModelConfig

KEY = jax.random.PRNGKey(0)


def test_generation_order_parity():
    order, corners = get_grid_generation_order([2, 2, 2])
    assert len(order) == 8
    assert corners == 1
    assert order[0] == (0, 0, 0)
    assert len(set(order)) == 8
    order, corners = get_grid_generation_order([3, 2, 2])
    assert len(order) == 12
    assert corners == 2  # (0,0,0) and (2,0,0)


def test_build_inpaint_mask_marks_neighbors():
    mask = build_inpaint_mask(
        grid_pos=(1, 0, 0), generated_positions={(0, 0, 0)},
        base_spatial=[4, 4, 4], overlap_size=2, final_spatial=[8, 4, 4],
        channels=1, periodicity=(False, False, False))
    # current cube at x in [3, 8) (half-overlap 1); previous covers [0, 5)
    assert mask.shape == (5, 4, 4, 1)
    assert float(mask[0].max()) == 1.0   # overlapping part known
    assert float(mask[-1].max()) == 0.0  # far part unknown


class _FlowStub:
    """Records calls; returns constant cubes (mock-based, mirroring the
    reference's test strategy)."""

    def __init__(self):
        self.sample_calls = 0
        self.inpaint_calls = 0

    def sample(self, variables, key, n, shape, **kw):
        self.sample_calls += 1
        return jnp.full((n,) + tuple(shape), 1.0)

    def inpaint(self, variables, key, x_orig, mask, nsamples=1, **kw):
        self.inpaint_calls += 1
        return jnp.full((nsamples,) + x_orig.shape, 2.0)


def test_sample_grid_volume_structure():
    stub = _FlowStub()
    vol = sample_grid_volume(stub, None, KEY, grid_map=[2, 2, 2],
                             base_shape=(4, 4, 4, 1), overlap_size=2)
    assert vol.shape == (1, 8, 8, 8, 1)
    assert stub.sample_calls == 1     # one all-even corner
    assert stub.inpaint_calls == 7    # the rest inpainted
    # all voxels written
    assert float(jnp.min(jnp.abs(vol))) > 0.0


def test_sample_grid_volume_periodic_requires_even():
    stub = _FlowStub()
    with pytest.raises(ValueError):
        sample_grid_volume(stub, None, KEY, grid_map=[3, 2, 2],
                           base_shape=(4, 4, 4, 1), overlap_size=2,
                           periodicity=(True, False, False))


def test_sample_sequential_z():
    stub = _FlowStub()
    vol = sample_sequential_z(stub, None, KEY, num_blocks=3,
                              base_shape=(4, 4, 8, 1), overlap_size=4)
    assert vol.shape == (1, 4, 4, 24, 1)
    assert stub.sample_calls == 1
    assert stub.inpaint_calls == 2
    # cosine-blended overlap regions lie between block values 1.0 and 2.0
    w = create_cosine_blend_weights(4)
    assert float(w[0]) == 0.0 and float(w[-1]) == 1.0
    overlap = np.asarray(vol[0, 0, 0, 6:10, 0])
    assert np.all(overlap >= 1.0 - 1e-6) and np.all(overlap <= 2.0 + 1e-6)


def test_sequential_z_validation():
    stub = _FlowStub()
    with pytest.raises(ValueError):
        sample_sequential_z(stub, None, KEY, 0, (4, 4, 8, 1), 4)
    with pytest.raises(ValueError):
        sample_sequential_z(stub, None, KEY, 2, (4, 4, 8, 1), 3)  # odd
    with pytest.raises(ValueError):
        sample_sequential_z(stub, None, KEY, 2, (4, 4, 8, 1), 8)  # >= dz


@pytest.mark.slow
def test_sequential_with_real_flow_model():
    """End-to-end: tiny SIModel, 2 blocks with real sampling/inpainting."""
    import flax.linen as nn

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, t=None, y=None, train=False):
            h = nn.Conv(4, (3, 3, 3), padding="SAME")(x)
            return nn.Conv(1, (3, 3, 3), padding="SAME")(nn.silu(h))

    model = SIModel(Net(), SIModelConfig(scheduler="linear",
                                         loss_metric="mse"))
    variables = model.init(KEY, (1, 4, 4, 6, 1))
    vol = sample_sequential_z(model, variables, KEY, num_blocks=2,
                              base_shape=(4, 4, 6, 1), overlap_size=2,
                              nsteps=4)
    assert vol.shape == (1, 4, 4, 12, 1)
    assert np.isfinite(np.asarray(vol)).all()


# ---------------------------------------------------------------------------
# porosity maps
# ---------------------------------------------------------------------------
def test_interpolate_array():
    out = interpolate_array([0.0, 2.0, 4.0])
    np.testing.assert_allclose(out, [0, 1, 2, 3, 4])
    out = interpolate_array([0.0, 2.0, 4.0], method="spline")
    np.testing.assert_allclose(out, [0, 1, 2, 3, 4], atol=1e-8)


def test_vertical_porosity_map():
    grid = make_vertical_porosity_map([0.1, 0.3], grid_size=(2, 2),
                                      as_condition=False)
    assert grid.shape == (2, 2, 3)
    np.testing.assert_allclose(grid[0, 0], [0.1, 0.2, 0.3], rtol=1e-6)
    conds = make_vertical_porosity_map([0.1, 0.3], as_condition=True)
    assert conds.shape == (2, 2, 3)
    assert float(conds[0, 0, 1]["porosity"][0]) == pytest.approx(0.2)


def test_matern_grid_sample():
    samples = matern_grid_sample(
        sizes=[1.0, 1.0], grid=[4, 4], mean_val=0.0,
        params={"sigma_sq": 1.0, "nu": 1.5, "length_scale": 0.3},
        nsamples=3, seed=0)
    assert samples.shape == (3, 4, 4)
    assert np.all((samples > 0) & (samples < 1))  # logistic-squashed


# ---------------------------------------------------------------------------
# embedders
# ---------------------------------------------------------------------------
@pytest.mark.slow
def test_embedders():
    from diffsci_tpu.models.nets.embedders import (
        TwoPointCorrelationEmbedder, TwoPointCorrelationTransformer,
        PoreSizeDistEmbedder, PorosityEmbedder, CompositeEmbedder,
        DateGaussianFourierProjection, GeoGaussianFourierProjection)

    data = {"tpc_dist": jnp.linspace(0, 1, 10)[None].repeat(2, 0),
            "tpc_prob": jnp.linspace(0.9, 0.1, 10)[None].repeat(2, 0),
            "psd_centers": jnp.linspace(0, 1, 10)[None].repeat(2, 0),
            "psd_cdf": jnp.linspace(0, 1, 10)[None].repeat(2, 0),
            "porosity": jnp.asarray([[0.2], [0.4]])}

    for emb, expect in [
        (TwoPointCorrelationEmbedder(16, reduction="mean"), (2, 16)),
        (TwoPointCorrelationTransformer(16, nhead=2, num_layers=1), (2, 16)),
        (PoreSizeDistEmbedder(16, reduction="mean"), (2, 16)),
        (PorosityEmbedder(16), (2, 16)),
    ]:
        variables = emb.init(KEY, data)
        out = emb.apply(variables, data)
        assert out.shape == expect, type(emb).__name__

    comp = CompositeEmbedder([PorosityEmbedder(16),
                              PoreSizeDistEmbedder(16, reduction="mean")])
    variables = comp.init(KEY, data)
    out = comp.apply(variables, data)
    assert out.shape == (2, 16)

    date = DateGaussianFourierProjection(8)
    v = date.init(KEY, jnp.asarray([10.0, 200.0]))
    assert date.apply(v, jnp.asarray([10.0, 200.0])).shape == (2, 8)
    geo = GeoGaussianFourierProjection(8)
    ll = jnp.asarray([[10.0, 20.0], [-45.0, 170.0]])
    v = geo.init(KEY, ll)
    assert geo.apply(v, ll).shape == (2, 8)
