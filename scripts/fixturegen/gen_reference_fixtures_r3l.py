"""Round-3l golden parity fixtures: the porosity-map utilities
(extra/porosity_map.py:9-177) — Matern-field covariance/Cholesky, a
sample with a replayed z, interpolate_array, make_vertical_porosity_map
and get_grid_center.

Usage: python scripts/gen_reference_fixtures_r3l.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_reference_fixtures import install_stubs, OUTDIR  # noqa: E402


def gen_porosity_map():
    from diffsci.extra.porosity_map import (MaternFieldSampler,
                                            interpolate_array,
                                            make_vertical_porosity_map,
                                            get_grid_center)

    rng = np.random.default_rng(220)
    X = rng.uniform(0.0, 4.0, (12, 2))
    params = {"sigma_sq": 1.3, "nu": 1.5, "length_scale": 0.8}
    gp = MaternFieldSampler(X, mean_val=0.4, params=params)
    z = rng.standard_normal((12, 3))
    orig = np.random.normal
    np.random.normal = lambda size=None, **kw: z
    try:
        samples = gp.sample(3)
    finally:
        np.random.normal = orig
    out = {
        "X": X, "z": z,
        "K": gp.K, "L": gp.L,
        "samples": samples,
        "interp_in": np.array([0.1, 0.5, 0.2, 0.9]),
        "interp_linear": interpolate_array([0.1, 0.5, 0.2, 0.9],
                                           method="linear"),
        "interp_spline": interpolate_array([0.1, 0.5, 0.2, 0.9],
                                           method="spline"),
        "vmap_grid": make_vertical_porosity_map(
            [0.1, 0.5, 0.2, 0.9], grid_size=(3, 2), method="linear",
            as_condition=False),
    }
    gc = get_grid_center((4.0, 6.0), (2, 3))
    for i, g in enumerate(gc):
        out[f"grid_center_{i}"] = g
    print(f"  porosity: L cond {np.linalg.cond(out['L']):.2f}, "
          f"samples mean {samples.mean():.4f}")
    np.savez_compressed(os.path.join(OUTDIR, "porosity_map.npz"), **out)
    print("wrote porosity_map.npz")


def main():
    install_stubs()
    sys.path.insert(0, "/root/reference")
    os.makedirs(OUTDIR, exist_ok=True)
    gen_porosity_map()


if __name__ == "__main__":
    main()
