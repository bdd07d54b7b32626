"""Smoke for the packaged reference-FID reproduction
(scripts/repro_reference_fid.py): train->sample->score end-to-end on
synthetic data with tiny settings. The real-data run (mnist.npz +
pt_inception weights) is the one-command parity check of BASELINE.md's
FID targets."""

import json
import pathlib
import sys

import pytest

pytestmark = pytest.mark.slow

SCRIPTS = pathlib.Path(__file__).resolve().parents[1] / "scripts"


def test_repro_fid_smoke(tmp_path):
    sys.path.insert(0, str(SCRIPTS))
    try:
        import repro_reference_fid as rrf
    finally:
        sys.path.pop(0)
    results = rrf.main(["--smoke", "--outdir", str(tmp_path)])
    assert set(results) == {"ode_heun", "sde_gamma1.0", "sde_gamma3.0"}
    out = json.loads((tmp_path / "fid_results.json").read_text())
    assert out["targets"]["ode_heun"] == 46.356
    assert all(v >= 0 for v in out["results"].values())


def test_repro_fid_data_present_branch(tmp_path):
    """The real-data branch executes end to end against a driver-placed
    mnist.npz (array 'x', uint8 [N, 28, 28]) — proving the one-command
    parity check needs only the file to land at the documented path."""
    import numpy as np

    rng = np.random.default_rng(7)
    x = (rng.random((64, 28, 28)) * 255).astype(np.uint8)
    datafile = tmp_path / "mnist.npz"
    np.savez(datafile, x=x)

    sys.path.insert(0, str(SCRIPTS))
    try:
        import repro_reference_fid as rrf
    finally:
        sys.path.pop(0)
    results = rrf.main(["--smoke", "--data", str(datafile),
                        "--outdir", str(tmp_path / "out")])
    assert set(results) == {"ode_heun", "sde_gamma1.0", "sde_gamma3.0"}
    out = json.loads((tmp_path / "out" / "fid_results.json").read_text())
    assert out["data"] == str(datafile)  # real-data branch taken
    assert all(np.isfinite(v) for v in out["results"].values())
