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
