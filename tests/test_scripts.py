"""Train-script surface smoke tests: each script's main() runs a tiny
end-to-end configuration in-process (argparse -> data -> fit ->
checkpoint), protecting the user-facing entry points the way the
reference's scripts/ are its public recipe surface."""

import pathlib
import sys

import pytest

SCRIPTS = pathlib.Path(__file__).resolve().parents[1] / "scripts"
sys.path.insert(0, str(SCRIPTS))


def _run(monkeypatch, module, argv):
    import importlib
    mod = importlib.import_module(module)
    monkeypatch.setattr(sys, "argv", [f"{module}.py"] + argv)
    mod.main()


@pytest.mark.slow
def test_train_diffusion_mnist_smoke(tmp_path, monkeypatch):
    _run(monkeypatch, "train_diffusion_mnist",
         ["--steps", "2", "--batch", "8", "--channels", "8",
          "--outdir", str(tmp_path)])
    assert (tmp_path / "ckpt" / "description.json").exists()
    assert (tmp_path / "metrics.jsonl").exists()


@pytest.mark.slow
def test_train_diffusion_cifar10_smoke(tmp_path, monkeypatch):
    _run(monkeypatch, "train_diffusion_cifar10",
         ["--steps", "2", "--batch", "8", "--channels", "8",
          "--outdir", str(tmp_path)])
    assert (tmp_path / "ckpt" / "description.json").exists()


@pytest.mark.slow
def test_train_diffusion_toy_smoke(tmp_path, monkeypatch):
    _run(monkeypatch, "train_diffusion_toy",
         ["--steps", "2", "--batch", "16"])


@pytest.mark.slow
def test_train_vae_smoke(tmp_path, monkeypatch):
    _run(monkeypatch, "train_vae",
         ["--steps", "2", "--batch", "4", "--resolution", "16",
          "--outdir", str(tmp_path)])


@pytest.mark.slow
def test_train_diffusion_conditional_smoke(tmp_path, monkeypatch):
    _run(monkeypatch, "train_diffusion_conditional",
         ["--steps", "2", "--batch", "8", "--channels", "8",
          "--nsamples", "4", "--outdir", str(tmp_path)])


@pytest.mark.slow
def test_train_super_resolution_smoke(tmp_path, monkeypatch):
    _run(monkeypatch, "train_super_resolution",
         ["--steps", "2", "--batch", "8", "--channels", "8",
          "--nsamples", "4", "--ndraws", "2", "--outdir", str(tmp_path)])


@pytest.mark.slow
def test_train_ensemble_forecast_smoke(tmp_path, monkeypatch):
    _run(monkeypatch, "train_ensemble_forecast",
         ["--steps", "2", "--batch", "8", "--channels", "8",
          "--ensemble", "2", "--eval-ensemble", "2", "--size", "16",
          "--outdir", str(tmp_path)])


@pytest.mark.slow
def test_stochasticity_sweep_multiprocess_matches_sequential(tmp_path,
                                                             monkeypatch):
    """--processes N round-robins gamma arms over worker processes with
    parent-cached real features and parent-pre-split PRNG keys (the
    reference's colormap-parallel.py pattern) — output must be BITWISE
    equal to the sequential run."""
    import json

    seq = tmp_path / "seq.json"
    par = tmp_path / "par.json"
    common = ["--gammas", "0.0", "0.5", "1.0", "--nsamples", "16",
              "--nsteps", "4"]
    _run(monkeypatch, "stochasticity_sweep",
         common + ["--out", str(seq)])
    _run(monkeypatch, "stochasticity_sweep",
         common + ["--out", str(par), "--processes", "2"])
    a = json.loads(seq.read_text())
    b = json.loads(par.read_text())
    assert list(a) == list(b), (a, b)  # grid order preserved
    assert a == b, (a, b)              # bitwise-equal scores


def test_entropy_time_profile_and_correlations(tmp_path, monkeypatch):
    """The stochasticity-paper secondary-analysis pair (reference
    test-time_profile-correlation.py + test-correlation-thresholds.py):
    the profile study writes per-snapshot entropy curves + score-error
    profiles, and the threshold scan turns them into a correlation CSV
    with the notebook's improvement/deterioration scalars."""
    import csv
    import json

    out = tmp_path / "etp.json"
    _run(monkeypatch, "entropy_time_profile",
         ["--train-steps", "60", "--snapshot-every", "20",
          "--nsamples", "400", "--nsteps", "12", "--ngamma", "3",
          "--datasize", "200", "--batch", "64", "--out", str(out)])
    saved = json.loads(out.read_text())
    snaps = saved["snapshots"]
    assert len(snaps) == 3
    for snap in snaps.values():
        assert len(snap["gamma_values"]) == 3
        assert len(snap["sde_entropies"]) == 3
        assert len(snap["score_errors"]) == 12
        assert all(v >= 0 for v in snap["score_errors"])

    _run(monkeypatch, "correlation_thresholds",
         ["--input", str(out), "--epoch-threshold", "0",
          "--nsteps", "12", "--initial-range", "0.3", "0.9", "3",
          "--final-range", "0.05", "0.4", "3",
          "--late-range", "0.01", "0.2", "3"])
    csv_path = tmp_path / "etp.json.correlations.csv"
    rows = list(csv.DictReader(open(csv_path)))
    assert rows
    types = {r["type"] for r in rows}
    assert types == {"early_mid_vs_improvement", "late_vs_deterioration"}
    # triangular grid: every early row satisfies initial > final
    for r in rows:
        if r["type"] == "early_mid_vs_improvement":
            assert float(r["initial_threshold"]) > float(
                r["final_threshold"])
            assert int(r["step_initial"]) < int(r["step_final"])
