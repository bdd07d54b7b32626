"""python -m diffsci_tpu CLI: info / sample / serve over a saved
checkpoint (the installed-package deployment surface)."""

import json
import threading
import urllib.request

import numpy as np
import pytest
import jax

from diffsci_tpu.models import (KarrasModel, KarrasModelConfig, MLPUncond,
                                EMATracker, create_train_state,
                                make_train_step)
from diffsci_tpu.checkpoint import save_checkpoint
from diffsci_tpu.cli import main


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    path = tmp_path_factory.mktemp("cli") / "ckpt"
    model = KarrasModel(MLPUncond(dim=2, hidden_dims=[8]),
                        KarrasModelConfig.from_edm(loss_metric="mse"))
    tracker = EMATracker(ema_type="power", power_function_stds=[0.05])
    state, tx = create_train_state(model, jax.random.PRNGKey(0), (4, 2),
                                   ema=tracker)
    step = make_train_step(model, tx, ema=tracker)
    state, _ = step(state, jax.random.PRNGKey(1),
                    jax.random.normal(jax.random.PRNGKey(2), (4, 2)))
    save_checkpoint(path, state, description=model.export_description())
    return str(path)


def test_cli_info(ckpt, capsys):
    assert main(["info", "--ckpt", ckpt]) == 0
    desc = json.loads(capsys.readouterr().out)
    assert desc.get("config_description", {}).get("tag") == "edm"


def test_cli_info_missing(tmp_path, capsys):
    assert main(["info", "--ckpt", str(tmp_path)]) == 1


def test_cli_sample(ckpt, tmp_path, capsys):
    out = tmp_path / "s.npy"
    rc = main(["sample", "--ckpt", ckpt, "--shape", "2",
               "--nsamples", "5", "--seed", "3", "--nsteps", "4",
               "--out", str(out)])
    assert rc == 0
    arr = np.load(out)
    assert arr.shape == (5, 2) and np.all(np.isfinite(arr))
    # seeded determinism across invocations
    out2 = tmp_path / "s2.npy"
    main(["sample", "--ckpt", ckpt, "--shape", "2", "--nsamples", "5",
          "--seed", "3", "--nsteps", "4", "--out", str(out2)])
    np.testing.assert_array_equal(arr, np.load(out2))


@pytest.mark.slow
def test_cli_serve_flow(ckpt):
    """serve wires from_checkpoint -> warmup -> build_server; drive it
    in-process on port 0 rather than blocking on serve_forever."""
    from diffsci_tpu.serving import SamplerService, build_server

    svc = SamplerService.from_checkpoint(ckpt, (2,), ema_stds=[0.05],
                                         batch_buckets=(4,), nsteps=4)
    svc.warmup()
    server = build_server(svc, port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/sample",
            data=json.dumps({"nsamples": 2, "seed": 1}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        assert out["shape"] == [2, 2]
    finally:
        server.shutdown()
        svc.close()
