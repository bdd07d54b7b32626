"""HTTP sampling server smoke test: the stdlib deployment example
(scripts/serve_http.py) served over an in-process SamplerService."""

import json
import pathlib
import sys
import threading
import urllib.request
import urllib.error

import numpy as np
import pytest
import jax

from diffsci_tpu.models import KarrasModel, KarrasModelConfig
from diffsci_tpu.models.nets import MLPUncond
from diffsci_tpu.serving import SamplerService

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]
                       / "scripts"))
from serve_http import build_server  # noqa: E402


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, json.loads(r.read())


def _post(url, obj):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.mark.slow
def test_http_server_endpoints():
    model = KarrasModel(MLPUncond(dim=2, hidden_dims=(8,)),
                        KarrasModelConfig.from_edm())
    vs = model.init(jax.random.PRNGKey(0), (4, 2))
    svc = SamplerService(model, vs, shape=(2,), batch_buckets=(4,),
                         nsteps=4)
    svc.warmup()
    server = build_server(svc, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        code, health = _get(base + "/healthz")
        assert code == 200 and health["ok"]

        code, out = _post(base + "/sample", {"nsamples": 3, "seed": 7})
        assert code == 200 and out["shape"] == [3, 2]
        code, out2 = _post(base + "/sample", {"nsamples": 3, "seed": 7})
        np.testing.assert_array_equal(np.asarray(out["samples"]),
                                      np.asarray(out2["samples"]))

        code, err = _post(base + "/sample", {"nsamples": -1})
        assert code == 400 and "error" in err
        code, _ = _get(base + "/healthz")  # still serving after a 400
        assert code == 200

        code, stats = _get(base + "/stats")
        assert code == 200 and stats["requests"] >= 2
    finally:
        server.shutdown()
        svc.close()
