"""XSpace trace reader (diffsci_tpu/profiling.py).

The reference has no profiler tooling to mirror; these tests pin our
pure-Python protobuf wire decoder against a REAL trace produced by this
image's jax.profiler, which is the empirical check that the hand-written
xplane.proto field numbers are right.
"""

import jax
import jax.numpy as jnp
import pytest

from diffsci_tpu import profiling


@pytest.fixture(scope="module")
def tracedir(tmp_path_factory):
    d = tmp_path_factory.mktemp("trace")

    @jax.jit
    def f(x):
        return (x @ x).sum()

    x = jnp.ones((256, 256))
    f(x).block_until_ready()
    jax.profiler.start_trace(str(d))
    for _ in range(3):
        f(x).block_until_ready()
    jax.profiler.stop_trace()
    return str(d)


def test_parse_real_trace(tracedir):
    path = profiling.find_xplane(tracedir)
    space = profiling.parse_xspace(path)
    assert space.planes, "no planes decoded"
    names = [p.name for p in space.planes]
    assert any("CPU" in n or "TPU" in n for n in names), names
    # every plane decodes lines and metadata into sane python strings
    total_events = sum(len(ln.events) for p in space.planes
                       for ln in p.lines)
    assert total_events > 0


def test_op_summary_finds_matmul(tracedir):
    space = profiling.parse_xspace(profiling.find_xplane(tracedir))
    rows = profiling.op_summary(space, plane="cpu")
    assert rows
    names = " ".join(r["name"] for r in rows)
    assert "dot" in names or "fusion" in names, names[:400]
    # durations aggregate to non-negative microseconds (instant events
    # are zero-duration) and pct sums to ~100
    assert all(r["total_us"] >= 0 for r in rows)
    assert rows[0]["total_us"] > 0
    assert abs(sum(r["pct"] for r in rows) - 100.0) < 1e-6
    # the jitted matmul ran 3 times on the execute line
    top = rows[0]
    assert top["count"] >= 1 and top["avg_us"] > 0


def test_overview_and_busy_fraction(tracedir):
    space = profiling.parse_xspace(profiling.find_xplane(tracedir))
    rows = profiling.plane_overview(space)
    assert rows and rows[0]["busy_ms"] > 0
    frac = profiling.device_busy_fraction(space, plane="cpu")
    assert 0.0 < frac <= 1.0
    out = profiling.format_summary(profiling.op_summary(space, "cpu"))
    assert "total_us" in out and "\n" in out


def test_cli_profile(tracedir, capsys):
    from diffsci_tpu.cli import main

    rc = main(["profile", tracedir, "--plane", "cpu", "--overview",
               "--top", "5"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "occupancy" in out and "total_us" in out
