"""Round-5 golden parity: the magnitude-preserving (EDM2) stack and the
remaining unpinned utility surfaces (VERDICT round 4, items 3 and 8).

Fixtures: scripts/gen_fixtures.py --only r5 (executes the reference at
/root/reference offline; outputs committed).

- normedlayers_golden.npz — MagnitudePreservingLinear/Conv2d/Conv3d
  (reference normedlayers.py:6-99): eval forward, train forward, the
  in-place-renormed stored weight, and the weight after one SGD step,
  pinning the in-place-renorm -> functional-renorm + optimizer
  re-projection translation end to end.
- cosine_attention.npz — cosine_product_attn/dot_product_attn
  (attention.py:247-381) and the in-house MultiHeadAttention module
  (attention.py:105-244) cosine plain/mp, incl. mp train renorm + step.
- punetg_mp.npz — full PUNetG convolution_type='mp', attn_type='cosine'
  eval forward with transferred weights (punetg.py:217-236).
- admmp_forward.npz — admmp.ADM forward (admmp.py:116-214). Executed
  side-by-side at generation time, admmp.ADM is bit-identical to adm.ADM
  (same state-dict keys; loading admmp weights into adm reproduces the
  output with max|delta| = 0.0) — so our single ADM covers both; this
  test pins our ADM against the EXECUTED admmp output directly.
- periodic_golden.npz — periodic_getitem[_extended]/setitem
  (torchutils.py:107-308) incl. multi-period tiling.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffsci_tpu.extra import converters
from diffsci_tpu.models.karras.train import renormalize_mp_weights

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "reference")


def _check(ours, ref, rtol=5e-5, atol=5e-6, label=""):
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=rtol, atol=atol, err_msg=label)


# ---------------------------------------------------------------------------
# normedlayers: forward + renorm + one SGD step (normedlayers.py:6-99)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def nl_gold():
    return np.load(os.path.join(FIXDIR, "normedlayers_golden.npz"))


def _nl_case(nl_gold, name):
    """Build the repo layer + channels-last data for a fixture case."""
    from diffsci_tpu.models.nets import normed

    w0 = nl_gold[f"{name}_w0"]
    b0 = nl_gold[f"{name}_b0"]
    x = nl_gold[f"{name}_x"]
    if name == "linear":
        layer = normed.MagnitudePreservingDense(w0.shape[0])
        params = {"w_mp": converters.torch_linear_to_jax(w0),
                  "bias": b0}
        to_jax = lambda a: jnp.asarray(a)                      # noqa: E731
        w_to_jax = converters.torch_linear_to_jax
    else:
        layer = normed.MagnitudePreservingConv(w0.shape[0], w0.shape[-1])
        params = {"w_mp": converters.torch_kernel_to_jax(w0),
                  "bias": b0}
        ndim = w0.ndim - 2
        perm = (0,) + tuple(range(2, 2 + ndim)) + (1,)
        to_jax = lambda a: jnp.asarray(a).transpose(perm)      # noqa: E731
        w_to_jax = converters.torch_kernel_to_jax
    params = jax.tree.map(jnp.asarray, params)
    return layer, params, to_jax(x), to_jax, w_to_jax


@pytest.mark.parametrize("name", ["linear", "conv2d", "conv3d"])
def test_normedlayers_eval_forward(nl_gold, name):
    layer, params, x, to_jax, _ = _nl_case(nl_gold, name)
    y = layer.apply({"params": params}, x)
    _check(y, to_jax(nl_gold[f"{name}_y_eval"]),
           label=f"{name} eval forward")


@pytest.mark.parametrize("name", ["linear", "conv2d", "conv3d"])
def test_normedlayers_train_renorm_and_step(nl_gold, name):
    """The reference renormalizes the STORED weight in place on every
    train forward (normedlayers.py:18-22); our equivalent renormalizes
    stored params in the optimizer update (train.py
    renormalize_mp_weights). Pin all three stages: the renormed weight,
    the train-mode output, and the weight after one SGD(lr=0.1) step on
    sum(y^2)."""
    layer, params, x, to_jax, w_to_jax = _nl_case(nl_gold, name)
    renormed = renormalize_mp_weights(params)
    _check(renormed["w_mp"], w_to_jax(nl_gold[f"{name}_w_renormed"]),
           label=f"{name} renormed weight")

    def loss_fn(p):
        y = layer.apply({"params": p}, x)
        return jnp.sum(y ** 2), y

    (loss, y), grads = jax.value_and_grad(loss_fn, has_aux=True)(renormed)
    _check(y, to_jax(nl_gold[f"{name}_y_train"]),
           label=f"{name} train forward")
    _check(loss, nl_gold[f"{name}_loss"], rtol=1e-4,
           label=f"{name} loss")
    stepped = jax.tree.map(lambda p, g: p - 0.1 * g, renormed, grads)
    _check(stepped["w_mp"], w_to_jax(nl_gold[f"{name}_w_after_step"]),
           rtol=1e-4, atol=1e-5, label=f"{name} weight after step")
    _check(stepped["bias"], nl_gold[f"{name}_b_after_step"],
           rtol=1e-4, atol=1e-5, label=f"{name} bias after step")


# ---------------------------------------------------------------------------
# cosine / mp attention (attention.py:105-381)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def attn_gold():
    return np.load(os.path.join(FIXDIR, "cosine_attention.npz"))


def test_attention_functions(attn_gold):
    from diffsci_tpu.models.nets import attention

    q, k, v = (jnp.asarray(attn_gold[n]) for n in ("q", "k", "v"))
    _check(attention.cosine_attention(q, k, v),
           attn_gold["fn_cosine_out"], label="cosine_product_attn")
    _check(attention.dot_product_attention(q, k, v),
           attn_gold["fn_dot_out"], label="dot_product_attn")


def _mha_params(attn_gold, tag, pfx):
    return {f"{pfx}_{nm}": jnp.asarray(attn_gold[f"mha_{tag}_w{nm}"])
            for nm in ("q", "k", "v", "o")}


def test_mha_cosine_plain(attn_gold):
    """In-house MHA, attn_type='cosine', mp off. Pins the reference's
    UNCONDITIONAL /sqrt(fan_in) projection scaling
    (attention.py:182-196) — present even without magnitude
    preservation."""
    from diffsci_tpu.models.nets.attention import MultiHeadAttention

    mha = MultiHeadAttention(2, attn_type="cosine", fan_in_scaled=True)
    params = _mha_params(attn_gold, "plain", "w")
    x = jnp.asarray(attn_gold["mha_plain_x"])
    out = mha.apply({"params": params}, x)
    _check(out, attn_gold["mha_plain_out"], label="cosine MHA plain")


def test_mha_cosine_mp_eval_and_train(attn_gold):
    from diffsci_tpu.models.nets.attention import MultiHeadAttention

    mha = MultiHeadAttention(2, attn_type="cosine",
                             magnitude_preserving=True)
    params = _mha_params(attn_gold, "mp", "w_mp")
    x = jnp.asarray(attn_gold["mha_mp_x"])
    out = mha.apply({"params": params}, x)
    _check(out, attn_gold["mha_mp_out"], label="cosine MHA mp eval")

    # train semantics: stored projections renormed (attention.py:171-180
    # in-place; ours via the optimizer-update re-projection), then one
    # SGD(lr=0.1) step on sum(out^2)
    renormed = renormalize_mp_weights(params)
    _check(renormed["w_mp_q"], attn_gold["mha_mp_wq_renormed"],
           label="mp wq renormed")
    _check(renormed["w_mp_o"], attn_gold["mha_mp_wo_renormed"],
           label="mp wo renormed")

    def loss_fn(p):
        out = mha.apply({"params": p}, x)
        return jnp.sum(out ** 2), out

    (loss, out_t), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        renormed)
    _check(out_t, attn_gold["mha_mp_out_train"], label="mp train out")
    _check(loss, attn_gold["mha_mp_loss"], rtol=1e-4, label="mp loss")
    stepped = jax.tree.map(lambda p, g: p - 0.1 * g, renormed, grads)
    _check(stepped["w_mp_q"], attn_gold["mha_mp_wq_after_step"],
           rtol=1e-4, atol=1e-5, label="mp wq after step")


# ---------------------------------------------------------------------------
# PUNetG convolution_type='mp' + attn_type='cosine' (punetg.py:217-236)
# ---------------------------------------------------------------------------
def test_punetg_mp_forward_with_reference_weights():
    """Pins against the reference executed in FLOAT64 (`y_f64`), not the
    f32 run: torch's f32 GroupNorm takes a less accurate reduction path on
    the live non-contiguous tensors and lands up to 7.5e-3 from the true
    per-layer value on the low-spatial-variance post-attention activations
    (measured at fixture generation: the reference's own f32 output is
    1.6e-3 from its f64 output, while our f32 forward is 2e-5 from it).
    A loose secondary bound vs the f32 `y` documents that envelope."""
    from diffsci_tpu.models import PUNetG, PUNetGConfig

    d = np.load(os.path.join(FIXDIR, "punetg_mp.npz"))
    sd = {k[4:]: d[k] for k in d.files if k.startswith("sd__")}
    config = PUNetGConfig(model_channels=8,
                          channel_expansion=[2],
                          number_resnet_downward_block=1,
                          number_resnet_upward_block=1,
                          number_resnet_attn_block=2,
                          number_resnet_before_attn_block=1,
                          number_resnet_after_attn_block=1,
                          convolution_type="mp",
                          attn_type="cosine",
                          num_groups=1)
    net = PUNetG(config)
    x = jnp.asarray(d["x"]).transpose(0, 2, 3, 1)
    t = jnp.asarray(d["t"])
    template = net.init(jax.random.PRNGKey(0), x, t)
    variables = converters.import_reference_punetg(
        sd, template, convolution_type="mp")
    y = net.apply(variables, x, t)
    y_ref = d["y_f64"].transpose(0, 2, 3, 1)
    assert y.shape == y_ref.shape
    _check(y, y_ref, rtol=5e-4, atol=5e-5, label="PUNetG mp forward (f64)")
    _check(y, d["y"].transpose(0, 2, 3, 1), rtol=5e-2, atol=2e-3,
           label="PUNetG mp forward (f32 torch-noise envelope)")


# ---------------------------------------------------------------------------
# admmp.ADM (admmp.py:116-214) — executed-reference pin
# ---------------------------------------------------------------------------
def test_admmp_forward_with_reference_weights():
    """admmp.ADM is a renamed structural twin of adm.ADM: at fixture
    generation both were executed and the outputs matched with
    max|delta| = 0.0 (recorded in the fixture as adm_twin_max_delta).
    Our single ADM implementation therefore covers the reference's
    admmp.py; here its forward is pinned against the EXECUTED admmp
    output with transferred admmp weights."""
    from diffsci_tpu.models.nets import ADM, ADMConfig

    d = np.load(os.path.join(FIXDIR, "admmp_forward.npz"))
    assert float(d["adm_twin_max_delta"]) == 0.0
    sd = {k[4:]: d[k] for k in d.files if k.startswith("sd__")}
    net = ADM(ADMConfig(model_channels=8, time_embed_dim=8,
                        output_embed_dim=16, channel_expansion=[2],
                        number_resnet_downward_block=1,
                        number_resnet_upward_block=1,
                        number_resnet_attn_block=2,
                        number_resnet_before_attn_block=1,
                        number_resnet_after_attn_block=1, num_groups=1))
    x = jnp.asarray(d["x"]).transpose(0, 2, 3, 1)
    t = jnp.asarray(d["t"])
    template = net.init(jax.random.PRNGKey(0), x, t)
    variables = converters.import_reference_adm(sd, template)
    y = net.apply(variables, x, t)
    _check(y, d["y"].transpose(0, 2, 3, 1), rtol=5e-4, atol=5e-5,
           label="admmp forward")


# ---------------------------------------------------------------------------
# periodic slicing (torchutils.py:107-308)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def per_gold():
    return np.load(os.path.join(FIXDIR, "periodic_golden.npz"))


def test_periodic_getitem_extended(per_gold):
    from diffsci_tpu.utils import periodic

    a1 = jnp.asarray(per_gold["a1"])
    a2 = jnp.asarray(per_gold["a2"])
    a3 = jnp.asarray(per_gold["a3"])
    cases = {
        "ext_1d_a": (a1, (slice(-2, 7),)),
        "ext_1d_b": (a1, (slice(0, 10),)),
        "ext_1d_c": (a1, (slice(4, 6),)),
        "ext_2d_a": (a2, (slice(-3, 9), slice(None))),
        "ext_2d_b": (a2, (slice(1, 9), slice(-2, 12))),
        "ext_3d_a": (a3, (slice(None), slice(-4, 9), slice(2, 11))),
    }
    for name, (a, idx) in cases.items():
        out = periodic.periodic_getitem_extended(a, *idx)
        _check(out, per_gold[name], rtol=0, atol=0, label=name)


def test_periodic_getitem_wrap(per_gold):
    from diffsci_tpu.utils import periodic

    a2 = jnp.asarray(per_gold["a2"])
    cases = {
        "get_1d_wrap": (slice(4, 2),),
        "get_2d_wrap": (slice(3, 1), slice(5, 2)),
        "get_2d_neg": (slice(-2, 1), slice(None)),
    }
    for name, idx in cases.items():
        out = periodic.periodic_getitem(a2, *idx)
        _check(out, per_gold[name], rtol=0, atol=0, label=name)


def test_periodic_setitem(per_gold):
    from diffsci_tpu.utils import periodic

    a2 = jnp.asarray(per_gold["a2"])
    val = jnp.asarray(per_gold["set_2d_value"])
    out = periodic.periodic_setitem(a2, val, slice(4, 2), slice(5, 2))
    _check(out, per_gold["set_2d_out"], rtol=0, atol=0,
           label="periodic_setitem wrap")
