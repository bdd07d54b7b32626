"""Native DDPM UNet (diffusers UNet2DModel spec) — structure + numerics.

The torch side (tests/_torch_unet2d.py) renders the same published spec
with diffusers' exact state-dict naming; these tests pin our channels-last
flax implementation and the ``import_diffusers_unet2d`` converter against
it. Covers the reference's HFNet backbone (reference hfnet.py:9-100).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffsci_tpu.models.nets.ddpm_unet import UNet2D
from diffsci_tpu.extra.converters import (diffusers_unet2d_name_map,
                                          import_diffusers_unet2d)

KEY = jax.random.key(0)


def _flat_paths(tree, prefix=()):
    out = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.extend(_flat_paths(v, prefix + (k,)))
    else:
        out.append("/".join(prefix))
    return out


@pytest.mark.parametrize("attn", [False, True])
@pytest.mark.slow
def test_unet2d_matches_torch_spec(attn):
    torch = pytest.importorskip("torch")
    from tests._torch_unet2d import TorchUNet2D

    torch.manual_seed(0)
    flags_down = (False, attn)
    flags_up = (attn, False)
    tnet = TorchUNet2D(block_out_channels=(8, 16), in_channels=3,
                       out_channels=2, attn_down=flags_down,
                       attn_up=flags_up, norm_num_groups=4)
    tnet.eval()
    x = torch.randn(2, 3, 16, 16)
    t = torch.tensor([3.0, 250.0])
    with torch.no_grad():
        ref = tnet(x, t).numpy()

    jnet = UNet2D(block_out_channels=(8, 16), in_channels=3, out_channels=2,
                  attn_down=flags_down, attn_up=flags_up, norm_num_groups=4)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    tj = jnp.asarray(t.numpy())
    variables = jnet.init(KEY, xj, tj)

    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    # every torch key maps, and the map covers the flax tree exactly
    name_map = diffusers_unet2d_name_map(sd.keys())
    assert sorted(name_map) == sorted(_flat_paths(variables))

    variables = import_diffusers_unet2d(sd, variables)
    out = jnet.apply(variables, xj, tj)
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_unet2d_3d_and_jit():
    """Dimension-agnostic bonus surface: the same module runs 3D, under
    jit, with grads."""
    net = UNet2D(block_out_channels=(8, 16), in_channels=1, out_channels=1,
                 attn_down=(False, True), attn_up=(True, False),
                 norm_num_groups=4)
    x = jnp.ones((2, 8, 8, 8, 1))
    t = jnp.ones((2,))
    v = net.init(KEY, x, t)
    out = jax.jit(lambda v, x, t: net.apply(v, x, t))(v, x, t)
    assert out.shape == x.shape

    def loss(params):
        return jnp.sum(net.apply({"params": params}, x, t) ** 2)

    g = jax.grad(loss)(v["params"])
    gnorm = jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0)
    assert jnp.isfinite(gnorm) and gnorm > 0


@pytest.mark.slow
def test_unet2d_arbitrary_block_channels():
    """Non-integral channel ratios (e.g. diffusers' own (224, 448, 672))
    are allowed — the old PUNetG-shim restriction is gone."""
    net = UNet2D(block_out_channels=(8, 12), in_channels=1, out_channels=1,
                 norm_num_groups=4)
    x = jnp.ones((2, 8, 8, 1))
    v = net.init(KEY, x, jnp.ones((2,)))
    assert net.apply(v, x, jnp.ones((2,))).shape == x.shape


def test_unet2d_flag_validation():
    net = UNet2D(block_out_channels=(8, 16), attn_down=(True,))
    with pytest.raises(ValueError):
        net.init(KEY, jnp.ones((1, 8, 8, 1)), jnp.ones((1,)))


@pytest.mark.slow
def test_unet2d_flash_backend_parity():
    """One parameterization, both attention backends: a checkpoint trained
    with 'xla' must produce identical outputs under 'flash' (interpret
    mode; TPU numerics are asserted on-device by bench.py)."""
    import numpy as np
    from diffsci_tpu.kernels import flash_attention as fa_mod

    kwargs = dict(block_out_channels=(8, 16), in_channels=1, out_channels=1,
                  attn_down=(False, True), attn_up=(True, False),
                  norm_num_groups=4)
    net_x = UNet2D(**kwargs)
    net_f = UNet2D(**kwargs, backend="flash")
    x = jax.random.normal(jax.random.key(3), (2, 16, 16, 1))
    t = jnp.asarray([1.0, 7.0])
    v = net_x.init(KEY, x, t)
    out_x = net_x.apply(v, x, t)
    fa_mod.INTERPRET = True
    old_mt = fa_mod.DEFAULT_MIN_TOKENS
    fa_mod.DEFAULT_MIN_TOKENS = 1
    try:
        out_f = net_f.apply(v, x, t)
    finally:
        fa_mod.INTERPRET = False
        fa_mod.DEFAULT_MIN_TOKENS = old_mt
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               rtol=2e-4, atol=2e-5)
