"""Net-description registry (nets/describe.py): every net family
export_description()s to plain data and rebuilds by ``kind`` — the
declarative counterpart of the reference's eval-based loader
(reference diffsci/models/loader.py:32)."""

import json

import jax
import jax.numpy as jnp
import pytest

from diffsci_tpu.models.nets.describe import net_from_description

KEY = jax.random.key(0)


def _nets():
    from diffsci_tpu.models.nets import (HFNet, HFNetCond, UNet2D,
                                         MLPUncond, MLPCond, ADM, ADMConfig,
                                         PUNetG, PUNetGConfig, PUNetGCond,
                                         DiffusionTransformer)
    from diffsci_tpu.models.nets.convit import ConVit, ConVitConfig
    return [
        HFNet(block_channels=(8, 16), channels=1, norm_num_groups=4,
              attn_up_and_down=True),
        HFNetCond(block_channels=(8, 16), channels=1, cond_channels=2,
                  norm_num_groups=4),
        UNet2D(block_out_channels=(8, 16), in_channels=2, out_channels=2,
               attn_down=(False, True), attn_up=(True, False),
               norm_num_groups=4),
        MLPUncond(dim=3, hidden_dims=(8, 8)),
        MLPCond(dim=3, ydim=2, hidden_dims=(8,)),
        ADM(ADMConfig(model_channels=8, time_embed_dim=8,
                      output_embed_dim=16, channel_expansion=(2,),
                      num_groups=4)),
        PUNetG(PUNetGConfig(model_channels=8, channel_expansion=[2],
                            num_groups=4)),
        PUNetGCond(PUNetGConfig(model_channels=8, channel_expansion=[2],
                                input_channels=3, num_groups=4),
                   channel_conditional_items=("obs",)),
        DiffusionTransformer(nembed=16, nheads=2, nblocks=2, patch_size=4),
        ConVit(ConVitConfig(embed_dim=8, num_layers=1, num_heads=2,
                            has_time_embedding=True)),
    ]


@pytest.mark.parametrize("net", _nets(),
                         ids=lambda n: type(n).__name__)
def test_export_rebuild_round_trip(net):
    desc = net.export_description()
    # plain data: must survive a JSON round-trip (checkpoint descriptions
    # are stored as JSON/msgpack)
    desc = json.loads(json.dumps(desc))
    rebuilt = net_from_description(desc)
    assert type(rebuilt) is type(net)
    assert rebuilt == net  # flax modules are dataclasses: full field eq


def test_legacy_punetg_descriptions_still_rebuild():
    """Descriptions written before ``kind`` existed: PUNetG export shape
    without the kind key, and the oldest bare config-kwargs shape."""
    from diffsci_tpu.models.nets import PUNetGConfig
    cfg = PUNetGConfig(model_channels=8, channel_expansion=[2], num_groups=4)
    legacy = dict(config=cfg.export_description(),
                  conditional_embedding_args=None,
                  has_conditional_embedding=False)
    rebuilt = net_from_description(legacy)
    from diffsci_tpu.models.nets import PUNetG as P
    assert type(rebuilt) is P and rebuilt.config == cfg
    bare = net_from_description(cfg.export_description())
    assert type(bare) is P and bare.config == cfg


def test_unknown_kind_raises():
    with pytest.raises(ValueError, match="unknown net kind"):
        net_from_description({"kind": "nope", "config": {}})


@pytest.mark.slow
def test_karras_model_from_description_dispatches_hfnet():
    """End to end: an HFNet-backed KarrasModel round-trips through its
    checkpoint description and produces identical outputs."""
    from diffsci_tpu.models.nets import HFNetUncond
    from diffsci_tpu.models.karras import (KarrasModel, KarrasModelConfig,
                                           karras_model_from_description)
    net = HFNetUncond(block_channels=(8, 16), channels=1, norm_num_groups=4)
    model = KarrasModel(net, KarrasModelConfig.from_edm())
    desc = json.loads(json.dumps(model.export_description()))
    rebuilt = karras_model_from_description(desc)
    # HFNetUncond rebuilds as its parent HFNet: same fields, same param
    # tree, same forward — only the subclass label is not round-tripped
    assert rebuilt.model.block_channels == net.block_channels
    assert rebuilt.model.cond_channels == 0
    variables = model.init(KEY, (2, 16, 16, 1))
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 1))
    sigma = jnp.full((2,), 1.0)
    a, _ = model.get_denoiser(variables, x, sigma)
    b, _ = rebuilt.get_denoiser(variables, x, sigma)
    assert jnp.array_equal(a, b)


def test_punetg_cond_description_no_longer_flattens():
    """Regression: PUNetGCond descriptions used to silently rebuild as
    plain PUNetG (dropping channel conditioning)."""
    from diffsci_tpu.models.nets import PUNetGCond, PUNetGConfig
    net = PUNetGCond(PUNetGConfig(model_channels=8, channel_expansion=[2],
                                  input_channels=3, num_groups=4),
                     channel_conditional_items=("obs",))
    rebuilt = net_from_description(
        json.loads(json.dumps(net.export_description())))
    assert type(rebuilt) is PUNetGCond
    assert rebuilt.channel_conditional_items == ("obs",)
