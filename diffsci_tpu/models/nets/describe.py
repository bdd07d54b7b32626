"""Declarative net descriptions: export a score network as plain data and
rebuild it by ``kind`` tag.

The reference reconstructs checkpointed models by ``eval`` of a stored
constructor string (reference diffsci/models/loader.py:32), which rebuilds
*any* net but executes arbitrary text. This registry keeps the same
capability declaratively: each net family exports
``{"kind": ..., "config": {...}}`` and ``net_from_description`` rebuilds it
from whitelisted constructors only.

Descriptions written before ``kind`` existed (round-2 checkpoints) carry a
PUNetG config dict and no ``kind`` key; they rebuild as PUNetG unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

__all__ = ["plain_module_description", "net_from_description",
           "register_net_kind", "NET_KINDS"]

# kind -> builder(config_kwargs, conditional_embedding) -> nn.Module
NET_KINDS: dict[str, Callable[..., Any]] = {}


def register_net_kind(kind: str):
    def deco(builder):
        NET_KINDS[kind] = builder
        return builder
    return deco


def plain_module_description(module, kind: str) -> dict[str, Any]:
    """Description for a flax module whose fields are all plain data
    (ints/floats/strs/sequences) — no submodule fields."""
    config = {}
    for f in dataclasses.fields(module):
        if f.name in ("parent", "name"):
            continue
        value = getattr(module, f.name)
        if isinstance(value, tuple):
            value = list(value)
        config[f.name] = value
    return dict(kind=kind, config=config)


def _builder(kind, import_path: tuple[str, str], tuples=()):
    """Register a builder that imports ``cls`` lazily and converts the
    listed config keys back to tuples (YAML/JSON round-trips lists)."""
    module_name, cls_name = import_path

    @register_net_kind(kind)
    def build(config: dict, conditional_embedding=None):
        import importlib
        cls = getattr(importlib.import_module(module_name), cls_name)
        config = dict(config)
        for key in tuples:
            if key in config and config[key] is not None:
                config[key] = tuple(config[key])
        if conditional_embedding is not None:
            config["conditional_embedding"] = conditional_embedding
        return cls(**config)

    return build


_NETS = "diffsci_tpu.models.nets"
_builder("hfnet", (f"{_NETS}.hfnet", "HFNet"), tuples=("block_channels",))
_builder("hfnet_cond", (f"{_NETS}.hfnet", "HFNetCond"),
         tuples=("block_channels",))
_builder("unet2d", (f"{_NETS}.ddpm_unet", "UNet2D"),
         tuples=("block_out_channels", "attn_down", "attn_up"))
_builder("mlp", (f"{_NETS}.mlp", "MLPUncond"), tuples=("hidden_dims",))
_builder("mlp_cond", (f"{_NETS}.mlp", "MLPCond"), tuples=("hidden_dims",))
_builder("dit", (f"{_NETS}.dit", "DiffusionTransformer"))
_builder("moe_dit", (f"{_NETS}.moe", "MoEDiffusionTransformer"))


@register_net_kind("punetg")
def _build_punetg(config: dict, conditional_embedding=None):
    from diffsci_tpu.models.nets.punetg import PUNetG, PUNetGConfig
    return PUNetG(PUNetGConfig.from_description(config),
                  conditional_embedding=conditional_embedding)


@register_net_kind("punetg_cond")
def _build_punetg_cond(config: dict, conditional_embedding=None):
    from diffsci_tpu.models.nets.punetg import PUNetGCond, PUNetGConfig
    config = dict(config)
    items = tuple(config.pop("channel_conditional_items", ()))
    return PUNetGCond(PUNetGConfig.from_description(config),
                      conditional_embedding=conditional_embedding,
                      channel_conditional_items=items)


@register_net_kind("convit")
def _build_convit(config: dict, conditional_embedding=None):
    from diffsci_tpu.models.nets.convit import ConVit, ConVitConfig
    return ConVit(ConVitConfig(**config),
                  conditional_embedding=conditional_embedding)


@register_net_kind("adm")
def _build_adm(config: dict, conditional_embedding=None):
    from diffsci_tpu.models.nets.adm import ADM, ADMConfig
    config = dict(config)
    if config.get("channel_expansion") is not None:
        config["channel_expansion"] = tuple(config["channel_expansion"])
    return ADM(ADMConfig(**config),
               conditional_embedding=conditional_embedding)


def net_from_description(net_desc: dict, conditional_embedding=None):
    """Rebuild a net from its exported description.

    Accepts both shapes in the wild: ``{"kind", "config", ...}`` (nets
    registered here) and the legacy PUNetG exports
    (``{"config": {...}, has_conditional_embedding, ...}`` or a bare
    PUNetGConfig kwargs dict), which default to kind="punetg"
    (="punetg_cond" when channel_conditional_items is present).
    """
    net_desc = dict(net_desc)
    kind = net_desc.get("kind")
    config = net_desc.get("config", None)
    if config is None:  # bare config-kwargs dict (oldest shape)
        config = {k: v for k, v in net_desc.items()
                  if k not in ("kind", "has_conditional_embedding",
                               "conditional_embedding_args",
                               "channel_conditional_items")}
    if kind is None:
        kind = ("punetg_cond" if net_desc.get("channel_conditional_items")
                else "punetg")
    if kind == "punetg_cond" and "channel_conditional_items" in net_desc:
        config = dict(config,
                      channel_conditional_items=net_desc[
                          "channel_conditional_items"])
    builder = NET_KINDS.get(kind)
    if builder is None:
        raise ValueError(
            f"unknown net kind {kind!r}; known: {sorted(NET_KINDS)}")
    return builder(config, conditional_embedding=conditional_embedding)
