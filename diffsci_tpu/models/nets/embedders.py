"""Physics conditioning embedders for porous-media generation.

TPU-native redesign of the reference embedders
(reference diffsci/models/nets/embedder.py:6-246): two-point correlation
(MLP + transformer), pore-size distribution, porosity scalar, composite
dict-embedder summing sub-embeddings, plus ocean-specific
date/geo Fourier projections (reference diffsci/models/nets/utils.py:43-155).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from diffsci_tpu.models.nets.layers import GaussianFourierProjection


class PositionalEncoding1d(nn.Module):
    """Interleaved sin/cos positions (embedder.py:6-32)."""
    dembed: int
    denominator: float = 10000.0

    @nn.compact
    def __call__(self, x):
        idx = jnp.arange(0, self.dembed, 2)
        div = self.denominator ** (idx / self.dembed)
        s = jnp.sin(x[..., None] / div)
        c = jnp.cos(x[..., None] / div)
        return jnp.stack([s, c], axis=-1).reshape(x.shape + (self.dembed,))

    def export_description(self):
        return {"dembed": self.dembed, "denominator": self.denominator}


class TwoPointCorrelationEmbedder(nn.Module):
    """Embed (distance, probability) curves (embedder.py:35-81)."""
    dembed: int
    reduction: str | None = None
    scale: float = 30.0

    @nn.compact
    def __call__(self, data):
        dist = data["tpc_dist"]
        prob = data["tpc_prob"]
        x1 = PositionalEncoding1d(self.dembed)(dist)
        x2 = GaussianFourierProjection(self.dembed, self.scale)(
            -jnp.log(prob + 1e-6))
        x = x1 + x2
        if self.reduction == "mean":
            x = jnp.mean(x, axis=-2)
        return x

    def export_description(self):
        return {"dembed": self.dembed, "reduction": self.reduction,
                "scale": self.scale}


class _TransformerEncoder(nn.Module):
    """Post-LN transformer encoder stack matching
    torch.nn.TransformerEncoder's defaults (norm_first=False, relu),
    the exact module used at embedder.py:92-101: x = LN(x + MHA(x)),
    then x = LN(x + FFN(x))."""
    dmodel: int
    nhead: int
    ffn_expansion: int
    num_layers: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            h = nn.MultiHeadDotProductAttention(num_heads=self.nhead)(x, x)
            x = nn.LayerNorm()(x + h)
            h = nn.Dense(self.dmodel * self.ffn_expansion)(x)
            h = nn.relu(h)
            h = nn.Dense(self.dmodel)(h)
            x = nn.LayerNorm()(x + h)
        return x


class TwoPointCorrelationTransformer(nn.Module):
    """Sequence attention over TPC curve points, mean-pooled
    (embedder.py:84-117)."""
    dembed: int
    nhead: int = 4
    ffn_expansion: int = 4
    num_layers: int = 2
    scale: float = 30.0

    @nn.compact
    def __call__(self, data):
        x = TwoPointCorrelationEmbedder(self.dembed, None, self.scale)(data)
        x = _TransformerEncoder(self.dembed, self.nhead, self.ffn_expansion,
                                self.num_layers)(x)
        return jnp.mean(x, axis=-2)

    def export_description(self):
        return {"dembed": self.dembed, "nhead": self.nhead,
                "ffn_expansion": self.ffn_expansion,
                "num_layers": self.num_layers}


class PoreSizeDistEmbedder(nn.Module):
    """(embedder.py:117-163)"""
    dembed: int
    reduction: str | None = None
    scale: float = 30.0

    @nn.compact
    def __call__(self, data):
        centers = data["psd_centers"]
        cdf = data["psd_cdf"]
        x1 = PositionalEncoding1d(self.dembed)(centers)
        x2 = GaussianFourierProjection(self.dembed, self.scale)(cdf)
        x = x1 + x2
        if self.reduction == "mean":
            x = jnp.mean(x, axis=-2)
        return x

    def export_description(self):
        return {"dembed": self.dembed, "reduction": self.reduction,
                "scale": self.scale}


class PoreSizeDistTransformer(nn.Module):
    """(embedder.py:165-197)"""
    dembed: int
    nhead: int = 4
    ffn_expansion: int = 4
    num_layers: int = 2
    scale: float = 30.0

    @nn.compact
    def __call__(self, data):
        x = PoreSizeDistEmbedder(self.dembed, None, self.scale)(data)
        x = _TransformerEncoder(self.dembed, self.nhead, self.ffn_expansion,
                                self.num_layers)(x)
        return jnp.mean(x, axis=-2)

    def export_description(self):
        return {"dembed": self.dembed, "nhead": self.nhead,
                "ffn_expansion": self.ffn_expansion,
                "num_layers": self.num_layers}


class PorosityEmbedder(nn.Module):
    """Scalar porosity conditioner (embedder.py:199-229)."""
    dembed: int
    scale: float = 30.0

    @nn.compact
    def __call__(self, data):
        x = data["porosity"]
        if x.ndim >= 1 and x.shape[-1] == 1:
            x = x[..., 0]
        h = GaussianFourierProjection(self.dembed, self.scale)(x)
        h = nn.Dense(4 * self.dembed)(h)
        h = nn.silu(h)
        h = nn.Dense(4 * self.dembed)(h)
        h = nn.silu(h)
        return nn.Dense(self.dembed)(h)

    def export_description(self):
        return {"dembed": self.dembed, "scale": self.scale}


class CompositeEmbedder(nn.Module):
    """Sum of sub-embeddings over the same condition dict
    (embedder.py:231-246)."""
    embedders: Sequence[nn.Module]

    @nn.compact
    def __call__(self, data):
        out = None
        for emb in self.embedders:
            e = emb(data)
            out = e if out is None else out + e
        return out

    def export_description(self):
        return {f"embedder_{i}": e.export_description()
                for i, e in enumerate(self.embedders)
                if hasattr(e, "export_description")}


class DateGaussianFourierProjection(nn.Module):
    """Day-of-year cyclic embedding (reference nets/utils.py:43-97)."""
    embed_dim: int
    scale: float = 30.0

    @nn.compact
    def __call__(self, day_of_year):
        phase = 2 * jnp.pi * day_of_year / 365.25
        cyc = jnp.stack([jnp.sin(phase), jnp.cos(phase)], axis=-1)
        h = nn.Dense(self.embed_dim)(cyc)
        h = nn.silu(h)
        return nn.Dense(self.embed_dim)(h)


class GeoGaussianFourierProjection(nn.Module):
    """Lat/lon positional embedding (reference nets/utils.py:99-155)."""
    embed_dim: int
    scale: float = 30.0

    @nn.compact
    def __call__(self, latlon):
        # latlon: [..., 2] degrees
        lat = jnp.deg2rad(latlon[..., 0])
        lon = jnp.deg2rad(latlon[..., 1])
        xyz = jnp.stack([jnp.cos(lat) * jnp.cos(lon),
                         jnp.cos(lat) * jnp.sin(lon),
                         jnp.sin(lat)], axis=-1)
        h = nn.Dense(self.embed_dim)(xyz)
        h = nn.silu(h)
        return nn.Dense(self.embed_dim)(h)
