"""Round-3k golden parity fixtures: the volume-synthesis orchestrators —
grid-of-cubes filling inpainting (extra/fillinginpainting.py:298-440)
and sequential-z stitching (extra/sequentialinpainting.py:83-330).

The diffusion module is replaced by the SAME deterministic stub on both
sides (sample -> tanh(orig_noise) or a coordinate pattern; inpaint ->
mask * known + (1-mask) * generated), so the pin covers the actual
orchestration logic: parity-ordered grid traversal, periodic wrapping
of the shared noise cube, 1=known inpaint-mask construction, known-
region extraction, overlap windows and cosine blending.

Usage: python scripts/gen_reference_fixtures_r3k.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_reference_fixtures import install_stubs, OUTDIR  # noqa: E402


class _GridStub:
    """sample -> tanh(noise slice); inpaint -> mask-blend. Pure
    functions of their inputs, mirrored in the JAX test."""

    device = "cpu"

    def __init__(self, torch):
        self.t = torch

    def sample(self, nsamples, shape, orig_noise=None, **kw):
        return self.t.tanh(orig_noise)

    def inpaint(self, x_orig, mask, orig_noise=None, **kw):
        gen = self.t.tanh(orig_noise[0])
        return (mask * x_orig + (1 - mask) * gen).unsqueeze(0)


def gen_grid_volume():
    import torch
    from diffsci.extra.fillinginpainting import sample_grid_volume

    rng = np.random.default_rng(210)
    out = {}
    for tag, periodic in [("plain", [False, False, False]),
                          ("periodic", [True, True, True])]:
        noise = rng.standard_normal((1, 1, 16, 16, 16)).astype(np.float32)
        out[f"{tag}_noise"] = noise
        fixed = torch.tensor(noise)
        orig = torch.randn

        def shim(*shape, **kw):
            return fixed.clone()

        torch.randn = shim
        try:
            with torch.no_grad():
                vol = sample_grid_volume(
                    _GridStub(torch), grid_map=[2, 2, 2],
                    base_shape=[1, 8, 8, 8], overlap_size=4,
                    nsteps=3, periodicity=periodic)
        finally:
            torch.randn = orig
        out[f"{tag}_volume"] = vol.numpy()
        print(f"  grid {tag}: volume std {vol.numpy().std():.4f}")
    np.savez_compressed(os.path.join(OUTDIR, "grid_volume.npz"), **out)
    print("wrote grid_volume.npz")


class _SeqStub:
    """Noise-free deterministic block generator: a coordinate ramp of the
    requested shape; inpaint mask-blends it with the known region."""

    device = "cpu"

    def __init__(self, torch):
        self.t = torch

    def _pattern(self, shape):
        # shape: [C, dx, dy, dz]
        n = int(np.prod(shape))
        ramp = self.t.linspace(-1.0, 1.0, n).reshape(shape)
        return self.t.sin(3.0 * ramp)

    def sample(self, nsamples, shape, **kw):
        return self._pattern(shape).unsqueeze(0)

    def inpaint(self, x_orig, mask, **kw):
        gen = self._pattern(list(x_orig.shape))
        return (mask * x_orig + (1 - mask) * gen).unsqueeze(0)


def gen_sequential_z():
    import torch
    from diffsci.extra.sequentialinpainting import sample_sequential_z

    out = {}
    for tag, blend in [("cosine", "cosine"), ("latest", "latest")]:
        with torch.no_grad():
            vol = sample_sequential_z(
                _SeqStub(torch), num_blocks=3, base_shape=[1, 8, 8, 8],
                overlap_size=4, nsteps=3, blend_mode=blend)
        out[f"{tag}_volume"] = vol.numpy()
        print(f"  sequential {tag}: {vol.shape}, std "
              f"{vol.numpy().std():.4f}")
    np.savez_compressed(os.path.join(OUTDIR, "sequential_volume.npz"),
                        **out)
    print("wrote sequential_volume.npz")


def main():
    install_stubs()
    sys.path.insert(0, "/root/reference")
    import torch
    torch.manual_seed(0)
    os.makedirs(OUTDIR, exist_ok=True)
    gen_grid_volume()
    gen_sequential_z()


if __name__ == "__main__":
    main()
