"""diffsci_tpu: a TPU-native (JAX / XLA / Pallas / pjit) diffusion-model
framework for scientific applications.

Brand-new implementation with the capabilities of the PyTorch reference
Lacadame/DiffSci, redesigned TPU-first: jitted lax.scan samplers, functional
preconditioned denoisers, shadow-pytree EMA, pjit data parallelism over a
device mesh, and Pallas kernels for the attention/norm hot paths.
"""

__version__ = "0.1.0"

from diffsci_tpu import ops
from diffsci_tpu import data
from diffsci_tpu import utils

__all__ = ["ops", "data", "utils", "models", "parallel", "trainer",
           "checkpoint", "kernels"]


def __getattr__(name):
    # lazy: models/parallel/trainer pull in flax/optax/orbax
    if name in ("models", "parallel", "trainer", "checkpoint", "kernels"):
        import importlib
        return importlib.import_module(f"diffsci_tpu.{name}")
    raise AttributeError(f"module 'diffsci_tpu' has no attribute {name!r}")
