"""Small tensor/pytree utilities shared across the framework.

TPU-native counterpart of the reference's ``diffsci/torchutils.py`` and
``diffsci/utils.py`` (see reference torchutils.py:4-104, utils.py:5-11).
"""

from diffsci_tpu.utils.tensor import (
    bcast_right,
    dict_map,
    dict_expand_dims,
    linear_interpolation,
    get_minibatch_sizes,
)
from diffsci_tpu.utils.tensor import inverse_cdf_histogram
from diffsci_tpu.utils.tensor import enable_compilation_cache
from diffsci_tpu.utils.tensor import space_to_depth, depth_to_space
from diffsci_tpu.utils.images import (
    make_image_grid,
    save_image_grid,
)
from diffsci_tpu.utils.periodic import (
    periodic_getitem,
    periodic_getitem_extended,
    periodic_setitem,
)

__all__ = [
    "bcast_right",
    "dict_map",
    "dict_expand_dims",
    "linear_interpolation",
    "get_minibatch_sizes",
    "periodic_getitem",
    "periodic_getitem_extended",
    "periodic_setitem",
    "inverse_cdf_histogram",
    "make_image_grid",
    "save_image_grid",
]
