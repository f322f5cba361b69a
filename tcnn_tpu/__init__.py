"""tcnn_tpu — a TPU-native JAX/Pallas framework with the capabilities of
NVlabs/tiny-cuda-nn: lightning-fast fused tiny MLPs, trainable input
encodings (multiresolution hash grids, OneBlob, frequency, spherical
harmonics, ...), losses, and optimizers, all driven by the same JSON
``create_from_config`` spec as the CUDA reference.

See SURVEY.md at the repo root for the full structural mapping from the
reference; compute runs through jit/XLA with hand-written Pallas kernels on
the hot paths, and scales across chips via ``jax.sharding`` data parallelism
(tcnn_tpu.parallel).
"""

__version__ = "0.1.0"

from . import encodings, losses, modules, networks, optimizers, parallel, utils
from .common import (
    Activation,
    GridType,
    HashType,
    InterpolationType,
    ReductionType,
    default_loss_scale,
)
from .config import (
    TrainableModel,
    create_from_config,
    load_config,
    loads_config,
    strip_json_comments,
)
from .encodings import builtin_encodings, create_encoding, register_encoding
from .losses import builtin_losses, create_loss, register_loss
from .network_with_input_encoding import NetworkWithInputEncoding
from .networks import create_network
from .optimizers import create_optimizer
from .serving import FrozenServer
from .trainer import Trainer

__all__ = [
    "Activation",
    "FrozenServer",
    "GridType",
    "HashType",
    "InterpolationType",
    "NetworkWithInputEncoding",
    "ReductionType",
    "TrainableModel",
    "Trainer",
    "builtin_encodings",
    "builtin_losses",
    "create_encoding",
    "create_from_config",
    "create_loss",
    "create_network",
    "create_optimizer",
    "default_loss_scale",
    "load_config",
    "loads_config",
    "strip_json_comments",
    "register_encoding",
    "register_loss",
    "__version__",
]
