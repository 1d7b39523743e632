from .autoencoders import (
    AE_CLASSES,
    ContrastiveAutoencoder,
    DenoisingAutoencoder,
    VariationalAutoencoder,
    build_autoencoder,
    encode_latents,
    init_autoencoder,
)
from .convert_torch import (
    convert_reference_state_dict,
    load_reference_checkpoint,
)

__all__ = [
    "AE_CLASSES",
    "ContrastiveAutoencoder",
    "DenoisingAutoencoder",
    "VariationalAutoencoder",
    "build_autoencoder",
    "convert_reference_state_dict",
    "encode_latents",
    "init_autoencoder",
    "load_reference_checkpoint",
]
