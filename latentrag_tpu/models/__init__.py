from .autoencoders import (
    AE_CLASSES,
    ContrastiveAutoencoder,
    DenoisingAutoencoder,
    VariationalAutoencoder,
    build_autoencoder,
    encode_latents,
    init_autoencoder,
)

__all__ = [
    "AE_CLASSES",
    "ContrastiveAutoencoder",
    "DenoisingAutoencoder",
    "VariationalAutoencoder",
    "build_autoencoder",
    "encode_latents",
    "init_autoencoder",
]
