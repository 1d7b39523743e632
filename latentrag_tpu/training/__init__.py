from .losses import (
    contrastive_loss,
    cosine_reconstruction,
    dae_loss,
    kl_divergence,
    triplet_loss,
    vae_loss,
)
from .trainer import (
    TrainResult,
    Trainer,
    load_checkpoint,
    save_checkpoint,
)

__all__ = [
    "contrastive_loss",
    "cosine_reconstruction",
    "dae_loss",
    "kl_divergence",
    "triplet_loss",
    "vae_loss",
    "TrainResult",
    "Trainer",
    "load_checkpoint",
    "save_checkpoint",
]
