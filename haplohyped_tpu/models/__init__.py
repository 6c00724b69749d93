from haplohyped_tpu.models.haploformer import HaploFormer, HaploFormerConfig
from haplohyped_tpu.models.train import (
    TrainState,
    create_train_state,
    loss_fn,
    make_train_step,
)

__all__ = [
    "HaploFormer",
    "HaploFormerConfig",
    "TrainState",
    "create_train_state",
    "loss_fn",
    "make_train_step",
]
