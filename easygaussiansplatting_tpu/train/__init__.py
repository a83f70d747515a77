from easygaussiansplatting_tpu.train.config import TrainConfig
from easygaussiansplatting_tpu.train.optimizer import AdamState, adam_init, adam_update
from easygaussiansplatting_tpu.train.density import (
    DensityStats,
    densify_and_prune,
    density_stats_init,
    reset_alpha,
    update_density_stats,
)
from easygaussiansplatting_tpu.train.loop import make_train_step, train

__all__ = [
    "TrainConfig",
    "AdamState",
    "adam_init",
    "adam_update",
    "DensityStats",
    "density_stats_init",
    "update_density_stats",
    "densify_and_prune",
    "reset_alpha",
    "make_train_step",
    "train",
]
