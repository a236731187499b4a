from ripor_tpu.train.losses import (
    LOSS_FNS,
    lng_knp_margin_mse,
    margin_mse,
    pretrain_margin_mse,
    seq2seq_ce,
)
from ripor_tpu.train.trainer import TrainConfig, Trainer, TrainState, make_optimizer, make_train_step
from ripor_tpu.train.checkpoint import (
    CheckpointManager,
    load_params,
    resize_codebooks,
    save_params,
)

__all__ = [
    "LOSS_FNS", "margin_mse", "seq2seq_ce", "lng_knp_margin_mse",
    "pretrain_margin_mse",
    "TrainConfig", "Trainer", "TrainState", "make_optimizer", "make_train_step",
    "CheckpointManager", "save_params", "load_params", "resize_codebooks",
]
