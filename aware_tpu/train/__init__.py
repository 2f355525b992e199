from aware_tpu.train.adversarial import (
    AmortizedEmbedderConfig,
    TrainConfig,
    TrainState,
    init_train_state,
    train_step,
    train_amortized_embedder,
    amortized_embed,
    save_checkpoint,
    restore_checkpoint,
)

__all__ = [
    "AmortizedEmbedderConfig",
    "TrainConfig",
    "TrainState",
    "init_train_state",
    "train_step",
    "train_amortized_embedder",
    "amortized_embed",
    "save_checkpoint",
    "restore_checkpoint",
]
