from aware_tpu.embed.losses import get_loss_fn, LOSS_REGISTRY
from aware_tpu.embed.optim import get_optimizer, OPTIMIZER_REGISTRY
from aware_tpu.embed.schedulers import get_scheduler, SCHEDULER_REGISTRY
from aware_tpu.embed.solver import make_embedder, embed_one, embed_batch, embed_core, EmbedResult

__all__ = [
    "embed_batch",
    "embed_core",
    "EmbedResult",
    "get_loss_fn",
    "LOSS_REGISTRY",
    "get_optimizer",
    "OPTIMIZER_REGISTRY",
    "get_scheduler",
    "SCHEDULER_REGISTRY",
    "make_embedder",
    "embed_one",
]
