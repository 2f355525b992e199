from aware_tpu.parallel.mesh import get_mesh
from aware_tpu.parallel.batch import sharded_embed_batch, sharded_detect_batch
from aware_tpu.parallel.streaming import streaming_detect_values

__all__ = [
    "get_mesh",
    "sharded_embed_batch",
    "sharded_detect_batch",
    "streaming_detect_values",
]
