from captionax.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from captionax.parallel.pipeline import (
    make_pipeline,
    pipeline_mesh,
    pipelined_bert_encoder,
    stack_layers,
    unstack_layers,
)

__all__ = [
    "make_mesh", "batch_sharding", "replicated", "shard_batch",
    "make_pipeline", "pipeline_mesh", "pipelined_bert_encoder",
    "stack_layers", "unstack_layers",
]
