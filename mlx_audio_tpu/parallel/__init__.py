from mlx_audio_tpu.parallel.mesh import (
    get_mesh,
    shard_batch,
    shard_module,
    replicate,
    tp_rules_llama,
)

__all__ = ["get_mesh", "shard_batch", "shard_module", "replicate", "tp_rules_llama"]
