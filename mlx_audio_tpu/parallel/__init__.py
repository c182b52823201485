from mlx_audio_tpu.parallel.mesh import (
    get_mesh,
    shard_batch,
    shard_module,
    replicate,
    tp_rules_dia,
    tp_rules_llama,
)
from mlx_audio_tpu.parallel.context import (
    MeshContext,
    activate_mesh,
    active_mesh,
    deactivate_mesh,
    parse_mesh_spec,
)

__all__ = [
    "get_mesh", "shard_batch", "shard_module", "replicate", "tp_rules_llama",
    "tp_rules_dia",
    "MeshContext", "activate_mesh", "active_mesh", "deactivate_mesh",
    "parse_mesh_spec",
]
