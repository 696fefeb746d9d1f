from whisper_finetune_tpu.parallel.mesh import (
    batch_sharding,
    get_data_mesh,
    replicated_sharding,
)

__all__ = ["batch_sharding", "get_data_mesh", "replicated_sharding"]
