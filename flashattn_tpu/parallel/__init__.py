from .mesh import DATA_AXIS, MODEL_AXIS, SEQ_AXIS, batch_sharding, create_mesh, default_mesh, replicated
from .pipeline import (
    STAGE_AXIS,
    megatron_layer_fn,
    megatron_stage_specs,
    pipeline_apply,
    scan_stage_fn,
    split_layers_into_stages,
    stack_stage_params,
    stage_sharding,
)
from .sharded_attention import ring_flash_attention, sharded_flash_attention
from .sharding import apply_mesh, shard_model, sharding_tree, tp_spec_for
