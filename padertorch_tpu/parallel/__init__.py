from padertorch_tpu.parallel.mesh import (
    make_mesh,
    data_sharding,
    replicated_sharding,
    replicate,
    shard_batch,
    shard_host_local_batch,
    DataParallel,
)
from padertorch_tpu.parallel.tensor import (
    make_mesh_2d,
    shard_module,
    ModelParallel,
)
from padertorch_tpu.parallel.spmd import (
    shard_map_value_and_grad,
    pmean_trees,
)
from padertorch_tpu.parallel.pipeline import (
    pipeline_apply,
    pipeline_value_and_grad,
)
from padertorch_tpu.parallel.sequence import (
    ring_self_attention,
    sequence_parallel_attention,
)
from padertorch_tpu.parallel.expert import (
    switch_router,
    expert_parallel_ffn,
    init_moe_params,
)
from padertorch_tpu.parallel import multihost
from padertorch_tpu.parallel.multihost import (
    process_index,
    process_count,
    is_primary,
    barrier,
    broadcast_bytes,
    broadcast_obj,
    fetch_global,
)
