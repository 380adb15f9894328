from rerevst_tpu.parallel.mesh import (  # noqa: F401
    distributed_init,
    frame_mesh,
    local_batch_to_global,
    local_device_count_in,
    mesh_process_count,
    replicated,
    sharded_batch,
)
from rerevst_tpu.parallel.stats import collect_stats_sharded  # noqa: F401
from rerevst_tpu.parallel.pipeline import stylize_frames_sharded  # noqa: F401
