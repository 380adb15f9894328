from rerevst_tpu.parallel.mesh import frame_mesh, replicated, sharded_batch  # noqa: F401
from rerevst_tpu.parallel.stats import collect_stats_sharded  # noqa: F401
from rerevst_tpu.parallel.pipeline import stylize_frames_sharded  # noqa: F401
