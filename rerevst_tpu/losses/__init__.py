from rerevst_tpu.losses.perceptual import (  # noqa: F401
    content_loss,
    style_loss,
    tv_loss,
)
from rerevst_tpu.losses.temporal import (  # noqa: F401
    generate_fake_data,
    generate_fake_flow,
    temporal_loss,
    temporal_loss_mpi,
    temporal_loss_video,
)
from rerevst_tpu.losses.relaxed import relaxed_style_loss  # noqa: F401
