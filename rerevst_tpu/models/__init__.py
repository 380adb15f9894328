from rerevst_tpu.models.transformer import (  # noqa: F401
    NormStats,
    SeqStats,
    StyleFeatures,
    TransformerNet,
    blend_pytrees,
)
