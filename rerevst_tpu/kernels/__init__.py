"""Pallas TPU kernels for the decoder's hot ops, with XLA references.

Each kernel ships with a pure-XLA reference implementation and interpret-mode
tests (CPU), plus on-TPU correctness checks.

Measured on TPU v5e (640^2, bf16): XLA's own fusion already wins for these
patterns — filter pair 1.0 ms (XLA) vs 1.4 ms (Pallas); norm+affine+clamp
2.3 ms vs 8.5 ms — so the default decode path stays on XLA ("don't
hand-schedule what the compiler already does"); the decisive decoder
optimization was algebraic instead (``upsample2x_conv3x3``'s input-dilated
conv, -28% decoder time).  The kernels remain available for explicit use and
as the project's Pallas playbook.
"""

from rerevst_tpu.kernels.filter_chain import (  # noqa: F401
    dynamic_filter_pair,
    dynamic_filter_pair_xla,
)
from rerevst_tpu.kernels.norm_affine import (  # noqa: F401
    norm_affine_clamp,
    norm_affine_clamp_xla,
)
