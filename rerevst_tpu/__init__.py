"""rerevst_tpu — a TPU-native video style transfer framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
daooshee/ReReVST-Code ("Consistent Video Style Transfer via Relaxation and
Regularization", IEEE TIP 2020): zero-shot arbitrary-style video stylization
with sequence-level global feature sharing, compound-regularization temporal
training, relaxed style loss, and multi-style interpolation.

Design stance (vs. the PyTorch reference):
  * One model library (``rerevst_tpu.models.transformer``) replaces the
    reference's five copy-pasted network files (test/style_network_global.py,
    test/style_network_frame.py, test/style_network.py, train/style_networks.py,
    Multi-style Interpolation/style_network.py).
  * All state (style features, sequence statistics, predicted dynamic filters)
    is an explicit pytree — no mutable module state.  Multi-style interpolation
    becomes a ``jax.tree.map`` weighted sum.
  * NHWC layout, static shapes, ``jit``/``scan``/``shard_map`` throughout;
    data-parallel frame sharding over a ``jax.sharding.Mesh`` supplies the
    distributed layer the reference lacks.
"""

__version__ = "0.1.0"

from rerevst_tpu.config import (  # noqa: F401
    InferenceConfig,
    LossConfig,
    ModelConfig,
    TrainConfig,
)


def __getattr__(name):
    # Lazy top-level API (avoids importing cv2/optax for config-only users).
    if name == "Stylization":
        from rerevst_tpu.api import Stylization

        return Stylization
    if name == "MultiStylization":
        from rerevst_tpu.multistyle import MultiStylization

        return MultiStylization
    if name == "TransformerNet":
        from rerevst_tpu.models.transformer import TransformerNet

        return TransformerNet
    raise AttributeError(name)
