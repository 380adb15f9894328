"""Train state + optimizer construction.

Adam(lr) over generator params with the loss network frozen — the functional
equivalent of the reference's ``requires_grad`` filtering
(``train/train.py:175``, ``train/style_networks.py:300-302,458-463``).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from rerevst_tpu.config import TrainConfig


class TrainState(NamedTuple):
    params: Dict
    opt_state: Any
    step: jnp.ndarray


def param_labels(params: Dict, train_only_decoder: bool = False) -> Dict:
    """'train' / 'freeze' label per top-level subtree.

    vgg_loss is always frozen; with --train_only_decoder the encoders freeze
    too (``train/train.py:58``, ``train/style_networks.py:458-463``)."""
    frozen = {"vgg_loss"}
    if train_only_decoder:
        frozen |= {"encoder", "encoder_style"}
    return {k: ("freeze" if k in frozen else "train") for k in params}


def make_optimizer(cfg: TrainConfig, params: Dict) -> optax.GradientTransformation:
    labels = param_labels(params, cfg.train_only_decoder)
    return optax.multi_transform(
        {"train": optax.adam(cfg.lr), "freeze": optax.set_to_zero()},
        labels,
    )


def init_train_state(params: Dict, cfg: TrainConfig) -> TrainState:
    opt = make_optimizer(cfg, params)
    return TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
