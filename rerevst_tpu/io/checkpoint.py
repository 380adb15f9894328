"""Native checkpointing (msgpack param pytrees + training state).

The reference checkpoints with ``torch.save(state_dict)`` gated on best loss
(``train/train.py:446-457``) and resumes via filename glob
(``train/train.py:148-153``).  Here: flax msgpack serialization, explicit
step-tagged filenames, newest-first resume, plus the ``.pth`` converter in
``rerevst_tpu.io.torch_compat`` for reference checkpoints.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def save_params(path: str, params: Dict) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    blob = serialization.to_bytes(jax.tree.map(np.asarray, params))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)  # atomic: never leave a torn checkpoint


def load_params(path: str, like: Optional[Dict] = None) -> Dict:
    with open(path, "rb") as f:
        blob = f.read()
    if like is not None:
        return serialization.from_bytes(like, blob)
    # Without a template, decode to raw nested dicts.
    return serialization.msgpack_restore(blob)


_STEP_RE = re.compile(r"-step(\d+)\.msgpack$")


def save_train_state(out_dir: str, step: int, params: Dict,
                     opt_state: Any, keep: int = 3) -> str:
    """Step-tagged checkpoint pair; prunes old ones (restart-safe)."""
    path = os.path.join(out_dir, f"ckpt-step{step:08d}.msgpack")
    save_params(path, {"params": params,
                       "opt_state": _opt_to_tree(opt_state)})
    old = sorted(glob.glob(os.path.join(out_dir, "ckpt-step*.msgpack")))
    for p in old[:-keep]:
        os.remove(p)
    return path


def checkpoint_at_step(out_dir: str, step: int) -> Optional[Tuple[str, int]]:
    """Select a specific step's checkpoint — the analog of the reference's
    ``--load_epoch`` glob (``train/train.py:148-153``)."""
    path = os.path.join(out_dir, f"ckpt-step{step:08d}.msgpack")
    if os.path.exists(path):
        return path, step
    return None


def latest_checkpoint(out_dir: str) -> Optional[Tuple[str, int]]:
    paths = sorted(glob.glob(os.path.join(out_dir, "ckpt-step*.msgpack")))
    if not paths:
        return None
    path = paths[-1]
    m = _STEP_RE.search(path)
    return path, int(m.group(1)) if m else 0


def _opt_to_tree(opt_state: Any):
    """optax states are NamedTuple pytrees; store leaves + rely on a template
    at restore time."""
    return jax.tree.map(np.asarray, opt_state)


def restore_train_state(path: str, params_template: Dict,
                        opt_state_template: Any) -> Tuple[Dict, Any]:
    like = {"params": params_template,
            "opt_state": _opt_to_tree(opt_state_template)}
    blob = load_params(path, like)
    leaves = jax.tree.leaves(blob["opt_state"])
    opt_state = jax.tree.unflatten(
        jax.tree.structure(opt_state_template), leaves)
    return blob["params"], opt_state
