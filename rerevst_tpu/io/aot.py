"""AOT serving bundles — the compiled Pass-2 hot path as a deployment
artifact.

``jax.export`` captures the jitted stylize step (encode→decode under frozen
sequence stats) as serialized StableHLO.  A server loads the bundle and
calls it with ``(params, frames, style, stats)`` — no Python re-trace of
the model code at startup.  Bundles are lowered for BOTH cpu and tpu by
default, so the artifact built on a dev box runs on the serving chip
unchanged.  Measured caveat (PERF.md): deserialized exports compile through
``call_exported``, which BYPASSES the persistent compile cache, so with a
warm cache the plain jit path is the faster cold start — the bundle buys a
version-stable deployment artifact, not latency.

The reference has no deployment-artifact story at all (inference re-builds
``TransformerNet`` from source and ``torch.load``s a checkpoint,
``test/framework.py:57-78``); this is the TPU-native analog of
torch.export / a SavedModel for the hot loop.

Params, style state, and sequence stats stay ARGUMENTS (not baked
constants): one bundle serves any checkpoint/style/clip whose pytree
structure and frame geometry match the exported shapes.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_MAGIC = b"RVAOT001"

_REGISTERED = False


def _register_pytrees() -> None:
    """jax.export must (de)serialize the model's NamedTuple pytrees
    (StyleFeatures / NormStats / SeqStats) by stable name."""
    global _REGISTERED
    if _REGISTERED:
        return
    from jax import export as jexport

    from rerevst_tpu.models.transformer import (
        NormStats,
        SeqStats,
        StyleFeatures,
    )

    for cls in (StyleFeatures, NormStats, SeqStats):
        jexport.register_namedtuple_serialization(
            cls, serialized_name=f"rerevst_tpu.{cls.__name__}")
    _REGISTERED = True


def _shapes_of(tree):
    return jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), tree)


def export_pass2(session, hw: Tuple[int, int], batch: int = 1,
                 platforms: Sequence[str] = ("cpu", "tpu")):
    """Export the session's global-mode Pass-2 fn at static geometry.

    `hw` is the PADDED frame size (the ReshapeTool contract fixes it after
    the first frame — e.g. 512p content pads to 640x640).  Style/stats
    structures are taken from the live session; if the session has not run
    Pass 1 yet, a dummy style + collect on tiny frames supplies them (norm
    stats and filters are per-channel — their shapes are independent of
    frame geometry and sample count).
    """
    from jax import export as jexport

    _register_pytrees()
    style = session.style
    if style is None:
        style = session._encode_style(
            session.params, jnp.zeros((1, 64, 64, 3), jnp.float32))
    stats = session.stats
    if stats is None:
        feats = session._encode_content(
            session.params, jnp.zeros((1, 64, 64, 3), jnp.float32))
        stats = session._collect(session.params, feats, style)

    # Style conditioning is geometry-free per-channel state EXCEPT the raw
    # relu4_1 map, whose spatial dims follow the style image — export those
    # symbolically so one bundle serves any style.  Frame dims stay STATIC:
    # they are the perf-critical shapes XLA must tile for the MXU.
    sh, sw = jexport.symbolic_shape("_rv_sh, _rv_sw")
    style_spec = _shapes_of(style)._replace(
        map=jax.ShapeDtypeStruct(
            (style.map.shape[0], sh, sw, style.map.shape[3]),
            style.map.dtype))

    h, w = hw
    frame_spec = jax.ShapeDtypeStruct((batch, h, w, 3), jnp.float32)
    exported = jexport.export(
        session._stylize_global, platforms=list(platforms))(
            _shapes_of(session.params), frame_spec,
            style_spec, _shapes_of(stats))
    return exported


def save_bundle(path: str, session, hw: Tuple[int, int],
                batches: Sequence[int] = (1,),
                platforms: Sequence[str] = ("cpu", "tpu")) -> dict:
    """Write an AOT bundle: one exported Pass-2 graph per batch size.

    File layout: magic | u32 json-length | json meta | blobs (meta holds
    per-batch offsets).  Returns the meta dict.
    """
    blobs = []
    meta = {"hw": list(hw), "batches": list(batches),
            "platforms": list(platforms),
            "dtype": np.dtype(session.cfg.dtype).name,
            "entries": []}
    for b in batches:
        blob = export_pass2(session, hw, batch=b,
                            platforms=platforms).serialize()
        meta["entries"].append({"batch": b, "size": len(blob)})
        blobs.append(blob)
    head = json.dumps(meta).encode()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(np.uint32(len(head)).tobytes())
        f.write(head)
        for blob in blobs:
            f.write(blob)
    os.replace(tmp, path)
    return meta


class AotPass2:
    """Loaded bundle: callable (params, frames, style, stats) -> styled.

    Dispatches on the batch dimension to the matching exported graph;
    raises KeyError for geometries/batches the bundle does not carry
    (callers fall back to the jit path).
    """

    def __init__(self, meta: dict, exported_by_batch: dict):
        self.meta = meta
        self.hw = tuple(meta["hw"])
        self._by_batch = exported_by_batch

    def batches(self):
        return sorted(self._by_batch)

    def __call__(self, params, frames, style, stats):
        b, h, w, _ = frames.shape
        if (h, w) != self.hw or b not in self._by_batch:
            raise KeyError(f"bundle has {self.hw} x batches "
                           f"{self.batches()}, got {(h, w)} batch {b}")
        return self._by_batch[b].call(params, frames, style, stats)


def load_bundle(path: str) -> AotPass2:
    from jax import export as jexport

    _register_pytrees()
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not an AOT bundle")
        n = int(np.frombuffer(f.read(4), np.uint32)[0])
        meta = json.loads(f.read(n).decode())
        by_batch = {}
        for e in meta["entries"]:
            by_batch[int(e["batch"])] = jexport.deserialize(
                f.read(int(e["size"])))
    return AotPass2(meta, by_batch)
