"""Multi-style interpolation: blend style-conditioned state across N styles.

Re-designs ``Multi-style Interpolation/`` (test.py / stylization.py /
style_network.py): where the reference keeps per-style-id Python lists inside
every module and blends them layer-by-layer at each forward
(``Multi-style Interpolation/style_network.py:35-53,135-139,348-367``), here
style conditioning is two pytrees (StyleFeatures, SeqStats) per style and
blending is one ``jax.tree.map`` weighted sum — after which the ordinary
global decoder runs unchanged.

The reference's disk cache of per-frame content features
(``Multi-style Interpolation/test.py:87-98``) becomes an in-memory (or
device-resident) feature array: encode every frame once, then replay
decode-only per weight setting.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from rerevst_tpu.config import InferenceConfig, ModelConfig
from rerevst_tpu.data.transforms import bgr_to_model, model_to_bgr
from rerevst_tpu.io.torch_compat import load_reference_checkpoint
from rerevst_tpu.models.transformer import (
    SeqStats,
    StyleFeatures,
    blend_pytrees,
    blend_pytrees_batched,
    collect_stats,
    decode_global,
    encode_content,
    encode_style,
)
from rerevst_tpu.ops.image import crop_back, pad_reflect_multiple, padded_size


class MultiStylization:
    """Session for N-style blended stylization.

    Mirrors ``Multi-style Interpolation/stylization.py:43-104`` (prepare_style
    over a style list, content-feature pre-encoding, per-weight transfer) with
    stateless pytree conditioning.
    """

    def __init__(self, checkpoint: Optional[str] = None, params=None,
                 cfg: Optional[ModelConfig] = None,
                 infer: Optional[InferenceConfig] = None, mesh=None):
        """`mesh`: optional jax.sharding.Mesh — per-style Pass-1 statistics
        collection shards the sampled-frame axis over it (Pass 2 stays
        per-frame: the reference blends with per-frame weights,
        ``Multi-style Interpolation/test.py:127-131``)."""
        self.cfg = cfg or ModelConfig()
        self.infer = infer or InferenceConfig(sample_interval=16)
        self.mesh = mesh
        if params is None:
            if checkpoint is None:
                raise ValueError("need checkpoint or params")
            if checkpoint.endswith(".pth"):
                params = load_reference_checkpoint(checkpoint)
            else:
                from rerevst_tpu.io.checkpoint import load_params

                params = load_params(checkpoint)
        self.params = jax.device_put(
            {k: v for k, v in params.items() if k != "vgg_loss"})
        self.styles: List[StyleFeatures] = []
        self.stats: List[SeqStats] = []
        self._pad_hw = None
        #: mesh-replicated (params, styles, stats), built lazily per Pass 1.
        self._replicated = None
        cfg_ = self.cfg
        self._encode_style = jax.jit(lambda p, s: encode_style(p, s, cfg_))
        self._encode_content = jax.jit(
            lambda p, f: encode_content(p, f, cfg_, desaturate=True))
        self._collect = jax.jit(
            lambda p, x, sf: collect_stats(p["decoder"], x, sf, cfg_))

        def _transfer(p, feats, styles, stats, weights):
            sf = blend_pytrees(styles, weights)
            st = blend_pytrees(stats, weights)
            return decode_global(p["decoder"], feats, sf, st, cfg_)

        self._transfer = jax.jit(_transfer)

        def _transfer_batch(p, feats, styles, stats, weights):
            # Per-sample blends ([B,S] weight rows) decode in ONE program:
            # blended NormStats come back [B,1,1,C] (broadcast against
            # [B,H,W,C]) and filters [B,P,Q] (apply_dynamic_filter is
            # per-sample) — the decoder needs no changes.
            sf = blend_pytrees_batched(styles, weights)
            st = blend_pytrees_batched(stats, weights)
            return decode_global(p["decoder"], feats, sf, st, cfg_)

        self._transfer_batch = jax.jit(_transfer_batch)

    # -- style prep (384x384 resize convention, Multi-style .../test.py:52) --

    def prepare_styles(self, styles_bgr: Sequence[np.ndarray]) -> None:
        self._replicated = None
        self.styles = [
            self._encode_style(self.params, jnp.asarray(bgr_to_model(s)))
            for s in styles_bgr
        ]

    # -- content features (the reference's cache/%d.pt, in memory) -----------

    def _prep(self, frame_bgr: np.ndarray) -> jnp.ndarray:
        x = jnp.asarray(bgr_to_model(frame_bgr))
        h, w = frame_bgr.shape[:2]
        if self._pad_hw is None:
            self._pad_hw = padded_size(h, w, self.infer.pad,
                                       self.infer.granularity)
            self._orig_hw = (h, w)
        return pad_reflect_multiple(x, self.infer.pad, self.infer.granularity,
                                    self._pad_hw)

    def encode_frames(self, frames_bgr,
                      cache_path: Optional[str] = None) -> jnp.ndarray:
        """Encode every frame once.  `frames_bgr` is anything
        ``data.source.as_source`` accepts (sequence / frame glob / video
        file / FrameSource) — frames are read lazily, one at a time.  With
        `cache_path`, features are stored in a disk-backed memmap (the
        reference's ``cache/%d.pt`` directory, ``Multi-style
        Interpolation/test.py:87-98``) so long clips don't have to fit in
        HBM/RAM; pass the returned array straight to
        ``prepare_global``/``transfer``."""
        from rerevst_tpu.data.source import as_source

        src = as_source(frames_bgr)
        n = len(src)
        it = iter(src)
        first = self._encode_content(self.params, self._prep(next(it)))
        shape = (n,) + first.shape[1:]
        if cache_path is not None:
            feats = np.lib.format.open_memmap(
                cache_path, mode="w+", dtype=np.float32, shape=shape)
            # Sidecar geometry so a fresh session can decode from the cache.
            with open(cache_path + ".meta.json", "w") as f:
                json.dump({"orig_hw": list(self._orig_hw),
                           "pad_hw": list(self._pad_hw),
                           "pad": self.infer.pad}, f)
        else:
            feats = np.empty(shape, np.float32)
        feats[0] = np.asarray(first[0])
        for i, f in enumerate(it, start=1):
            feats[i] = np.asarray(
                self._encode_content(self.params, self._prep(f))[0])
        return feats if cache_path is not None else jnp.asarray(feats)

    def load_features(self, cache_path: str) -> np.ndarray:
        """Reload a feature cache, restoring the session geometry from the
        sidecar so ``transfer`` works without re-encoding any frame."""
        meta_path = cache_path + ".meta.json"
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            self._orig_hw = tuple(meta["orig_hw"])
            self._pad_hw = tuple(meta["pad_hw"])
        return np.load(cache_path, mmap_mode="r")

    def prepare_global(self, feats: jnp.ndarray,
                       interval: Optional[int] = None) -> None:
        """Freeze per-style SeqStats from sampled cached features
        (SeqNormPrePare, ``Multi-style Interpolation/test.py:72-85``)."""
        iv = interval or self.infer.sample_interval
        self._replicated = None
        n = feats.shape[0]
        # Reference sampling (``Multi-style Interpolation/test.py:72-84``):
        # (n-1)//iv + 1 interval frames, THEN the last frame again — the
        # duplicate (when iv divides n-1) is part of reference behavior.
        idx = [s * iv for s in range((n - 1) // iv + 1)] + [n - 1]
        if isinstance(feats, np.ndarray):  # includes disk-backed memmaps
            sampled = jnp.asarray(np.stack([feats[i] for i in idx]))
        else:
            sampled = feats[jnp.asarray(idx)]
        if self.mesh is not None:
            from rerevst_tpu.parallel import collect_stats_sharded

            self.stats = [
                collect_stats_sharded(self.params["decoder"], sampled, sf,
                                      self.cfg, self.mesh)
                for sf in self.styles
            ]
        else:
            self.stats = [
                self._collect(self.params, sampled, sf) for sf in self.styles
            ]

    # -- per-weight decode ---------------------------------------------------

    def transfer(self, feats_one: jnp.ndarray,
                 weights: Sequence[float]) -> np.ndarray:
        """Decode one frame's cached features under blended styles -> BGR.

        `weights` is one float per prepared style — arbitrary per-frame
        values, exactly the reference's ``transfer(frame, weight)`` contract
        (``Multi-style Interpolation/stylization.py:96-104``)."""
        if len(weights) != len(self.styles):
            raise ValueError(
                f"got {len(weights)} weights for {len(self.styles)} styles")
        if self.mesh is not None:
            from rerevst_tpu.parallel.spatial import (
                multistyle_decode_spatial,
                spatial_feats_ok,
            )

            if spatial_feats_ok(feats_one.shape[0], feats_one.shape[1],
                                self.mesh):
                # Batch-1 per-weight decode previously used ONE chip on any
                # mesh; shard the feature map's H rows instead (round 5 —
                # the multi-style analog of Stylization's spatial path).
                out = multistyle_decode_spatial(
                    self.params, feats_one, self.styles, self.stats,
                    weights, self.cfg, self.mesh)
                h, w_ = self._orig_hw
                return model_to_bgr(
                    np.asarray(crop_back(out, h, w_, self.infer.pad)))
        w = [jnp.asarray(wi, jnp.float32) for wi in weights]
        out = self._transfer(self.params, feats_one, self.styles, self.stats, w)
        h, w_ = self._orig_hw
        return model_to_bgr(np.asarray(crop_back(out, h, w_, self.infer.pad)))

    def _replicated_state(self):
        """(params, styles, stats) replicated over the mesh, cached —
        re-broadcasting the full parameter set per bs-frame chunk would pay
        one param transfer per chunk for call-invariant state.  Invalidated
        by prepare_styles/prepare_global."""
        if self._replicated is None:
            from rerevst_tpu.parallel.mesh import replicated

            self._replicated = jax.device_put(
                (self.params, self.styles, self.stats),
                replicated(self.mesh))
        return self._replicated

    def transfer_batch(self, feats, weight_rows) -> List[np.ndarray]:
        """Decode a [B,...] feature batch, each frame under ITS OWN blend
        weights ([B, n_styles]), in ONE device call.

        The reference's interpolation loop pays one call per frame
        (``Multi-style Interpolation/test.py:127-131``); per-sample blended
        stats/filters make the weight schedule itself batch data.  On a
        mesh session the batch axis is sharded over the devices."""
        w = np.asarray(weight_rows, np.float32)
        n = feats.shape[0]
        if w.shape != (n, len(self.styles)):
            raise ValueError(f"weights shape {w.shape} != "
                             f"({n}, {len(self.styles)})")
        if self.mesh is not None:
            from rerevst_tpu.parallel.spatial import (
                multistyle_decode_spatial,
                spatial_feats_ok,
            )

            if spatial_feats_ok(n, feats.shape[1], self.mesh):
                # Fewer frames than chips: hybrid batch x feature-row
                # sharding keeps every chip busy (batch sharding alone
                # would pad n up to the device count with wasted rows).
                out = multistyle_decode_spatial(
                    self.params, feats, self.styles, self.stats, w,
                    self.cfg, self.mesh)
                h, w_ = self._orig_hw
                out = np.asarray(crop_back(out, h, w_, self.infer.pad),
                                 dtype=np.float32)
                return [model_to_bgr(out[i : i + 1]) for i in range(n)]
        if self.mesh is not None and n > 1:
            from rerevst_tpu.parallel.mesh import pad_to_multiple, sharded_batch

            ndev = self.mesh.devices.size
            # pad_to_multiple keeps numpy numpy and device arrays on device
            # (no D2H fetch of a device-resident batch just to pad it).
            fp, _ = pad_to_multiple(feats, ndev)
            wp, _ = pad_to_multiple(w, ndev)
            sh = sharded_batch(self.mesh)
            params, styles, stats = self._replicated_state()
            out = self._transfer_batch(params, jax.device_put(fp, sh),
                                       styles, stats,
                                       jax.device_put(wp, sh))[:n]
        else:
            out = self._transfer_batch(self.params, feats, self.styles,
                                       self.stats, jnp.asarray(w))
        h, w_ = self._orig_hw
        out = np.asarray(crop_back(out, h, w_, self.infer.pad),
                         dtype=np.float32)
        return [model_to_bgr(out[i : i + 1]) for i in range(n)]

    #: interpolate_video spills the frame-feature cache to a temp memmap
    #: above this clip length (device/host RAM stays bounded; mirrors
    #: Stylization.STREAMING_THRESHOLD).
    SPILL_THRESHOLD = 64

    def interpolate_video(self, frames_bgr,
                          weights: Optional[Sequence[Sequence[float]]] = None,
                          cache_path: Optional[str] = None,
                          batch_size: int = 8):
        """Stylize a clip under a per-frame weight schedule.

        `frames_bgr`: any ``as_source`` input, read lazily.  Long clips
        (> SPILL_THRESHOLD frames) automatically cache features in a temp
        memmap, so memory is bounded in clip length — the reference's disk
        cache (``Multi-style Interpolation/test.py:87-98``) made automatic.

        `weights`: one row of len(styles) floats per frame (arbitrary values,
        as the reference driver allows, ``Multi-style
        Interpolation/test.py:127-131``).  Default: ``linear_sweep_weights``
        — the reference's demo ``[t, 1-t]`` A<-B sweep, generalized to a
        piecewise-linear traversal through all N styles."""
        from rerevst_tpu.data.source import as_source

        src = as_source(frames_bgr)
        n = len(src)
        tmp = None
        if cache_path is None and n > self.SPILL_THRESHOLD:
            import tempfile

            fd, tmp = tempfile.mkstemp(prefix="rerevst_msfeat_",
                                       suffix=".npy")
            os.close(fd)
            cache_path = tmp
        try:
            feats = self.encode_frames(src, cache_path=cache_path)
            self.prepare_global(feats)
            if weights is None:
                weights = linear_sweep_weights(n, len(self.styles))
            if len(weights) != n:
                raise ValueError(
                    f"weight schedule has {len(weights)} rows for {n} frames")
            # Batched decode: per-sample blended stats put the whole weight
            # schedule inside one program — bs frames per device call
            # instead of the reference's one (PERF.md batch scaling).  The
            # tail chunk pads up to bs (repeat last row) so exactly ONE
            # batch shape ever compiles.
            bs = max(int(batch_size), 1)
            for i in range(0, n, bs):
                # Slice in place: device-resident features stay on device
                # (a np.asarray here would fetch every chunk D2H over the
                # slow tunnel just to re-upload it); memmap slices convert
                # on upload inside transfer_batch.
                chunk = feats[i : i + bs]
                rows = [list(r) for r in weights[i : i + bs]]
                k = len(rows)
                if k < bs and n > bs:
                    xp = np if isinstance(chunk, np.ndarray) else jnp
                    chunk = xp.concatenate(
                        [chunk] + [chunk[-1:]] * (bs - k))
                    rows += [rows[-1]] * (bs - k)
                yield from self.transfer_batch(chunk, rows)[:k]
        finally:
            if tmp is not None:
                for p in (tmp, tmp + ".meta.json"):
                    try:
                        os.remove(p)
                    except OSError:
                        pass


def linear_sweep_weights(n_frames: int, n_styles: int) -> List[List[float]]:
    """Piecewise-linear sweep visiting every style: the last style at frame
    0, the first at the last frame.  For two styles this is exactly the
    reference demo schedule ``[i/(n-1), 1-i/(n-1)]``
    (``Multi-style Interpolation/test.py:127-131``)."""
    if n_styles < 2:
        return [[1.0]] * n_frames
    rows = []
    for i in range(n_frames):
        u = i / max(n_frames - 1, 1)
        s = (1.0 - u) * (n_styles - 1)
        k = min(int(s), n_styles - 2)
        frac = s - k
        w = [0.0] * n_styles
        w[k] = 1.0 - frac
        w[k + 1] = frac
        rows.append(w)
    return rows
