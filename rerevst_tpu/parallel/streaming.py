"""Streaming sequence-statistics collection for arbitrarily long videos.

The reference's long-sequence path spills per-frame features to ``cache/%d.pt``
and re-reads them layer-by-layer (``test/style_network.py:540-574``) — and is
broken (calls a method that doesn't exist, ``test/style_network.py:550``).
This is its working TPU-native replacement: the sampled-frame features live
on host (any array, e.g. a numpy memmap); device memory holds only one chunk
at a time.

Algorithm.  The collection graph has 14 cross-frame reduction stages in
dependency order (each stage's input needs all earlier stages frozen):

  pre | f1 | f2 | f3 | ada4 | res4a | res4b | ada3 | res3a | res3b
      | ada2 | res2a | res2b | ada1

Per stage we stream all chunks through the frozen prefix and accumulate ONE
pass of reductions, exploiting that the min/max of the *normalized* values
are a monotone affine image of the raw min/max — so raw (count, mean, M2
via Welford merge, min, max) per channel suffice, no second pass.  Filter
stages accumulate the batch-pooled predictor inputs
(``test/style_network_global.py:161-172``).

Cost: ~7x the single-pass collection FLOPs — the price of O(chunk) memory.
Results match batched ``collect_stats`` (verified in tests) up to fp
reassociation.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from rerevst_tpu.config import ModelConfig
from rerevst_tpu.models.layers import (
    apply_dynamic_filter,
    conv2d,
    leaky_relu,
    linear,
    precision_for,
    upsample2x_conv3x3,
)
from rerevst_tpu.models.transformer import (
    NormStats,
    SeqStats,
    StyleFeatures,
    _norm_apply,
)
from rerevst_tpu.ops.resize import upsample_nearest_2x

#: reduction stages in dependency order
STAGES = ("pre", "f1", "f2", "f3", "ada4", "res4a", "res4b",
          "ada3", "res3a", "res3b", "ada2", "res2a", "res2b", "ada1")

#: norm stage -> how its input is produced from the previous frozen state
_RES_OF = {"res4a": "res4", "res4b": "res4", "res3a": "res3", "res3b": "res3",
           "res2a": "res2", "res2b": "res2"}


def _prefix_to(params_dec: Dict, x, style: StyleFeatures, stats: Dict,
               filters: Dict, cfg: ModelConfig, upto: str):
    """Run the frozen-stats decode prefix; return the tensor the stage `upto`
    reduces over (plus, for filter stages, the pooled-style vector source)."""
    prec = precision_for(cfg.dtype, cfg.precision)
    m1, m2, m3, m4 = style.means
    s1, s2, s3, s4 = style.stds
    ns = (style.map - m4) / s4

    if upto == "pre":
        return x
    h = _norm_apply(stats["pre"], x)
    for i in (1, 2, 3):
        name = f"f{i}"
        p = params_dec[f"filter{i}"]
        if upto == name:
            return h  # predictors pool THIS tensor (their input content)
        inner = conv2d(p["down"], h, padding=1, precision=prec)
        inner = leaky_relu(apply_dynamic_filter(inner, filters[f"f{i}a"], prec))
        inner = apply_dynamic_filter(inner, filters[f"f{i}b"], prec)
        h = h + conv2d(p["up"], inner, padding=1, precision=prec)

    def ada(h, key, m, s):
        return _norm_apply(stats[key], h) * s + m

    plan = (("ada4", m4, s4, "res4"), ("ada3", m3, s3, "res3"),
            ("ada2", m2, s2, "res2"))
    for ada_key, m, s, res in plan:
        if upto == ada_key:
            return h
        h = ada(h, ada_key, m, s)
        p = params_dec[res]
        t = leaky_relu(upsample2x_conv3x3(p["conv1"], h, precision=prec))
        if upto == res + "a":
            return t
        t = _norm_apply(stats[res + "a"], t)
        t = leaky_relu(conv2d(p["conv2"], t, padding=1, precision=prec))
        if upto == res + "b":
            return t
        t = _norm_apply(stats[res + "b"], t)
        xs = upsample_nearest_2x(conv2d(p["shortcut"], h, padding=0,
                                        precision=prec))
        h = xs + t
    if upto == "ada1":
        return h
    raise ValueError(upto)


class _Welford:
    """Chunk-mergeable per-channel moments + extrema."""

    def __init__(self, c: int):
        self.count = 0.0
        self.mean = np.zeros(c, np.float64)
        self.m2 = np.zeros(c, np.float64)
        self.min = np.full(c, np.inf, np.float64)
        self.max = np.full(c, -np.inf, np.float64)

    def update(self, cnt, mean, m2, mn, mx):
        mean, m2 = np.float64(mean), np.float64(m2)
        delta = mean - self.mean
        tot = self.count + cnt
        if tot == 0:
            return
        self.m2 += m2 + delta * delta * (self.count * cnt / tot)
        self.mean += delta * (cnt / tot)
        self.count = tot
        self.min = np.minimum(self.min, mn)
        self.max = np.maximum(self.max, mx)

    def finalize(self, eps: float) -> NormStats:
        mean = self.mean
        var = self.m2 / max(self.count, 1.0)
        rstd = 1.0 / np.sqrt(var + eps)
        xmin = (self.min - mean) * rstd
        xmax = (self.max - mean) * rstd
        def _c(a):
            return jnp.asarray(a.reshape(1, 1, 1, -1), jnp.float32)
        return NormStats(_c(mean), _c(rstd), _c(xmin), _c(xmax))


class _ChunkFeed:
    """Lazy chunk iterator over a host feature array / memmap.

    Slices are materialized one chunk at a time at iteration (a memmap
    backing stays on disk between stages — the earlier eager list held the
    ENTIRE feature set in host RAM, defeating the spill for long clips).
    With a mesh, each chunk is padded to the device multiple and uploaded
    batch-sharded, so the per-chunk reductions run as one SPMD program;
    the mask keeps pad rows out of every reduction.
    """

    def __init__(self, feats_host, chunk_size: int, mesh=None):
        self.feats = feats_host
        self.n = feats_host.shape[0]
        self.mesh = mesh
        if mesh is not None:
            from rerevst_tpu.parallel.mesh import sharded_batch

            ndev = mesh.devices.size
            self.chunk = max(chunk_size, ndev)
            self.sharding = sharded_batch(mesh)
        else:
            self.chunk = chunk_size
            self.sharding = None

    def __iter__(self):
        from rerevst_tpu.parallel.mesh import pad_to_multiple

        for i in range(0, self.n, self.chunk):
            ch = np.asarray(self.feats[i : i + self.chunk])
            if self.mesh is not None:
                # Pad on host, then ONE sharded upload per array — a
                # jnp.asarray first would land the whole chunk on the
                # default device and pay a second resharding copy.
                ch, mask = pad_to_multiple(ch, self.mesh.devices.size)
                yield (jax.device_put(ch, self.sharding),
                       jax.device_put(mask, self.sharding))
            else:
                mask = np.ones((ch.shape[0],), np.float32)
                yield jnp.asarray(ch), jnp.asarray(mask)


def collect_stats_streaming(params_dec: Dict, feats_host, style: StyleFeatures,
                            cfg: ModelConfig, chunk_size: int = 4,
                            mesh=None) -> SeqStats:
    """collect_stats over `feats_host` [N, h, w, 512] (host array / memmap)
    with O(chunk_size) device memory.

    `mesh`: optionally shard each chunk's batch axis over a device mesh —
    the constant-memory and multi-chip Pass-1 modes compose (each chunk's
    moment/extrema/pool reductions become psum/pmin/pmax over ICI; the
    host-side Welford merge across chunks is unchanged).
    """
    feed = _ChunkFeed(feats_host, chunk_size, mesh)
    norms: Dict[str, NormStats] = {}
    filters: Dict[str, jnp.ndarray] = {}
    prec = precision_for(cfg.dtype, cfg.precision)

    # Style-side pooled predictor inputs are frame-independent: precompute.
    m4, s4 = style.means[3], style.stds[3]
    ns = (style.map - m4) / s4

    masked = mesh is not None  # pad rows exist only on the sharded feed

    def chunk_moments(upto):
        @jax.jit
        def f(x, mask):
            t = _prefix_to(params_dec, x, style, norms, filters, cfg, upto)
            tf = t.astype(jnp.float32)
            if not masked:
                cnt = jnp.asarray(float(np.prod(t.shape[:3])))
                mean = jnp.mean(tf, (0, 1, 2))
                m2 = jnp.sum(jnp.square(tf - mean), (0, 1, 2))
                return (mean, m2, jnp.min(tf, (0, 1, 2)),
                        jnp.max(tf, (0, 1, 2)), cnt)
            # Mask via where, not multiply: values can overflow to inf at
            # f32 (random-init tests hit 1e28 activations, inf on square)
            # and inf * 0.0 on a pad row would poison the sum with NaN —
            # where() keeps pad contributions exactly zero regardless.
            m = mask.reshape(-1, 1, 1, 1) > 0
            cnt = jnp.sum(mask) * (t.shape[1] * t.shape[2])
            mean = jnp.sum(jnp.where(m, tf, 0.0), (0, 1, 2)) / cnt
            m2 = jnp.sum(jnp.where(m, jnp.square(tf - mean), 0.0), (0, 1, 2))
            return (mean, m2,
                    jnp.min(jnp.where(m, tf, jnp.inf), (0, 1, 2)),
                    jnp.max(jnp.where(m, tf, -jnp.inf), (0, 1, 2)),
                    cnt)
        return f

    for stage in STAGES:
        if stage.startswith("f") and len(stage) == 2:
            i = int(stage[1])
            ic = cfg.filter_channels
            for sub, pk in (("a", "p1"), ("b", "p2")):
                fprm = params_dec[f"filter{i}"][pk]
                pc = _pool_pred(fprm, feed, params_dec, style, norms,
                                filters, cfg, stage)
                ps = jnp.mean(conv2d(fprm["down"], ns, padding=1,
                                     precision=prec), (1, 2))
                f_ = linear(fprm["fc"], jnp.concatenate([pc, ps], axis=1),
                            precision=prec)
                filters[f"f{i}{sub}"] = f_.reshape(-1, ic, ic)
        else:
            fn = chunk_moments(stage)
            wf = None
            for ch, mask in feed:
                mean, m2, mn, mx, cnt = [np.asarray(v)
                                         for v in fn(ch, mask)]
                if wf is None:
                    wf = _Welford(mean.shape[0])
                wf.update(float(cnt), mean, m2, mn, mx)
            norms[stage] = wf.finalize(cfg.norm_eps)

    return SeqStats(norms, filters)


def _pool_pred(fprm, feed, params_dec, style, norms, filters, cfg, stage):
    """Pooled predictor-content vector for one FilterPredictor: mean over all
    frames of the spatial mean of its own down conv."""
    prec = precision_for(cfg.dtype, cfg.precision)

    @jax.jit
    def f(x, mask):
        h = _prefix_to(params_dec, x, style, norms, filters, cfg, stage)
        pc = jnp.mean(conv2d(fprm["down"], h, padding=1, precision=prec),
                      (1, 2))
        # where, not multiply: see chunk_moments (inf * 0 pad -> NaN).
        return (jnp.sum(jnp.where(mask[:, None] > 0, pc, 0.0), axis=0),
                jnp.sum(mask))

    acc, cnt = 0.0, 0.0
    for ch, mask in feed:
        s, c = f(ch, mask)
        acc = acc + np.asarray(s, dtype=np.float64)
        cnt += float(c)
    return jnp.asarray((acc / cnt)[None], jnp.float32)
