"""Mixed-precision decoder tail (ModelConfig.fp32_mix) invariants.

The quantitative story (pixel error / fps per config on the real fixture,
TPU) lives in PERF.md and ``rerevst_tpu.eval.parity``; these tests pin the
graph-level semantics on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rerevst_tpu.config import ModelConfig
from rerevst_tpu.models.transformer import (
    collect_stats,
    decode,
    decode_global,
    encode_content,
    encode_style,
    init_transformer_params,
)

TAILS = ("out", "res2", "dec", "enc", "full", "body")
#: Output dtype per region choice: 'enc' and 'body' end in bf16 stages;
#: every other region ends fp32.
OUT_DTYPE = {"out": jnp.float32, "res2": jnp.float32, "dec": jnp.float32,
             "enc": jnp.bfloat16, "full": jnp.float32,
             "body": jnp.bfloat16}


def _setup(cfg):
    params = init_transformer_params(jax.random.PRNGKey(0), cfg,
                                     with_loss_net=False)
    params["decoder"] = jax.tree.map(lambda a: a * 5.0, params["decoder"])
    style = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3),
                              cfg.dtype) * 0.5
    frames = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 64, 3),
                               cfg.dtype) * 0.5
    sf = encode_style(params, style, cfg)
    feats = encode_content(params, frames, cfg)
    stats = collect_stats(params["decoder"], feats, sf, cfg)
    return params, sf, feats, stats


@pytest.mark.parametrize("tail", TAILS)
def test_tail_outputs_fp32_and_finite(tail):
    cfg = ModelConfig(dtype=jnp.bfloat16, fp32_mix=tail)
    params, sf, feats, stats = _setup(cfg)
    if tail in ("full", "body"):
        assert feats.dtype == jnp.float32  # fp32 features flow through
    elif tail == "enc":
        assert feats.dtype == jnp.bfloat16  # cast back for the bf16 decoder
    out = decode_global(params["decoder"], feats, sf, stats, cfg)
    per = decode(params["decoder"], feats, sf, cfg)
    for o in (out, per):
        assert o.dtype == OUT_DTYPE[tail]
        assert o.shape == (2, 64, 64, 3)
        assert bool(jnp.isfinite(o).all())


def test_tail_none_unchanged():
    """fp32_mix='none' must be bit-identical to the pre-knob bf16 graph."""
    cfg0 = ModelConfig(dtype=jnp.bfloat16)
    cfg1 = ModelConfig(dtype=jnp.bfloat16, fp32_mix="none")
    params, sf, feats, stats = _setup(cfg0)
    a = decode_global(params["decoder"], feats, sf, stats, cfg0)
    b = decode_global(params["decoder"], feats, sf, stats, cfg1)
    assert a.dtype == b.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(a, np.float32),
                                  np.asarray(b, np.float32))


@pytest.mark.parametrize("tail", TAILS)
def test_tail_ignored_at_fp32(tail):
    """With fp32 params/activations the tail is a no-op (guards against
    double-casting or precision downgrades in the parity config)."""
    plain = ModelConfig(dtype=jnp.float32)
    tailed = ModelConfig(dtype=jnp.float32, fp32_mix=tail)
    params, sf, feats, stats = _setup(plain)
    a = decode_global(params["decoder"], feats, sf, stats, plain)
    b = decode_global(params["decoder"], feats, sf, stats, tailed)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_f16_storage_runs_and_beats_bf16():
    """fp16 activation storage: 8x finer rounding than bf16 at the same
    bandwidth (the TPU-native answer to bf16's storage-rounding error —
    measured quantitatively in PERF.md).

    Uses the bundled *trained* checkpoint: with trained weights, peak
    activations are ~1e2 (650x below f16 max).  Random-init weights are out
    of scope for f16 — their unbounded frozen-filter FC outputs (~1e9)
    legitimately overflow the format, which is why f16 is an
    inference-storage option, not a training dtype.
    """
    import os

    path = "/root/repo/models/demo_plum_4000.msgpack"
    if not os.path.exists(path):
        pytest.skip("demo checkpoint not present")
    cv2 = pytest.importorskip("cv2")
    from rerevst_tpu.io.checkpoint import load_params

    frame = cv2.imread(
        "/root/reference/test/inputs/ambush_4/frame_0001.png")[:64, :96]
    style_img = cv2.resize(
        cv2.imread("/root/reference/test/inputs/plum_flower.jpg"), (64, 64))
    from rerevst_tpu.data.transforms import bgr_to_model

    params32 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32),
                            load_params(path))
    ref_cfg = ModelConfig(dtype=jnp.float32)
    x = jnp.asarray(bgr_to_model(frame))
    sf = encode_style(params32, jnp.asarray(bgr_to_model(style_img)), ref_cfg)
    feats = encode_content(params32, x, ref_cfg)
    stats = collect_stats(params32["decoder"], feats, sf, ref_cfg)

    def run(dtype):
        p = jax.tree.map(lambda a: jnp.asarray(a, dtype), params32)
        sfc = jax.tree.map(lambda a: jnp.asarray(a, dtype), sf)
        f = jnp.asarray(feats, dtype)
        out = decode_global(p["decoder"], f, sfc, stats,
                            ModelConfig(dtype=dtype))
        assert bool(jnp.isfinite(out).all())
        return np.asarray(out, np.float32)

    ref = run(jnp.float32)
    err_bf16 = np.abs(run(jnp.bfloat16) - ref).mean()
    err_f16 = np.abs(run(jnp.float16) - ref).mean()
    assert err_f16 < err_bf16 * 0.5  # f16 storage is decisively closer
    assert err_bf16 > 0


def test_tail_reduces_error_vs_fp32():
    """On the same (well-conditioned) weights, each tail config must be at
    least as close to the fp32-HIGHEST output as pure bf16 is (measured as
    mean |Δ|; the tails only *remove* rounding events)."""
    ref_cfg = ModelConfig(dtype=jnp.float32)
    params, sf, feats, stats = _setup(ref_cfg)

    def run(cfg):
        p = jax.tree.map(lambda a: jnp.asarray(a, cfg.dtype), params)
        sfc = jax.tree.map(lambda a: jnp.asarray(a, cfg.dtype), sf)
        stc = jax.tree.map(lambda a: a, stats)  # stats stay fp32
        f = jnp.asarray(feats, cfg.dtype)
        return np.asarray(
            decode_global(p["decoder"], f, sfc, stc, cfg), np.float32)

    ref = run(ref_cfg)
    err_bf16 = np.abs(run(ModelConfig(dtype=jnp.bfloat16)) - ref).mean()
    err_dec = np.abs(
        run(ModelConfig(dtype=jnp.bfloat16, fp32_mix="dec")) - ref).mean()
    assert err_dec <= err_bf16 * 1.05
    assert err_bf16 > 0  # sanity: bf16 actually differs
