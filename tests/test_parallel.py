"""Multi-chip sharding correctness on the virtual 8-device CPU mesh.

The centerpiece mapping of the rebuild (SURVEY §5): Pass 1 global statistics
are a two-pass reduction over the frame axis -> psum/pmin/pmax over the mesh;
Pass 2 is embarrassingly frame-parallel.  These tests pin sharded == single
-device numerics, including non-divisible frame counts (mask path).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rerevst_tpu.config import ModelConfig
from rerevst_tpu.models.transformer import (
    TransformerNet,
    collect_stats,
    encode_content,
    encode_style,
    init_transformer_params,
)
from rerevst_tpu.ops.image import normalize
from rerevst_tpu.parallel import (
    collect_stats_sharded,
    frame_mesh,
    stylize_frames_sharded,
)

CFG = ModelConfig()
NET = TransformerNet(CFG)


@pytest.fixture(scope="module")
def setup():
    params = init_transformer_params(jax.random.PRNGKey(1), CFG,
                                     with_loss_net=False)
    # Conditioning: random-init VGG features have many near-dead channels
    # whose rsqrt(var+eps) normalization amplifies fp noise chaotically —
    # any cross-ordering comparison would measure chaos, not correctness.
    # Use healthy synthetic relu4_1 features instead (all channels alive),
    # as a trained encoder would produce; the stock 0.02-gain decoder init
    # is well-behaved on them.
    rng = np.random.default_rng(2)
    style = normalize(jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32)))
    frames = normalize(jnp.asarray(rng.random((5, 64, 64, 3), dtype=np.float32)))
    sf = encode_style(params, style, CFG)
    feats = jnp.asarray(
        np.abs(rng.standard_normal((5, 8, 8, 512))).astype(np.float32)
        * (0.5 + rng.random(512, dtype=np.float32))
    )
    return params, sf, feats, frames


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("ndev", [2, 8])
def test_sharded_collect_matches_single_device(setup, ndev):
    """psum/pmin/pmax-sharded Pass 1 == batched single-device Pass 1.

    5 frames over 8 devices also exercises the mask path (3 padded frames
    must be statistically invisible)."""
    params, sf, feats, _ = setup
    mesh = frame_mesh(ndev)
    single = collect_stats(params["decoder"], feats, sf, CFG)
    sharded = collect_stats_sharded(params["decoder"], feats, sf, CFG, mesh)
    for a, b in zip(jax.tree.leaves(single), jax.tree.leaves(sharded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_masked_collect_equals_unpadded(setup):
    """mask semantics alone (no mesh): padded frames don't change stats."""
    params, sf, feats, _ = setup
    plain = collect_stats(params["decoder"], feats, sf, CFG)
    padded = jnp.concatenate([feats, feats[-1:] * 7.0], axis=0)
    mask = jnp.asarray([1, 1, 1, 1, 1, 0], jnp.float32)
    masked = collect_stats(params["decoder"], padded, sf, CFG, mask=mask)
    for a, b in zip(jax.tree.leaves(plain), jax.tree.leaves(masked)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_streaming_collect_matches_batched(setup):
    """Bounded-memory streaming collection (the working replacement of the
    reference's broken disk-spill long-video path) == batched collection."""
    from rerevst_tpu.parallel.streaming import collect_stats_streaming

    params, sf, feats, _ = setup
    batched = collect_stats(params["decoder"], feats, sf, CFG)
    streamed = collect_stats_streaming(params["decoder"], np.asarray(feats),
                                       sf, CFG, chunk_size=2)
    import jax.tree_util as jtu

    for (pa, a), (_, b) in zip(jtu.tree_leaves_with_path(batched),
                               jtu.tree_leaves_with_path(streamed)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=jtu.keystr(pa))


def test_sharded_streaming_collect_matches_batched(setup):
    """Streaming collection with per-chunk reductions SHARDED over the mesh
    (constant-memory + multi-chip composed) == batched collection.  5 frames
    through one 8-padded chunk also exercises the pad-mask path."""
    from rerevst_tpu.parallel.streaming import collect_stats_streaming

    params, sf, feats, _ = setup
    batched = collect_stats(params["decoder"], feats, sf, CFG)
    streamed = collect_stats_streaming(params["decoder"], np.asarray(feats),
                                       sf, CFG, chunk_size=2,
                                       mesh=frame_mesh(8))
    import jax.tree_util as jtu

    for (pa, a), (_, b) in zip(jtu.tree_leaves_with_path(batched),
                               jtu.tree_leaves_with_path(streamed)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=jtu.keystr(pa))


# --- sharded train step (train/step.py:make_sharded_train_step) ------------

from rerevst_tpu.config import LossConfig, TrainConfig  # noqa: E402
from rerevst_tpu.train.state import init_train_state  # noqa: E402
from rerevst_tpu.train.step import (  # noqa: E402
    make_sharded_train_step,
    make_train_step,
)


@pytest.fixture(scope="module")
def train_setup():
    # relax_style and temporal_loss are batch-coupled / per-device-PRNG by
    # design (see the divergence tests below); the remaining losses are
    # per-sample means, so pmean-of-shard-grads == full-batch grad exactly.
    cfg = TrainConfig(
        batch_size=8,
        model=CFG,
        loss=LossConfig(relax_style=False, temporal_loss=False),
    )
    # he_relu: magnitude-preserving VGG init — keeps relu4_1 channels alive
    # so rsqrt(var+eps) doesn't amplify reduction-order noise chaotically.
    params = init_transformer_params(jax.random.PRNGKey(3), CFG,
                                     with_loss_net=True,
                                     vgg_scheme="he_relu")
    rng = np.random.default_rng(7)
    content = normalize(jnp.asarray(rng.random((8, 32, 32, 3), np.float32)))
    style = normalize(jnp.asarray(rng.random((8, 32, 32, 3), np.float32)))
    return cfg, params, content, style


@pytest.mark.slow
@pytest.mark.parametrize("ndev", [2, 8])
def test_sharded_train_step_matches_single_device(train_setup, ndev):
    """One DP step == one single-device step on the same batch: grads are
    pmean'd over ICI, metrics pmean'd, params replicated."""
    cfg, params, content, style = train_setup
    key = jax.random.PRNGKey(11)

    single_step = make_train_step(cfg, params)
    s1, m1 = single_step(init_train_state(params, cfg), content, style, key)

    sharded_step = make_sharded_train_step(cfg, params, frame_mesh(ndev))
    s2, m2 = sharded_step(init_train_state(params, cfg), content, style, key)

    assert int(s2.step) == 1
    for k in m1:
        np.testing.assert_allclose(np.asarray(m1[k]), np.asarray(m2[k]),
                                   rtol=5e-4, atol=5e-6, err_msg=f"metric {k}")
    # First Adam step is ~lr*sign(g): where |g| is at fp-noise scale the sign
    # can flip between reduction orderings, bounding the diff by 2*lr=2e-4.
    import jax.tree_util as jtu
    changed = 0
    for (pa, a), (_, b) in zip(jtu.tree_leaves_with_path(s1.params),
                               jtu.tree_leaves_with_path(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2.5e-4, rtol=0,
                                   err_msg=jtu.keystr(pa))
        changed += int(not np.array_equal(np.asarray(a), np.asarray(b)))
    # Sanity: the step actually updated something on both paths.
    leaves0 = jax.tree.leaves(params)
    leaves1 = jax.tree.leaves(s2.params)
    assert any(not np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(leaves0, leaves1))


@pytest.mark.slow
def test_grad_accum_matches_manual_microbatch_average(train_setup):
    """grad_accum=2 on batch 8: the single jitted step's update must equal
    an explicit two-micro-batch value_and_grad average (same per-chunk PRNG
    folds) pushed through the same optimizer."""
    import dataclasses

    import optax

    from rerevst_tpu.train.state import make_optimizer
    from rerevst_tpu.train.step import compute_losses

    cfg, params, content, style = train_setup
    cfg2 = dataclasses.replace(cfg, grad_accum=2)
    key = jax.random.PRNGKey(31)

    step = make_train_step(cfg2, params)
    s1, m1 = step(init_train_state(params, cfg2), content, style, key)

    keys = jax.random.split(key, 2)
    grads, mets = [], []
    for i in range(2):
        c, s = content[i * 4:(i + 1) * 4], style[i * 4:(i + 1) * 4]

        def loss_fn(p):
            total, (metrics, _) = compute_losses(p, c, s, keys[i], cfg2)
            return total, metrics

        (_, met), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        grads.append(g)
        mets.append(met)
    g_mean = jax.tree.map(lambda a, b: (a + b) / 2.0, *grads)
    opt = make_optimizer(cfg2, params)
    state0 = init_train_state(params, cfg2)
    updates, _ = opt.update(g_mean, state0.opt_state, params)
    want_params = optax.apply_updates(params, updates)

    import jax.tree_util as jtu
    for (pa, a), (_, b) in zip(jtu.tree_leaves_with_path(s1.params),
                               jtu.tree_leaves_with_path(want_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2.5e-4, rtol=0,
                                   err_msg=jtu.keystr(pa))
    for k in m1:
        want = (np.asarray(mets[0][k]) + np.asarray(mets[1][k])) / 2.0
        np.testing.assert_allclose(np.asarray(m1[k]), want,
                                   rtol=5e-4, atol=5e-6, err_msg=f"metric {k}")


@pytest.mark.slow
def test_grad_accum_composes_with_sharding_and_rejects_indivisible(
        train_setup):
    import dataclasses

    cfg, params, content, style = train_setup
    cfg2 = dataclasses.replace(cfg, grad_accum=2)
    key = jax.random.PRNGKey(33)

    # 2 devices x accum 2 over batch 8 -> per-device batch 4, chunks of 2.
    sharded = make_sharded_train_step(cfg2, params, frame_mesh(2))
    s, m = sharded(init_train_state(params, cfg2), content, style, key)
    assert int(s.step) == 1
    assert all(np.isfinite(np.asarray(v)).all() for v in m.values())

    cfg3 = dataclasses.replace(cfg, grad_accum=3)
    step3 = make_train_step(cfg3, params)
    with pytest.raises(ValueError, match="must divide"):
        step3(init_train_state(params, cfg3), content, style, key)


@pytest.mark.slow
def test_sharded_per_device_rng_distinct_flows(train_setup):
    """The sharded step folds `lax.axis_index` into the PRNG key: with
    temporal loss on and identical per-device sub-batches, each device must
    see a *different* fake flow (like independent dataloader workers), and
    the pmean'd temporal metric must equal the average of the two
    single-device runs with the correspondingly folded keys."""
    _, params, content, style = train_setup
    cfg = TrainConfig(
        batch_size=2, model=CFG,
        loss=LossConfig(relax_style=False, temporal_loss=True),
    )
    x = content[:1]
    sty = style[:1]
    batch_c = jnp.concatenate([x, x], axis=0)
    batch_s = jnp.concatenate([sty, sty], axis=0)
    key = jax.random.PRNGKey(21)

    sharded_step = make_sharded_train_step(cfg, params, frame_mesh(2))
    _, m_sharded = sharded_step(init_train_state(params, cfg),
                                batch_c, batch_s, key)

    single_step = make_train_step(cfg, params)
    metrics = []
    for idx in range(2):
        folded = jax.random.fold_in(key, idx)
        _, m = single_step(init_train_state(params, cfg), x, sty, folded)
        metrics.append(m)

    t0 = float(metrics[0]["temporal"])
    t1 = float(metrics[1]["temporal"])
    # Distinct per-device streams -> distinct fake motion -> distinct loss.
    assert abs(t0 - t1) > 1e-7
    np.testing.assert_allclose(float(m_sharded["temporal"]), (t0 + t1) / 2,
                               rtol=5e-4, atol=5e-6)


def test_sharded_train_step_rejects_non_divisible(train_setup):
    """Contract: padding a *training* batch would bias pmean'd gradients, so
    non-divisible batches are a loud error, not a silent pad."""
    cfg, params, content, style = train_setup
    step = make_sharded_train_step(cfg, params, frame_mesh(8))
    with pytest.raises(ValueError, match="divisible"):
        step(init_train_state(params, cfg), content[:5], style[:5],
             jax.random.PRNGKey(0))


def test_sharded_stylize_matches_single_device(setup):
    params, sf, feats, frames = setup
    stats = collect_stats(params["decoder"], feats, sf, CFG)
    mesh = frame_mesh(8)
    single = NET.stylize(params, frames, sf, stats)
    sharded = stylize_frames_sharded(params, frames, sf, stats, CFG, mesh)
    assert sharded.shape == single.shape
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               rtol=1e-4, atol=1e-4)
