"""Intra-frame (spatial) sharded Pass 2 — parallel/spatial.py.

The round-5 answer to "batch-1 uses one chip however many the mesh has":
H shards across the mesh, GSPMD inserts collective-permute halo exchanges
at every conv/pool/upsample boundary, and the pixels must match the
single-device graph (the Pass-2 graph is H-local under frozen statistics,
``test/style_network_global.py:441-451``).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from rerevst_tpu.config import ModelConfig
from rerevst_tpu.models.transformer import (
    collect_stats,
    decode_global,
    encode_content,
    encode_style,
    init_transformer_params,
)
from rerevst_tpu.parallel.spatial import (
    _jitted,
    spatial_ok,
    stylize_spatial_sharded,
)

CFG = ModelConfig()


@pytest.fixture(scope="module")
def setup():
    params = init_transformer_params(jax.random.PRNGKey(0), CFG,
                                     with_loss_net=False)
    # x5 decoder gain: well-conditioned norms (see tests/ref_oracle notes).
    params["decoder"] = jax.tree.map(lambda a: a * 5.0, params["decoder"])
    style = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 96, 3)) * 0.5
    frames = jax.random.normal(jax.random.PRNGKey(2), (4, 64, 96, 3)) * 0.5
    sf = encode_style(params, style, CFG)
    feats = encode_content(params, frames, CFG)
    stats = collect_stats(params["decoder"], feats, sf, CFG)
    return params, frames, sf, stats


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    return Mesh(np.array(devs[:8]), ("data",))


class TestSpatialOk:
    def test_gates(self, mesh8):
        assert spatial_ok(1, 64, mesh8)          # pure spatial
        assert spatial_ok(2, 64, mesh8)          # hybrid 2 x 4
        assert spatial_ok(4, 64, mesh8)          # hybrid 4 x 2
        assert not spatial_ok(8, 64, mesh8)      # batch fills the mesh
        assert not spatial_ok(3, 64, mesh8)      # 8 % 3
        assert not spatial_ok(1, 63, mesh8)      # H % rows
        assert not spatial_ok(1, 32, mesh8)      # 4 rows/shard < 8

    def test_single_device_mesh(self):
        m = Mesh(np.array(jax.devices()[:1]), ("data",))
        assert not spatial_ok(1, 64, m)


class TestSpatialSharded:
    @pytest.mark.parametrize("batch", [1, 2, 4])
    def test_matches_single_device(self, setup, mesh8, batch):
        """Sharded pixels == single-device pixels at every mesh folding
        (pure-spatial batch 1 through hybrid batch x spatial)."""
        params, frames, sf, stats = setup
        x = frames[:batch]
        ref = decode_global(params["decoder"],
                            encode_content(params, x, CFG), sf, stats, CFG)
        out = stylize_spatial_sharded(params, x, sf, stats, CFG, mesh8)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_only_collective_permutes(self, setup, mesh8):
        """The compiled module's collectives are ONLY halo exchanges:
        collective-permutes, zero all-gathers/all-reduces (params/style/
        stats replicate; the graph is H-local, so nothing should gather)."""
        params, frames, sf, stats = setup
        run, xsh, rep = _jitted(CFG, mesh8, 1)
        x = jax.device_put(frames[:1], xsh)
        p, s, st = jax.device_put((params, sf, stats), rep)
        hlo = run.lower(p, x, s, st).compile().as_text()
        assert hlo.count("collective-permute") > 0
        assert "all-reduce" not in hlo
        assert "all-gather-start" not in hlo and \
            not any(line.strip().startswith("%all-gather")
                    for line in hlo.splitlines())

    def test_tiles_dropped_under_sharding(self, setup, mesh8):
        """spatial_tiles > 1 must not dynamic-slice across shards — the
        sharded program drops the tiling and still matches pixels."""
        params, frames, sf, stats = setup
        cfg = dataclasses.replace(CFG, spatial_tiles=2)
        ref = decode_global(params["decoder"],
                            encode_content(params, frames[:1], CFG),
                            sf, stats, CFG)
        out = stylize_spatial_sharded(params, frames[:1], sf, stats, cfg,
                                      mesh8)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


class TestSessionRouting:
    """Stylization routes batch < n_devices through the spatial path."""

    @pytest.fixture(scope="class")
    def session(self, mesh8):
        import cv2

        params = init_transformer_params(jax.random.PRNGKey(0), CFG,
                                         with_loss_net=False)
        params["decoder"] = jax.tree.map(lambda a: a * 5.0,
                                         params["decoder"])
        from rerevst_tpu.api import Stylization

        rng = np.random.default_rng(0)
        frames = [rng.integers(0, 255, (64, 96, 3), np.uint8)
                  for _ in range(3)]
        s = Stylization(params=params, cfg=CFG, mesh=mesh8)
        s.prepare_style(frames[0])
        s.add(frames[1])
        s.compute()
        return s, frames

    def test_batch1_routes_spatial(self, session, mesh8):
        s, frames = session
        out = s.transfer(frames[2])
        assert s.pass2_mode == "spatial-sharded"
        s_ref = _clone_unmeshed(s)
        ref = s_ref.transfer(frames[2])
        assert s_ref.pass2_mode == "jit"
        np.testing.assert_array_equal(out, ref)

    def test_full_batch_routes_batch_sharded(self, session, mesh8):
        s, frames = session
        outs = s.transfer_batch([frames[2]] * 8)
        assert s.pass2_mode == "batch-sharded"
        s_ref = _clone_unmeshed(s)
        refs = s_ref.transfer_batch([frames[2]] * 8)
        np.testing.assert_array_equal(np.stack(outs), np.stack(refs))

    def test_hybrid_batch_routes_spatial(self, session):
        s, frames = session
        s.transfer_batch([frames[2]] * 2)
        assert s.pass2_mode == "spatial-sharded"


def _clone_unmeshed(s):
    from rerevst_tpu.api import Stylization

    c = Stylization(params=dict(s.params), cfg=s.cfg, mesh=None,
                    infer=s.infer)
    c.style, c.stats = s.style, s.stats
    c._pad_hw, c._orig_hw = s._pad_hw, getattr(s, "_orig_hw", None)
    return c


class TestMultistyleSpatial:
    """Multi-style blended decode with the feature map's H axis sharded
    (parallel/spatial.py multistyle_decode_spatial)."""

    @pytest.fixture(scope="class")
    def msession(self, mesh8):
        from rerevst_tpu.multistyle import MultiStylization

        # Stock 0.02-gain decoder (NO x5 scaling): the x5 gain compounds
        # through the filter chain on collect_stats and overflows f32 by
        # 'ada4' (~1e22 activations) — test_parallel's fixture notes.
        params = init_transformer_params(jax.random.PRNGKey(0), CFG,
                                         with_loss_net=False)
        rng = np.random.default_rng(1)
        styles = [rng.integers(0, 255, (64, 96, 3), np.uint8)
                  for _ in range(2)]
        # Synthetic alive relu4_1 features (see tests/test_parallel.py
        # fixture notes): noise frames through the random encoder leave
        # near-dead channels whose rsqrt amplifies the psum reassociation
        # of the meshed Pass 1 chaotically — here the unit under test is
        # the spatial DECODE path, so the plain session shares the meshed
        # session's stats (like _clone_unmeshed above) and the Pass-1
        # sharded==single contract stays with test_parallel.
        feats = jnp.asarray(
            np.abs(rng.standard_normal((3, 24, 32, 512))).astype(np.float32)
            * (0.5 + rng.random(512, dtype=np.float32)))
        geom = {"_pad_hw": (192, 256), "_orig_hw": (64, 96)}
        meshed = MultiStylization(params=dict(params), cfg=CFG, mesh=mesh8)
        meshed.prepare_styles(styles)
        meshed.__dict__.update(geom)
        meshed.prepare_global(feats)
        plain = MultiStylization(params=dict(params), cfg=CFG, mesh=None)
        plain.styles, plain.stats = meshed.styles, meshed.stats
        plain.__dict__.update(geom)
        return meshed, plain, feats

    def test_batch1_transfer_matches_unmeshed(self, msession):
        meshed, plain, feats = msession
        w = [0.3, 0.7]
        got = meshed.transfer(feats[:1], w)
        ref = plain.transfer(feats[:1], w)
        np.testing.assert_array_equal(got, ref)

    def test_small_batch_rows_match_unmeshed(self, msession):
        meshed, plain, feats = msession
        rows = np.array([[1.0, 0.0], [0.25, 0.75]], np.float32)
        got = meshed.transfer_batch(feats[:2], rows)
        ref = plain.transfer_batch(feats[:2], rows)
        for a, b in zip(got, ref):
            np.testing.assert_array_equal(a, b)

    def test_spatial_feats_ok_gates(self, mesh8):
        from rerevst_tpu.parallel.spatial import spatial_feats_ok

        assert spatial_feats_ok(1, 16, mesh8)
        assert not spatial_feats_ok(8, 16, mesh8)   # batch fills the mesh
        assert not spatial_feats_ok(1, 8, mesh8)    # 1 row/shard
        assert not spatial_feats_ok(1, 17, mesh8)   # not divisible
