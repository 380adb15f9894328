"""End-to-end session API tests on the real reference fixture frames."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rerevst_tpu.api import Stylization
from rerevst_tpu.config import InferenceConfig, ModelConfig
from rerevst_tpu.io.checkpoint import (
    latest_checkpoint,
    load_params,
    restore_train_state,
    save_params,
    save_train_state,
)
from rerevst_tpu.models.transformer import init_transformer_params
from rerevst_tpu.multistyle import MultiStylization

FIXTURE = "/root/reference/test/inputs"
CFG = ModelConfig()
INFER = InferenceConfig(pad=16, granularity=32, sample_interval=2)


def _params():
    p = init_transformer_params(jax.random.PRNGKey(0), CFG,
                                with_loss_net=False)
    p["decoder"] = jax.tree.map(lambda a: a * 5.0, p["decoder"])
    return p


@pytest.fixture(scope="module")
def fixture_frames():
    cv2 = pytest.importorskip("cv2")
    frames = []
    for i in (1, 2, 3, 4, 5):
        img = cv2.imread(f"{FIXTURE}/ambush_4/frame_{i:04d}.png")
        frames.append(img[:64, :96])
    style = cv2.resize(cv2.imread(f"{FIXTURE}/plum_flower.jpg"), (64, 64))
    return frames, style


@pytest.fixture(scope="module")
def session(fixture_frames):
    frames, style = fixture_frames
    s = Stylization(params=_params(), cfg=CFG, use_global=True, infer=INFER)
    s.prepare_style(style)
    return s


class TestStylization:
    def test_reference_surface_flow(self, session, fixture_frames):
        """The exact add/compute/transfer protocol of the reference driver
        (test/generate_real_video.py:129-171)."""
        frames, _ = fixture_frames
        session.clean()
        for i in (0, 2, 4):
            session.add(frames[i])
        session.compute()
        out = session.transfer(frames[0])
        assert out.shape == frames[0].shape
        assert out.dtype == np.uint8
        assert out.std() > 1.0  # not a constant image

    def test_transfer_deterministic(self, session, fixture_frames):
        frames, _ = fixture_frames
        a = session.transfer(frames[1])
        b = session.transfer(frames[1])
        np.testing.assert_array_equal(a, b)

    def test_d2h_fetches_cropped_geometry(self, fixture_frames):
        """Every serving-path D2H moves the CROPPED content frame, never the
        padded one (round-5: the crop happens on device — at 512p the padded
        frame is 1.56x the bytes on the path PERF.md measures as the
        bottleneck).  Pins the single-fetch-per-call contract too."""
        frames, style = fixture_frames
        s = Stylization(params=_params(), cfg=CFG, use_global=True,
                        infer=INFER)
        s.prepare_style(style)
        for f in frames[::2]:
            s.add(f)
        s.compute()
        h, w = frames[0].shape[:2]
        fetches = []
        orig = s._fetch
        s._fetch = lambda x: fetches.append(np.shape(x)) or orig(x)
        out = s.transfer(frames[0])
        assert out.shape == frames[0].shape
        outs = s.transfer_batch(frames[:3], pad_to=4)
        vid = list(s.stylize_video(frames, batch_size=2))
        assert len(outs) == 3 and len(vid) == len(frames)
        # transfer: 1 fetch; transfer_batch: 1 fetch (pad rows sliced off on
        # device); stylize_video: 1 per chunk.
        assert len(fetches) == 1 + 1 + (len(frames) + 1) // 2, fetches
        for shape in fetches:
            assert shape[1:] == (h, w, 3), (shape, (h, w))
        assert fetches[1][0] == 3  # batch sliced to the real size on device

    def test_stylize_video_matches_transfer(self, fixture_frames):
        frames, style = fixture_frames
        s = Stylization(params=_params(), cfg=CFG, use_global=True,
                        infer=INFER)
        s.prepare_style(style)
        video_out = list(s.stylize_video(frames, batch_size=2))
        assert len(video_out) == len(frames)
        # Same stats are now frozen in the session; transfer must agree.
        per_frame = [s.transfer(f) for f in frames]
        for a, b in zip(video_out, per_frame):
            np.testing.assert_allclose(
                a.astype(np.int16), b.astype(np.int16), atol=1)

    def test_stylize_video_prefetch_error_propagates(self, fixture_frames):
        """A bad frame mid-clip must raise out of the pipelined generator
        (not hang the prefetch thread or yield silently truncated output)."""
        frames, style = fixture_frames
        s = Stylization(params=_params(), cfg=CFG, use_global=True,
                        infer=INFER)
        s.prepare_style(style)
        bad = list(frames)
        bad[3] = None  # breaks bgr_to_model in the prefetch worker
        with pytest.raises(Exception):
            list(s.stylize_video(bad, batch_size=2))

    def test_per_frame_mode(self, fixture_frames):
        frames, style = fixture_frames
        s = Stylization(params=_params(), cfg=CFG, use_global=False,
                        infer=INFER)
        s.prepare_style(style)
        out = s.transfer(frames[0])
        assert out.shape == frames[0].shape

    def test_global_requires_compute(self, fixture_frames):
        frames, style = fixture_frames
        s = Stylization(params=_params(), cfg=CFG, use_global=True,
                        infer=INFER)
        s.prepare_style(style)
        with pytest.raises(RuntimeError):
            s.transfer(frames[0])

    def test_mesh_session_runs_and_is_deterministic(self, fixture_frames):
        """Stylization(mesh=...) — sharded Pass 1 + Pass 2 over the virtual
        8-device mesh, end to end (wiring + determinism; numerics below)."""
        from rerevst_tpu.parallel import frame_mesh

        frames, style = fixture_frames
        params = _params()
        sharded = Stylization(params=params, cfg=CFG, use_global=True,
                              infer=INFER, mesh=frame_mesh(8))
        sharded.prepare_style(style)
        a = list(sharded.stylize_video(frames, batch_size=4))
        b = [sharded.transfer(f) for f in frames]
        assert len(a) == len(frames)
        for x, y in zip(a, b):
            assert x.shape == frames[0].shape and x.dtype == np.uint8

    def test_mesh_session_matches_single_device_pixels(self, fixture_frames):
        """End-to-end pixels -> encoder -> sharded Pass 1 + Pass 2 numerics:
        the full 8-device mesh session must render the same pixels as the
        single-device session on real frames.

        Uses the bundled *trained* checkpoint: trained weights are
        well-conditioned, so the dead-channel rsqrt-amplification objection
        to random-init comparisons (tests/test_parallel.py) does not apply.
        Both sessions run fp32; tolerance of 1 uint8 count absorbs the
        psum-vs-concat reduction reassociation in sharded Pass 1."""
        from rerevst_tpu.parallel import frame_mesh

        path = "/root/repo/models/demo_plum_4000.msgpack"
        if not os.path.exists(path):
            pytest.skip("demo checkpoint not present")
        frames, style = fixture_frames
        cfg = ModelConfig(dtype=jnp.float32)

        single = Stylization(checkpoint=path, cfg=cfg, use_global=True,
                             infer=INFER)
        single.prepare_style(style)
        ref = list(single.stylize_video(frames, batch_size=4))

        sharded = Stylization(checkpoint=path, cfg=cfg, use_global=True,
                              infer=INFER, mesh=frame_mesh(8))
        sharded.prepare_style(style)
        got = list(sharded.stylize_video(frames, batch_size=4))

        assert len(got) == len(ref)
        for x, y in zip(got, ref):
            np.testing.assert_allclose(
                x.astype(np.int16), y.astype(np.int16), atol=1)

    def test_temporal_stability_vs_per_frame(self, fixture_frames):
        """Global feature sharing must not be less stable than per-frame mode
        on consecutive real frames — the paper's core claim."""
        frames, style = fixture_frames
        params = _params()
        outs = {}
        for mode in (True, False):
            s = Stylization(params=params, cfg=CFG, use_global=mode,
                            infer=INFER)
            s.prepare_style(style)
            if mode:
                s.prepare_global([frames[0], frames[2], frames[4]])
            outs[mode] = [s.transfer(f).astype(np.float32)
                          for f in frames[:3]]
        def jitter(seq):
            return np.mean([np.abs(a - b).mean()
                            for a, b in zip(seq, seq[1:])])
        assert jitter(outs[True]) <= jitter(outs[False]) * 1.5

    def test_temporal_stability_strict_with_trained_model(self):
        """The paper's core claim as a HARD test: with the bundled trained
        checkpoint, sequence-level global feature sharing must be strictly
        MORE stable (lower E_warp) than per-frame stylization.

        Needs trained weights and non-trivial geometry — at 64x96 crops
        with 3-frame stats even the trained model inverts; at 128x256 over
        9 frames the margin is large (measured 11.45 vs 17.12, i.e. global
        is ~33% better; full-clip full-res numbers in DEMO_RESULTS.json are
        11.32 vs 13.14)."""
        import cv2

        from rerevst_tpu.eval.ewarp import ewarp

        path = "/root/repo/models/demo_plum_4000.msgpack"
        if not os.path.exists(path):
            pytest.skip("demo checkpoint not present")
        frames = [cv2.imread(f"{FIXTURE}/ambush_4/frame_{i:04d}.png"
                             )[:128, :256] for i in range(1, 10)]
        style = cv2.resize(cv2.imread(f"{FIXTURE}/plum_flower.jpg"),
                           (256, 256))
        infer = InferenceConfig(pad=16, granularity=32, sample_interval=4,
                                batch_size=4)
        ew = {}
        for mode in (True, False):
            s = Stylization(checkpoint=path, cfg=ModelConfig(),
                            use_global=mode, infer=infer)
            s.prepare_style(style)
            outs = list(s.stylize_video(frames, batch_size=4))
            ew[mode] = ewarp(outs, frames)["ewarp"]
        # Strict, with margin: global must remove >= 10% of the per-frame
        # E_warp.  Convention (used everywhere since round 5, incl. the
        # quality JSON's ewarp_improvement_pct and PERF.md):
        # improvement = (per_frame - global) / per_frame.
        assert ew[True] < 0.9 * ew[False], ew


class TestMultiStyle:
    def test_interpolation_endpoints(self, fixture_frames):
        frames, style = fixture_frames
        cv2 = pytest.importorskip("cv2")
        style2 = cv2.resize(
            cv2.imread(f"{FIXTURE}/ambush_4/frame_0010.png"), (64, 64))
        params = _params()
        ms = MultiStylization(params=params, cfg=CFG, infer=INFER)
        ms.prepare_styles([style, style2])
        feats = ms.encode_frames(frames[:3])
        ms.prepare_global(feats, interval=2)
        a = ms.transfer(feats[0:1], [1.0, 0.0])
        b = ms.transfer(feats[0:1], [0.0, 1.0])
        mid = ms.transfer(feats[0:1], [0.5, 0.5])
        assert a.shape == frames[0].shape
        # Endpoints differ (different styles); blend sits between on average.
        assert np.abs(a.astype(int) - b.astype(int)).mean() > 0.5
        assert (mid.astype(np.float32).mean()
                <= max(a.mean(), b.mean()) + 2.0)
        assert (mid.astype(np.float32).mean()
                >= min(a.mean(), b.mean()) - 2.0)

    def test_transfer_batch_matches_per_frame(self, fixture_frames):
        """Batched multi-style decode (per-sample blended stats/filters,
        one device call for the whole weight schedule) == the per-frame
        path within 1 uint8 (tensordot vs sequential-sum blend order)."""
        frames, style = fixture_frames
        cv2 = pytest.importorskip("cv2")
        style2 = cv2.resize(
            cv2.imread(f"{FIXTURE}/ambush_4/frame_0010.png"), (64, 64))
        ms = MultiStylization(params=_params(), cfg=CFG, infer=INFER)
        ms.prepare_styles([style, style2])
        feats = ms.encode_frames(frames[:3])
        ms.prepare_global(feats, interval=2)
        rows = [[1.0, 0.0], [0.4, 0.6], [0.0, 1.0]]
        want = [ms.transfer(feats[i : i + 1], rows[i]) for i in range(3)]
        got = ms.transfer_batch(feats, rows)
        assert len(got) == 3
        for i in range(3):
            d = np.abs(want[i].astype(np.int16)
                       - got[i].astype(np.int16)).max()
            assert d <= 1, f"frame {i} off by {d}"

    def test_interpolate_video_batched_matches_unbatched(self, fixture_frames):
        """interpolate_video at batch_size>1 yields the same frames as
        batch_size=1 (tail padding included: 5 frames / bs 4)."""
        frames, style = fixture_frames
        cv2 = pytest.importorskip("cv2")
        style2 = cv2.resize(
            cv2.imread(f"{FIXTURE}/ambush_4/frame_0010.png"), (64, 64))
        clip = (frames * 2)[:5]
        ms = MultiStylization(params=_params(), cfg=CFG, infer=INFER)
        ms.prepare_styles([style, style2])
        a = list(ms.interpolate_video(clip, batch_size=1))
        ms._pad_hw = None
        b = list(ms.interpolate_video(clip, batch_size=4))
        assert len(a) == len(b) == 5
        for i, (x, y) in enumerate(zip(a, b)):
            d = np.abs(x.astype(np.int16) - y.astype(np.int16)).max()
            assert d <= 1, f"frame {i} off by {d}"

    def test_transfer_batch_sharded_matches_single(self, fixture_frames):
        """Mesh-sharded batched decode == single-device batched decode,
        under IDENTICAL frozen stats (Pass-1 collection order is covered by
        test_mesh_pass1_matches_single_device; random-init stats channels
        are fp-chaotic across reduction orders — CLAUDE.md)."""
        from rerevst_tpu.parallel import frame_mesh

        frames, style = fixture_frames
        cv2 = pytest.importorskip("cv2")
        style2 = cv2.resize(
            cv2.imread(f"{FIXTURE}/ambush_4/frame_0010.png"), (64, 64))
        params = _params()
        single = MultiStylization(params=params, cfg=CFG, infer=INFER)
        single.prepare_styles([style, style2])
        feats = single.encode_frames(frames[:3])
        single.prepare_global(feats, interval=2)

        sharded = MultiStylization(params=params, cfg=CFG, infer=INFER,
                                   mesh=frame_mesh(8))
        sharded.styles = single.styles
        sharded.stats = single.stats
        sharded._pad_hw = single._pad_hw
        sharded._orig_hw = single._orig_hw

        rows = [[1.0, 0.0], [0.5, 0.5], [0.25, 0.75]]
        want = single.transfer_batch(feats, rows)
        got = sharded.transfer_batch(feats, rows)
        for i, (x, y) in enumerate(zip(want, got)):
            d = np.abs(x.astype(np.int16) - y.astype(np.int16)).max()
            assert d <= 1, f"frame {i} off by {d}"

    def test_mesh_pass1_matches_single_device(self, fixture_frames):
        """Per-style sharded Pass-1 collection (MultiStylization(mesh=...))
        == single-device, on healthy synthetic features (random-init
        activations measure fp chaos across reduction orders — CLAUDE.md)."""
        from rerevst_tpu.parallel import frame_mesh

        _, style = fixture_frames
        cv2 = pytest.importorskip("cv2")
        style2 = cv2.resize(
            cv2.imread(f"{FIXTURE}/ambush_4/frame_0010.png"), (64, 64))
        params = init_transformer_params(jax.random.PRNGKey(1), CFG,
                                         with_loss_net=False)
        rng = np.random.default_rng(3)
        feats = jnp.asarray(
            np.abs(rng.standard_normal((6, 8, 8, 512))).astype(np.float32)
            * (0.5 + rng.random(512, dtype=np.float32)))

        single = MultiStylization(params=params, cfg=CFG, infer=INFER)
        single.prepare_styles([style, style2])
        single.prepare_global(feats, interval=2)
        sharded = MultiStylization(params=params, cfg=CFG, infer=INFER,
                                   mesh=frame_mesh(8))
        sharded.prepare_styles([style, style2])
        sharded.prepare_global(feats, interval=2)
        for st_a, st_b in zip(single.stats, sharded.stats):
            for a, b in zip(jax.tree.leaves(st_a), jax.tree.leaves(st_b)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=2e-4, atol=2e-4)

    def test_disk_feature_cache(self, fixture_frames, tmp_path):
        """The reference's cache/%d.pt content-feature disk cache as a memmap
        (Multi-style Interpolation/test.py:87-98)."""
        frames, style = fixture_frames
        ms = MultiStylization(params=_params(), cfg=CFG, infer=INFER)
        ms.prepare_styles([style])
        cache = str(tmp_path / "feats.npy")
        feats = ms.encode_frames(frames[:3], cache_path=cache)
        assert isinstance(feats, np.ndarray)
        reloaded = ms.load_features(cache)
        np.testing.assert_array_equal(np.asarray(feats), np.asarray(reloaded))
        ms.prepare_global(reloaded, interval=2)
        out = ms.transfer(jnp.asarray(np.asarray(reloaded[0:1])), [1.0])
        assert out.shape == frames[0].shape

    def test_interpolate_video_runs(self, fixture_frames):
        frames, style = fixture_frames
        cv2 = pytest.importorskip("cv2")
        style2 = cv2.resize(
            cv2.imread(f"{FIXTURE}/ambush_4/frame_0015.png"), (64, 64))
        ms = MultiStylization(params=_params(), cfg=CFG, infer=INFER)
        ms.prepare_styles([style, style2])
        outs = list(ms.interpolate_video(frames[:3]))
        assert len(outs) == 3
        assert all(o.shape == frames[0].shape for o in outs)


class TestCheckpoint:
    def test_params_roundtrip(self, tmp_path):
        params = _params()
        path = str(tmp_path / "p.msgpack")
        save_params(path, params)
        back = load_params(path, like=params)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_train_state_roundtrip(self, tmp_path):
        from rerevst_tpu.config import TrainConfig
        from rerevst_tpu.train.state import init_train_state

        cfg = TrainConfig()
        params = init_transformer_params(jax.random.PRNGKey(1),
                                         CFG, with_loss_net=True)
        state = init_train_state(params, cfg)
        out = str(tmp_path)
        save_train_state(out, 42, state.params, state.opt_state)
        ck = latest_checkpoint(out)
        assert ck is not None and ck[1] == 42
        p, o = restore_train_state(ck[0], state.params, state.opt_state)
        for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_checkpoint_pruning(self, tmp_path):
        params = {"x": jnp.ones((2,))}
        out = str(tmp_path)
        for step in (1, 2, 3, 4, 5):
            save_train_state(out, step, params, (), keep=3)
        import glob

        files = glob.glob(os.path.join(out, "ckpt-step*.msgpack"))
        assert len(files) == 3
        assert latest_checkpoint(out)[1] == 5


class TestEwarp:
    def test_identical_frames_zero(self, fixture_frames):
        from rerevst_tpu.eval.ewarp import ewarp

        frames, _ = fixture_frames
        const = [frames[0]] * 3
        h, w = frames[0].shape[:2]
        zero = [np.zeros((h, w, 2), np.float32)] * 2
        r = ewarp(const, const, flows=zero)
        assert r["ewarp"] < 1e-6
        # Estimated flow on identical frames: tiny resampling noise only.
        r2 = ewarp(const, const)
        assert r2["ewarp"] < 0.5

    def test_real_clip_control_bound(self, fixture_frames):
        from rerevst_tpu.eval.ewarp import ewarp

        frames, _ = fixture_frames
        r = ewarp(frames, frames)
        # styled==original -> ewarp equals the control exactly.
        assert abs(r["ewarp"] - r["ewarp_control"]) < 1e-6
        assert r["pairs"] == len(frames) - 1


class TestBundledDemoModel:
    @pytest.mark.parametrize("dtype_name,model", [
        ("bfloat16", "demo_plum_4000"), ("float16", "demo_plum_4000"),
        ("float16", "demo_multi_4500")])
    def test_demo_checkpoint_stylizes(self, fixture_frames, dtype_name,
                                      model):
        """The committed demo checkpoints load and stylize end to end in
        both low-precision session configs (f16 = the headline parity
        config, PERF.md)."""
        import jax.numpy as jnp_

        path = f"/root/repo/models/{model}.msgpack"
        if not os.path.exists(path):
            pytest.skip("demo checkpoint not present")
        s = Stylization(checkpoint=path,
                        cfg=ModelConfig(dtype=getattr(jnp_, dtype_name)),
                        infer=INFER)
        frames, style = fixture_frames
        s.prepare_style(style)
        s.prepare_global([frames[0], frames[2], frames[4]])
        a = s.transfer(frames[0])
        b = s.transfer(frames[0])
        assert a.shape == frames[0].shape
        np.testing.assert_array_equal(a, b)
        # Trained model: output must be strongly structured, not constant.
        assert a.std() > 15
