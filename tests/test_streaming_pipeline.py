"""Constant-memory long-video pipeline: chunked Pass-1 encode, frame
sources, bounded Pass-2 read-ahead, streaming E_warp.

The reference streams frame files one cv2.imread at a time
(test/generate_real_video.py:152-171) but materializes the whole sampled
feature batch for the global pass (test/style_network_global.py:477-478);
its disk-spill long-sequence path is broken (test/style_network.py:550).
These tests pin the rebuild's stronger contract: memory bounded in clip
length on BOTH passes, with chunked == batched output.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rerevst_tpu.api import Stylization
from rerevst_tpu.config import InferenceConfig, ModelConfig
from rerevst_tpu.data.source import (
    FrameSource,
    ListSource,
    PathsSource,
    VideoSource,
    as_source,
)
from rerevst_tpu.models.transformer import init_transformer_params

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


class SyntheticSource(FrameSource):
    """Procedurally generated clip that counts how far ahead of the
    consumer the pipeline reads (the memory-boundedness witness)."""

    def __init__(self, n, hw=(64, 64)):
        self.n, self.hw = n, hw
        self.reads = 0          # frames produced to the Pass-2 iterator
        self.consumed = 0       # styled frames the caller has received
        self.max_ahead = 0      # peak produced-minus-consumed
        self.pass1_reads = 0

    def frame(self, i):
        rng = np.random.default_rng(1000 + i)
        return (rng.random(self.hw + (3,)) * 255).astype(np.uint8)

    def __len__(self):
        return self.n

    def __iter__(self):
        for i in range(self.n):
            self.reads += 1
            self.max_ahead = max(self.max_ahead, self.reads - self.consumed)
            yield self.frame(i)

    def read_indices(self, indices):
        for i in indices:
            self.pass1_reads += 1
            yield self.frame(i)


class TestFrameSources:
    def test_as_source_kinds(self, fixture_frames, tmp_path):
        frames, _ = fixture_frames
        assert isinstance(as_source(frames), ListSource)
        cv2 = pytest.importorskip("cv2")
        for i, f in enumerate(frames):
            cv2.imwrite(str(tmp_path / f"f{i:02d}.png"), f)
        src = as_source(str(tmp_path / "*.png"))
        assert isinstance(src, PathsSource) and len(src) == len(frames)
        for a, b in zip(src, frames):
            np.testing.assert_array_equal(a, b)

    def test_read_indices_single_scan(self, fixture_frames):
        frames, _ = fixture_frames

        class ScanOnly(FrameSource):
            def __len__(self):
                return len(frames)

            def __iter__(self):
                return iter(frames)

        got = list(ScanOnly().read_indices([0, 2, 2, 4]))
        for g, i in zip(got, (0, 2, 2, 4)):
            np.testing.assert_array_equal(g, frames[i])
        with pytest.raises(ValueError):
            list(ScanOnly().read_indices([2, 0]))

    def test_video_source_matches_read_video(self, fixture_frames, tmp_path):
        from rerevst_tpu.data.video import read_video, write_video

        frames, _ = fixture_frames
        path = str(tmp_path / "clip.avi")
        write_video(path, frames, fps=8)
        decoded = read_video(path)
        src = VideoSource(path)
        assert len(src) == len(decoded)
        for a, b in zip(src, decoded):
            np.testing.assert_array_equal(a, b)
        picked = list(src.read_indices([0, 2, len(decoded) - 1]))
        np.testing.assert_array_equal(picked[1], decoded[2])


class TestChunkedPass1:
    def test_chunked_encode_matches_one_shot(self, fixture_frames):
        """pass1_chunk-sized encode batches freeze the same statistics as
        one giant batch (the collection itself sees identical features)."""
        frames, style = fixture_frames
        params = _params()
        outs = {}
        for chunk in (2, 64):
            import dataclasses

            s = Stylization(params=params, cfg=CFG, use_global=True,
                            infer=dataclasses.replace(INFER,
                                                      pass1_chunk=chunk))
            s.prepare_style(style)
            s.prepare_global(frames)
            assert s.pass1_mode == "batched"
            outs[chunk] = (s.stats, s.transfer(frames[0]))
        for a, b in zip(jax.tree.leaves(outs[2][0]),
                        jax.tree.leaves(outs[64][0])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(outs[2][1].astype(np.int16),
                                   outs[64][1].astype(np.int16), atol=1)

    def test_spill_path_matches_batched(self, fixture_frames, monkeypatch):
        """Above STREAMING_THRESHOLD, prepare_global spills features to a
        host temp file and streams the collection; results match."""
        frames, style = fixture_frames
        params = _params()

        s = Stylization(params=params, cfg=CFG, use_global=True, infer=INFER)
        s.prepare_style(style)
        s.prepare_global(frames)
        assert s.pass1_mode == "batched"
        ref_out = s.transfer(frames[1])
        ref_stats = s.stats

        monkeypatch.setattr(Stylization, "STREAMING_THRESHOLD", 2)
        s2 = Stylization(params=params, cfg=CFG, use_global=True, infer=INFER)
        s2.prepare_style(style)
        s2.prepare_global(frames)
        assert s2.pass1_mode == "streaming-spill"
        # Stats agree up to fp reassociation (Welford-merge vs one-pass);
        # random-init activations reach ~1e27 here, so compare relatively.
        for a, b in zip(jax.tree.leaves(s2.stats), jax.tree.leaves(ref_stats)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-2)
        got = s2.transfer(frames[1])
        np.testing.assert_allclose(got.astype(np.int16),
                                   ref_out.astype(np.int16), atol=1)

    def test_sharded_spill_engages_on_mesh_session(self, fixture_frames,
                                                   monkeypatch):
        """Constant-memory and multi-chip Pass 1 compose: above the
        threshold a mesh session streams spilled chunks through SHARDED
        per-chunk reductions instead of materializing the memmap on device.
        Exact sharded-streaming == batched numerics are pinned on healthy
        synthetic features in test_parallel.py (this fixture's random-init
        activations reach 1e28, where cross-ordering comparison measures fp
        chaos — see CLAUDE.md); here we assert engagement + sane output."""
        from rerevst_tpu.parallel import frame_mesh

        frames, style = fixture_frames
        monkeypatch.setattr(Stylization, "STREAMING_THRESHOLD", 2)
        s2 = Stylization(params=_params(), cfg=CFG, use_global=True,
                         infer=INFER, mesh=frame_mesh(8))
        s2.prepare_style(style)
        s2.prepare_global(frames)
        assert s2.pass1_mode == "streaming-spill-sharded"
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree.leaves(s2.stats))
        got = s2.transfer(frames[1])
        assert got.shape == frames[1].shape and got.dtype == np.uint8

    def test_add_compute_spills_like_prepare_global(self, fixture_frames):
        """The reference-compat add()/compute() surface scales like
        prepare_global: >STREAMING_THRESHOLD added frames spill encoded
        features to the host temp file (bounded device residency) and
        compute() streams them — with stats matching the batched path.
        The reference keeps every sampled feature on the GPU until the
        concat (test/style_network_global.py:471-478)."""
        import dataclasses

        frames, style = fixture_frames
        params = _params()
        many = [frames[i % len(frames)] for i in range(70)]  # > threshold=64
        # pass1_chunk=1 makes the two pipelines bit-identical (same
        # single-frame encode batches, same streaming chunking), so the
        # oracle comparison is exact — no cross-ordering fp chaos (spill ==
        # batched numerics are pinned by test_spill_path_matches_batched).
        infer1 = dataclasses.replace(INFER, pass1_chunk=1)

        s_ref = Stylization(params=params, cfg=CFG, use_global=True,
                            infer=infer1)
        s_ref.prepare_style(style)
        s_ref.prepare_global(many)
        assert s_ref.pass1_mode == "streaming-spill"
        ref_out = s_ref.transfer(frames[1])

        s = Stylization(params=params, cfg=CFG, use_global=True, infer=infer1)
        s.prepare_style(style)
        for i, f in enumerate(many):
            s.add(f)
            if i >= s.STREAMING_THRESHOLD:
                # Device buffer drains into the spill past the threshold.
                assert s._patch_spill is not None and not s._patches
        assert s._patch_spill.n == len(many)
        s.compute()
        assert s.pass1_mode == "streaming-spill"
        assert s._patch_spill is None  # spool released
        for a, b in zip(jax.tree.leaves(s.stats),
                        jax.tree.leaves(s_ref.stats)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        got = s.transfer(frames[1])
        np.testing.assert_array_equal(got, ref_out)

    def test_add_compute_mesh_routes_through_sharded_spill(self,
                                                           fixture_frames,
                                                           monkeypatch):
        """A mesh session's compute() honors the threshold too: above it,
        spilled chunks stream through SHARDED per-chunk reductions instead
        of concatenating every patch onto the mesh (the old path OOMed a
        500-sample session that prepare_global handled in O(chunk))."""
        from rerevst_tpu.parallel import frame_mesh

        frames, style = fixture_frames
        monkeypatch.setattr(Stylization, "STREAMING_THRESHOLD", 2)
        s = Stylization(params=_params(), cfg=CFG, use_global=True,
                        infer=INFER, mesh=frame_mesh(8))
        s.prepare_style(style)
        for f in frames:
            s.add(f)
        assert s._patch_spill is not None and not s._patches
        s.compute()
        assert s.pass1_mode == "streaming-spill-sharded"
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree.leaves(s.stats))
        got = s.transfer(frames[1])
        assert got.shape == frames[1].shape and got.dtype == np.uint8

    def test_empty_input_raises_value_error(self, fixture_frames):
        """Both Pass-1 paths reject an empty frame stream with the same
        clean ValueError — including the unsized-iterator spill path, which
        used to die on the spill's unset shape instead."""
        _, style = fixture_frames
        s = Stylization(params=_params(), cfg=CFG, use_global=True,
                        infer=INFER)
        s.prepare_style(style)
        with pytest.raises(ValueError, match="no frames"):
            s.prepare_global([])            # sized -> on-device path
        with pytest.raises(ValueError, match="no frames"):
            s.prepare_global(iter([]))      # unsized -> spill path

    def test_iterator_input_without_total(self, fixture_frames):
        """An unsized generator is legal Pass-1 input (spills by default)."""
        frames, style = fixture_frames
        s = Stylization(params=_params(), cfg=CFG, use_global=True,
                        infer=INFER)
        s.prepare_style(style)
        s.prepare_global(f for f in frames)
        assert s.pass1_mode == "streaming-spill"
        out = s.transfer(frames[0])
        assert out.shape == frames[0].shape


class TestConstantMemoryPipeline:
    def test_long_clip_bounded_readahead_and_chunked_encode(self):
        """The flagship contract: a 300-frame clip streams through with
        (a) Pass-1 encode batches never exceeding pass1_chunk,
        (b) the spill (streaming) collector engaged,
        (c) Pass-2 never reading more than ~2 chunks ahead of the consumer,
        (d) every frame produced."""
        import dataclasses

        n = 300
        bs = 8
        infer = dataclasses.replace(
            INFER, pad=8, granularity=8, sample_interval=4, pass1_chunk=4,
            batch_size=bs)
        src = SyntheticSource(n)
        style = SyntheticSource(1).frame(999)[:64, :64]
        s = Stylization(params=_params(), cfg=CFG, use_global=True,
                        infer=infer)
        s.prepare_style(style)

        max_enc_batch = {"v": 0}
        orig_encode = s._encode_content

        def counting_encode(p, x):
            max_enc_batch["v"] = max(max_enc_batch["v"], x.shape[0])
            return orig_encode(p, x)

        s._encode_content = counting_encode
        count = 0
        for styled in s.stylize_video(src, batch_size=bs):
            assert styled.shape == (64, 64, 3)
            count += 1
            src.consumed = count
        assert count == n
        # (a) bounded Pass-1 device batches.
        assert max_enc_batch["v"] == infer.pass1_chunk
        # (b) 75 sampled frames > STREAMING_THRESHOLD -> spill engaged.
        assert s.pass1_mode == "streaming-spill"
        assert src.pass1_reads == (n - 1) // 4 + 1
        # (c) double-buffered Pass 2: at most ~2 chunks + a ragged margin in
        # flight, regardless of clip length.
        assert src.max_ahead <= 3 * bs, src.max_ahead

    def test_one_upload_per_chunk(self, fixture_frames):
        """stylize_video pays exactly ONE H2D transfer per chunk on both
        passes (host-side batch prep, then a single device_put).  Per-frame
        uploads measured ~10x slower through the tunnel (PERF.md)."""
        frames, style = fixture_frames
        s = Stylization(params=_params(), cfg=CFG, use_global=True,
                        infer=INFER)
        s.prepare_style(style)
        uploads = []
        orig = s._upload
        s._upload = lambda x: uploads.append(np.shape(x)) or orig(x)
        n = len(frames)  # 5 frames, sample_interval=2 -> 3 Pass-1 samples
        out = list(s.stylize_video(ListSource(frames), batch_size=2))
        assert len(out) == n
        pass1_chunks = 1          # 3 samples, pass1_chunk=8 -> one flush
        pass2_chunks = (n + 1) // 2
        assert len(uploads) == pass1_chunks + pass2_chunks, uploads
        # Every upload is a whole batch, never a single preprocessed frame
        # in a >1-frame chunk.
        assert uploads[0][0] == 3  # the Pass-1 sample batch

    def test_streamed_output_matches_per_frame_transfer(self, fixture_frames):
        """Streaming Pass 2 pixels == sequential transfer() pixels."""
        frames, style = fixture_frames
        s = Stylization(params=_params(), cfg=CFG, use_global=True,
                        infer=INFER)
        s.prepare_style(style)
        streamed = list(s.stylize_video(ListSource(frames), batch_size=2))
        assert len(streamed) == len(frames)
        per_frame = [s.transfer(f) for f in frames]
        for a, b in zip(streamed, per_frame):
            np.testing.assert_allclose(a.astype(np.int16),
                                       b.astype(np.int16), atol=1)


class TestStreamingEwarp:
    def test_accumulator_matches_batch(self, fixture_frames):
        from rerevst_tpu.eval.ewarp import EwarpAccumulator, ewarp

        frames, _ = fixture_frames
        rng = np.random.default_rng(3)
        styled = [np.clip(f.astype(np.int16)
                          + rng.integers(-20, 20, f.shape), 0, 255
                          ).astype(np.uint8) for f in frames]
        batch = ewarp(styled, frames)
        acc = EwarpAccumulator()
        for o, st in zip(frames, styled):
            acc.push(o, st)
        got = acc.result()
        assert got["pairs"] == batch["pairs"]
        np.testing.assert_allclose(got["ewarp"], batch["ewarp"], rtol=1e-6)
        np.testing.assert_allclose(got["ewarp_control"],
                                   batch["ewarp_control"], rtol=1e-6)
