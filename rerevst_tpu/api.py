"""Session API: stateful wrapper over the pure-functional model.

Drop-in equivalent of the reference's ``framework.Stylization``
(``test/framework.py:56-118``) — same method surface
(``prepare_style`` / ``clean`` / ``add`` / ``compute`` / ``transfer``) — plus
a batched ``stylize_video`` fast path that keeps whole frame batches on
device (the reference round-trips host<->device per frame,
``test/framework.py:106-118``).

All compute methods are jitted once per (shape, config); geometry is fixed
after the first frame exactly like the reference's ReshapeTool
(``test/generate_real_video.py:61-83``), so the hot loop never recompiles.
"""

from __future__ import annotations

from typing import Iterable, Iterator, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from rerevst_tpu.config import InferenceConfig, ModelConfig
from rerevst_tpu.data.transforms import bgr_to_model, model_to_bgr
from rerevst_tpu.io.torch_compat import load_reference_checkpoint
from rerevst_tpu.models.transformer import (
    SeqStats,
    StyleFeatures,
    TransformerNet,
    collect_stats,
    decode,
    decode_global,
    encode_content,
    encode_style,
)
from rerevst_tpu.ops.image import crop_back, pad_reflect_multiple, padded_size


class _FeatureSpill:
    """Appendable host spool for Pass-1 features: raw float32 chunks stream
    to a temp file and come back as one memmap for streaming collection —
    the working replacement for the reference's broken per-frame
    ``cache/%d.pt`` spill (``test/style_network.py:540-574``)."""

    def __init__(self):
        import tempfile

        self._f = tempfile.NamedTemporaryFile(
            prefix="rerevst_pass1_", suffix=".f32", delete=False)
        self._shape = None
        self.n = 0

    def append(self, feats: np.ndarray) -> None:
        a = np.ascontiguousarray(feats, np.float32)
        if self._shape is None:
            self._shape = a.shape[1:]
        self._f.write(a.tobytes())
        self.n += a.shape[0]

    def memmap(self) -> np.memmap:
        self._f.flush()
        return np.memmap(self._f.name, np.float32, "r",
                         shape=(self.n,) + self._shape)

    def close(self) -> None:
        import os

        try:
            self._f.close()
            os.unlink(self._f.name)
        except OSError:
            pass


class Stylization:
    """Video stylization session.

    Parameters
    ----------
    checkpoint:
        Path to a reference ``.pth`` checkpoint (converted on load) or a
        native ``.msgpack`` checkpoint, or None when `params` given.
    use_global:
        Sequence-level global feature sharing (two-pass) vs per-frame mode —
        the reference's import-time dispatch (``test/framework.py:69-72``)
        becomes a runtime flag.
    """

    def __init__(self, checkpoint: Optional[str] = None, params=None,
                 cfg: Optional[ModelConfig] = None, use_global: bool = True,
                 infer: Optional[InferenceConfig] = None, mesh=None):
        """`mesh`: optional jax.sharding.Mesh — Pass 1 reductions and Pass 2
        frame batches are sharded over its 'data' axis (multi-chip)."""
        self.cfg = cfg or ModelConfig()
        self.infer = infer or InferenceConfig(use_global=use_global)
        self.use_global = use_global
        self.mesh = mesh
        self.net = TransformerNet(self.cfg)
        if params is None:
            if checkpoint is None:
                raise ValueError("need checkpoint or params")
            if checkpoint.endswith(".pth"):
                params = load_reference_checkpoint(checkpoint)
            else:
                from rerevst_tpu.io.checkpoint import load_params

                params = load_params(checkpoint)
        # Inference never needs the loss net ("del self.Vgg19" analog,
        # test/style_network_global.py:465-469).
        params = {k: v for k, v in params.items() if k != "vgg_loss"}
        self.params = jax.device_put(params)

        self.style: Optional[StyleFeatures] = None
        self.stats: Optional[SeqStats] = None
        self._patches: List[jnp.ndarray] = []
        #: Host spool the add() buffer drains into above STREAMING_THRESHOLD
        #: (device residency stays O(1) frames however many are added).
        self._patch_spill: Optional[_FeatureSpill] = None
        self._pad_hw = None
        #: How the last Pass 1 collected its statistics:
        #: 'batched' | 'sharded' | 'streaming-spill' |
        #: 'streaming-spill-sharded'.
        self.pass1_mode: Optional[str] = None
        #: Optional AOT bundle (io/aot.py) — preferred Pass-2 path when the
        #: frame geometry/batch matches one of its exported graphs.
        self._aot = None

        cfg_ = self.cfg
        self._encode_style = jax.jit(
            lambda p, s: encode_style(p, s, cfg_))
        self._encode_content = jax.jit(
            lambda p, f: encode_content(p, f, cfg_, desaturate=True))
        self._collect = jax.jit(
            lambda p, x, sf: collect_stats(p["decoder"], x, sf, cfg_))
        self._stylize_global = jax.jit(
            lambda p, f, sf, st: decode_global(
                p["decoder"], encode_content(p, f, cfg_, True), sf, st, cfg_))
        self._stylize_frame = jax.jit(
            lambda p, f, sf: decode(
                p["decoder"], encode_content(p, f, cfg_, True), sf, cfg_))

    # ------------------------------------------------------------------
    # Geometry (ReshapeTool contract: fixed after first frame)
    # ------------------------------------------------------------------

    def _lock_geometry(self, h: int, w: int) -> None:
        """First frame fixes the padded shape for the whole clip
        (ReshapeTool contract, ``test/generate_real_video.py:66-83``)."""
        if self._pad_hw is None:
            from rerevst_tpu.ops.image import validate_pad_geometry

            validate_pad_geometry(h, w, self.infer.pad,
                                  self.infer.granularity)
            self._pad_hw = padded_size(h, w, self.infer.pad,
                                       self.infer.granularity)
            self._orig_hw = (h, w)

    def _prep(self, frame_bgr: np.ndarray) -> jnp.ndarray:
        h, w = frame_bgr.shape[:2]
        self._lock_geometry(h, w)
        from rerevst_tpu.data import native

        if native.available():
            # Fused native BGR->RGB + normalize + reflect-pad (C++ runtime).
            return self._upload(native.preprocess(
                frame_bgr, self._pad_hw[0], self._pad_hw[1], self.infer.pad))
        x = pad_reflect_multiple(bgr_to_model(frame_bgr), self.infer.pad,
                                 self.infer.granularity, self._pad_hw)
        return self._upload(x)

    def _prep_batch_host(self, frames_bgr: Sequence[np.ndarray]) -> np.ndarray:
        """Host-side prep of a same-geometry frame batch: BGR->normalized RGB
        + reflect-pad, entirely on the host — ONE array out, ready for a
        single upload.  Per-frame device_puts measured 10x slower through
        the tunnel (PERF.md serving study); every batch path funnels here.
        """
        h, w = frames_bgr[0].shape[:2]
        self._lock_geometry(h, w)
        from rerevst_tpu.data import native

        if native.available():
            return native.preprocess_batch(
                np.stack(frames_bgr), self._pad_hw[0], self._pad_hw[1],
                self.infer.pad)
        return pad_reflect_multiple(
            np.concatenate([bgr_to_model(f) for f in frames_bgr], 0),
            self.infer.pad, self.infer.granularity, self._pad_hw)

    def _upload(self, x: np.ndarray) -> jnp.ndarray:
        """The session's single H2D entry point (one call == one transfer);
        tests assert on its call count to pin the one-upload-per-chunk
        contract."""
        return jnp.asarray(x)

    # ------------------------------------------------------------------
    # Reference-compatible surface
    # ------------------------------------------------------------------

    def prepare_style(self, style_bgr: np.ndarray) -> None:
        self.style = self._encode_style(self.params,
                                        jnp.asarray(bgr_to_model(style_bgr)))

    def clean(self) -> None:
        self._patches = []
        if self._patch_spill is not None:
            self._patch_spill.close()
            self._patch_spill = None
        self.stats = None
        # Geometry re-locks on the next frame (a new clip may differ in size).
        self._pad_hw = None

    def add(self, frame_bgr: np.ndarray) -> None:
        """Pass 1: encode a sampled frame and buffer its features.

        The reference feeds add() RAW frames — no reflect padding
        (``test/generate_real_video.py:136-143`` vs the padded Pass-2 loop at
        ``:159-164``) — so the frozen statistics see only real content.
        """
        x = self._upload(bgr_to_model(frame_bgr))
        self._patches.append(self._encode_content(self.params, x))
        self._maybe_spill_patches()

    #: Above this many sampled frames, Pass 1 switches to the bounded-memory
    #: streaming collection (the batched pass materializes every decoder
    #: activation for the whole sample batch at once), and add()'s feature
    #: buffer spills to a host temp file (each encoded frame is ~13 MB of
    #: device memory at 640^2 otherwise).
    STREAMING_THRESHOLD = 64

    def _maybe_spill_patches(self) -> None:
        """Drain the add() device buffer into the host spill once the sample
        count crosses STREAMING_THRESHOLD — same composition prepare_global
        uses (`streaming-spill[-sharded]`), so a 500-sample add() session has
        the exact memory profile of a 500-sample prepare_global."""
        if self._patch_spill is None:
            if sum(p.shape[0] for p in self._patches) <= \
                    self.STREAMING_THRESHOLD:
                return
            self._patch_spill = _FeatureSpill()
        for p in self._patches:
            self._patch_spill.append(np.asarray(p, np.float32))
        self._patches = []

    def compute(self) -> None:
        """Pass 1 finish: freeze sequence statistics over buffered frames.

        Strategy: above STREAMING_THRESHOLD the features are already in the
        host spill — stream them through the bounded-memory collector, with
        per-chunk reductions sharded over the mesh when one is attached
        (`streaming-spill-sharded`, identical to prepare_global's long-clip
        path).  Small sample sets stay on device: sharded reductions on a
        mesh, one batched collect otherwise.
        """
        if self.style is None:
            raise RuntimeError("prepare_style first")
        if self._patch_spill is not None:
            from rerevst_tpu.parallel.streaming import collect_stats_streaming

            self._maybe_spill_patches()  # drain any tail still on device
            try:
                self.pass1_mode = ("streaming-spill" if self.mesh is None
                                   else "streaming-spill-sharded")
                self.stats = collect_stats_streaming(
                    self.params["decoder"], self._patch_spill.memmap(),
                    self.style, self.cfg,
                    chunk_size=max(1, self.infer.pass1_chunk), mesh=self.mesh)
            finally:
                self._patch_spill.close()
                self._patch_spill = None
            return
        feats = jnp.concatenate(self._patches, axis=0)
        if self.mesh is not None:
            from rerevst_tpu.parallel import collect_stats_sharded

            self.pass1_mode = "sharded"
            self.stats = collect_stats_sharded(
                self.params["decoder"], feats, self.style, self.cfg, self.mesh)
        else:
            self.pass1_mode = "batched"
            self.stats = self._collect(self.params, feats, self.style)
        self._patches = []

    def use_aot(self, path: str) -> None:
        """Serve Pass 2 from an AOT bundle (io/aot.py) where geometry and
        batch match; other shapes fall back to the jit path."""
        from rerevst_tpu.io.aot import load_bundle

        bundle = load_bundle(path)
        want = np.dtype(self.cfg.dtype).name
        have = bundle.meta.get("dtype")
        if have != want:
            # The exported graphs are dtype-specialized: a mismatched call
            # would fail on EVERY frame.  Reject loudly at load time.
            raise ValueError(
                f"AOT bundle {path} was exported for dtype {have!r} but the "
                f"session stores {want!r} — rebuild it with "
                f"convert --export-aot --dtype matching the serving dtype")
        self._aot = bundle
        self._aot_warned = False

    def transfer(self, frame_bgr: np.ndarray) -> np.ndarray:
        """Pass 2 (hot loop): stylize one frame, return BGR uint8."""
        x = self._prep(frame_bgr)
        h, w = frame_bgr.shape[:2]
        out = crop_back(self._stylize(x), h, w, self.infer.pad)
        return self._post(self._fetch(out))

    def transfer_batch(self, frames_bgr: Sequence[np.ndarray],
                       pad_to: int = 0) -> List[np.ndarray]:
        """Pass 2 on several same-geometry frames in ONE device round trip.

        The per-frame device cost drops sharply with batch (8.61 ms at
        batch 1 vs ~4.1 ms/frame at batch 32, PERF.md) — this is the entry
        point for request coalescing (serve.py's micro-batcher) and any
        caller holding multiple ready frames.  All host prep happens
        batched, then ONE upload, ONE stylize call, ONE fetch — per-frame
        eager ops would pay a tunnel round trip each on remote platforms.

        ``pad_to``: pad the batch up to this size by repeating the last
        PREPROCESSED row (recompile-free bucketing for the micro-batcher).
        Pad rows skip host preprocessing, and the styled batch is sliced
        back to the real size on device so they never ride the D2H path."""
        if not frames_bgr:
            return []
        n = len(frames_bgr)
        h, w = frames_bgr[0].shape[:2]
        xs = self._prep_batch_host(frames_bgr)
        if pad_to > n:
            xs = np.concatenate([xs, np.repeat(xs[-1:], pad_to - n, 0)])
        out_dev = crop_back(self._stylize(self._upload(xs))[:n],
                            h, w, self.infer.pad)
        outs = self._fetch(out_dev)
        return [self._post(outs[i : i + 1]) for i in range(n)]

    def _fetch(self, out) -> np.ndarray:
        """The session's single D2H entry point — every serving-path fetch
        funnels here so tests can pin the transferred GEOMETRY: frames are
        cropped back to content size ON DEVICE before this call (at 512p the
        padded frame is 640^2/512^2 = 1.56x the bytes; the reference fetches
        padded, ``test/generate_real_video.py:159-167``)."""
        return np.asarray(out, dtype=np.float32)

    def _post(self, out: np.ndarray) -> np.ndarray:
        """Host post-processing of an already-CROPPED fetched frame
        ([1,h,w,3] normalized RGB -> BGR uint8)."""
        from rerevst_tpu.data import native

        if native.available():
            h, w = out.shape[1:3]
            return native.postprocess(out, h, w, 0)
        return model_to_bgr(out)

    # ------------------------------------------------------------------
    # Batched fast path
    # ------------------------------------------------------------------

    def _stylize(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.use_global:
            if self.stats is None:
                raise RuntimeError("compute() first (or use_global=False)")
            if self.mesh is not None:
                from rerevst_tpu.parallel.spatial import (
                    spatial_ok,
                    stylize_spatial_sharded,
                )

                if spatial_ok(x.shape[0], x.shape[1], self.mesh):
                    # Fewer frames than chips (batch-1 latency serving
                    # included): shard the FRAME's H rows — and the batch
                    # too when 1 < B < n — so every chip works on every
                    # call (parallel/spatial.py halo-exchange sharding).
                    self.pass2_mode = "spatial-sharded"
                    return stylize_spatial_sharded(
                        self.params, x, self.style, self.stats, self.cfg,
                        self.mesh)
                if x.shape[0] > 1:
                    from rerevst_tpu.parallel import stylize_frames_sharded

                    self.pass2_mode = "batch-sharded"
                    return stylize_frames_sharded(
                        self.params, x, self.style, self.stats, self.cfg,
                        self.mesh)
            if self._aot is not None:
                try:
                    return self._aot(self.params, x, self.style, self.stats)
                except KeyError:
                    pass  # geometry/batch not in the bundle -> jit path
                except ValueError as e:
                    # jax.export rejects structure/dtype drift with
                    # ValueError (e.g. streaming-mode Pass 1 keeps filters
                    # fp32 where the bundle was exported against batched
                    # stats).  The rejection cannot change until Pass 1
                    # reruns, so DROP the bundle — re-attempting would pay
                    # a pytree-flatten + raise on every hot-loop frame —
                    # and say so; use_aot() re-arms it.
                    import sys

                    print(f"warning: AOT bundle rejected the call ({e}); "
                          f"serving via jit from now on (use_aot() to "
                          f"re-arm after the next Pass 1)", file=sys.stderr)
                    self._aot_warned = True
                    self._aot = None
            self.pass2_mode = "jit"
            return self._stylize_global(self.params, x, self.style, self.stats)
        if self.style is None:
            raise RuntimeError("prepare_style first")
        self.pass2_mode = "per-frame"
        return self._stylize_frame(self.params, x, self.style)

    def prepare_global(self, frames_bgr: Iterable[np.ndarray],
                       total: Optional[int] = None) -> None:
        """Pass 1 over pre-sampled RAW frames (no padding — see ``add``).

        Constant-memory in sample count: frames are encoded
        ``infer.pass1_chunk`` at a time; above ``STREAMING_THRESHOLD`` the
        features spill to a host temp file and the streaming collector
        freezes the statistics with O(chunk) device memory.  Any iterable
        works (a ``FrameSource.read_indices`` stream included); `total`
        is only needed to pick the fast batched path for unsized iterators.
        """
        self.clean()
        if total is None and hasattr(frames_bgr, "__len__"):
            total = len(frames_bgr)
        chunk_n = max(1, self.infer.pass1_chunk)
        # Small sample sets keep features on device and use the one-pass
        # batched (or mesh-sharded) collection; big/unknown ones spill.
        on_device = total is not None and total <= self.STREAMING_THRESHOLD
        spill = None if on_device else _FeatureSpill()
        feats_dev: List[jnp.ndarray] = []
        buf: List[np.ndarray] = []
        try:

            def flush():
                if not buf:
                    return
                # ONE host-side stack + ONE upload per chunk: Pass-1 frames
                # are raw (unpadded, see `add`), so no reflect-pad here.
                x = self._upload(
                    np.concatenate([bgr_to_model(f) for f in buf], axis=0))
                enc = self._encode_content(self.params, x)
                if on_device:
                    feats_dev.append(enc)
                else:
                    spill.append(np.asarray(enc, np.float32))
                buf.clear()

            for f in frames_bgr:
                buf.append(f)
                if len(buf) == chunk_n:
                    flush()
            flush()

            empty = not feats_dev if on_device else spill._shape is None
            if empty:
                raise ValueError("prepare_global got no frames")
            if on_device:
                feats = (feats_dev[0] if len(feats_dev) == 1
                         else jnp.concatenate(feats_dev, axis=0))
            else:
                feats = spill.memmap()
            if self.mesh is not None and on_device:
                from rerevst_tpu.parallel import collect_stats_sharded

                self.pass1_mode = "sharded"
                self.stats = collect_stats_sharded(
                    self.params["decoder"], jnp.asarray(feats), self.style,
                    self.cfg, self.mesh)
            elif on_device:
                self.pass1_mode = "batched"
                self.stats = self._collect(self.params, feats, self.style)
            else:
                # Spilled features: stream chunks through the collector —
                # with a mesh, each chunk's reductions additionally shard
                # over the devices (constant-memory AND multi-chip; the
                # all-on-device sharded path above would materialize the
                # whole memmap back onto the mesh).
                from rerevst_tpu.parallel.streaming import (
                    collect_stats_streaming,
                )

                self.pass1_mode = ("streaming-spill" if self.mesh is None
                                   else "streaming-spill-sharded")
                self.stats = collect_stats_streaming(
                    self.params["decoder"], feats, self.style, self.cfg,
                    chunk_size=chunk_n, mesh=self.mesh)
        finally:
            if spill is not None:
                spill.close()

    def stylize_video(self, frames_bgr: Union[Sequence[np.ndarray], "object"],
                      batch_size: Optional[int] = None) -> Iterator[np.ndarray]:
        """Full pipeline over a clip: Pass 1 sampling + batched Pass 2.

        `frames_bgr` is anything ``data.source.as_source`` accepts — a
        ``FrameSource``, a frame-glob / video-file path, or an in-memory
        sequence.  Memory is constant in clip length: Pass 1 reads only the
        sampled frames (one at a time), Pass 2 streams `batch_size`-frame
        chunks disk -> device -> caller, at most two chunks in flight.

        Sampling follows the reference: every `interval`-th frame plus the
        last (``test/generate_real_video.py:129-148``).
        """
        from rerevst_tpu.data.source import as_source

        src = as_source(frames_bgr)
        n = len(src)
        bs = batch_size or self.infer.batch_size
        if self.use_global:
            # Reference sampling: (n-1)//interval frames at multiples of the
            # interval, plus the last (``test/generate_real_video.py:133-143``).
            interval = self.infer.sample_interval
            sample_sum = (n - 1) // interval
            idx = [s * interval for s in range(sample_sum)] + [n - 1]
            self.prepare_global(src.read_indices(idx), total=len(idx))

        frames_it = iter(src)

        def _next_chunk():
            # Runs on the prefetch thread: frame decode, host
            # normalize/pad, and the H2D upload all overlap with the device
            # computing the previous batch (transfers through the tunnel
            # are the slow part here).  Single worker => the source
            # iterator is only ever touched from one thread.
            chunk = []
            for f in frames_it:
                chunk.append(f)
                if len(chunk) == bs:
                    break
            if not chunk:
                return None
            xs = self._prep_batch_host(chunk)
            if xs.shape[0] < bs and n > bs:
                # Keep the jitted shape stable on the ragged tail.
                reps = bs - xs.shape[0]
                xs = np.concatenate([xs, np.repeat(xs[-1:], reps, 0)], axis=0)
            # ONE upload per chunk (per-frame device_puts each paid a tunnel
            # round trip — the exact lesson transfer_batch measured).
            return self._upload(xs), len(chunk)

        def _drain(pending):
            out_dev, count = pending
            out = self._fetch(out_dev)  # blocks on D2H; device is already
            for i in range(count):      # busy with the next batch.
                yield model_to_bgr(out[i : i + 1])

        # Double-buffered pipeline: while batch k computes, the worker reads
        # and uploads batch k+1 and the main thread fetches batch k-1.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as ex:
            nxt = ex.submit(_next_chunk)
            pending = None  # (device result, frames in it)
            while True:
                got = nxt.result()
                if got is None:
                    break
                x, count = got
                nxt = ex.submit(_next_chunk)
                h, w = self._orig_hw
                out_dev = crop_back(self._stylize(x), h, w, self.infer.pad)
                if pending is not None:
                    yield from _drain(pending)
                pending = (out_dev, count)
            if pending is not None:
                yield from _drain(pending)
