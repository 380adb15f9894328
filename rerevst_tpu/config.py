"""Typed configuration for models, inference, and training.

Replaces the reference's argparse-only training config
(``train/train.py:24-90``) and edit-the-source inference constants
(``test/generate_real_video.py:20-43``) with one typed config covering both.
"""

from __future__ import annotations

import dataclasses
import jax.numpy as jnp

#: CLI dtype-name -> storage dtype (one source of truth for every driver).
DTYPES = {"bf16": jnp.bfloat16, "f16": jnp.float16, "f32": jnp.float32}


def dtype_from_name(name: str):
    """'bf16'|'f16'|'f32' -> jnp dtype (shared by all CLI surfaces)."""
    return DTYPES[name]


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture switches of the unified TransformerNet.

    Mirrors the reference flag matrix (``train/train.py:56-58`` —
    ``--dynamic_filter --both_sty_con --train_only_decoder``) plus the
    structural difference between the training/per-frame graph and the
    global-statistics inference graph (see
    ``test/style_network_global.py:366-376`` vs
    ``test/style_network_frame.py:326-341``).
    """

    #: Use the dynamic (content,style)-predicted 1x1 filter chain at relu4_1
    #: scale.  ``False`` falls back to plain AdaIN (ablation).
    dynamic_filter: bool = True
    #: ``True``: filters predicted from content AND style (KernelFilter);
    #: ``False``: style-only 3x3 filters (KernelFilter_S ablation,
    #: ``train/style_networks.py:191-249``).
    both_sty_con: bool = True
    #: Channel width of the dynamic-filter bottleneck.
    filter_channels: int = 32
    #: VGG channel width at relu4_1 (fixed by the VGG19 backbone).
    vgg_channels: int = 512
    #: Epsilon inside InstanceNorm rsqrt (``test/style_network_global.py:28``).
    norm_eps: float = 1e-8
    #: Epsilon inside style mean/std (``train/style_networks.py:95-103``).
    mean_std_eps: float = 1e-5
    #: Compute dtype for convs/matmuls.  fp32 for parity, bf16 for speed.
    dtype: jnp.dtype = jnp.float32
    #: Dtype used for normalization statistics and reductions (always fp32).
    stats_dtype: jnp.dtype = jnp.float32
    #: Matmul/conv precision override: None derives from dtype (fp32 ->
    #: HIGHEST for parity, low precision -> DEFAULT).  'high' gives fp32
    #: users a ~2x faster bf16x3 middle ground.
    precision: str = "auto"
    #: Mixed-precision region for bf16 inference: run part of the network
    #: with fp32 activation *storage* (MXU products stay single-pass bf16
    #: unless `mix_precision` says otherwise), killing that region's bf16
    #: storage roundings.  Measured on the full ambush_4 fixture vs
    #: fp32-HIGHEST (mean |Δ|/pixel, [0,1] scale): pure bf16 1.43e-3; fp32
    #: decoder ('dec') 1.30e-3; fp32 everywhere ('full'≈f32/default)
    #: 0.51e-3 — i.e. the *encoder's* storage rounding dominates, because
    #: relu4_1 content features drive every downstream stage.  Choices:
    #: 'none'; 'out' = final AdaIN + output conv; 'res2' = from the last
    #: residual block; 'dec' = whole decoder; 'enc' = whole encoder (bf16
    #: decoder); 'full' = encoder + decoder; 'body' = everything fp32
    #: *except* the bandwidth-heavy full-resolution res2+out stages (the
    #: single biggest error term is the bf16 cast of the relu4_1 content
    #: features — 'enc' and 'dec' each keep that cast and barely help;
    #: 'body' removes it while dodging most of 'full''s HBM cost).
    fp32_mix: str = "none"
    #: Conv precision inside the fp32 region.  'default' = single-pass bf16
    #: products with fp32 storage/accumulation (fast; storage is the
    #: measured-dominant error source); 'high' = bf16x3 products at 3x cost
    #: on the affected convs.
    mix_precision: str = "default"
    #: Parity-packed (space-to-depth) evaluation of the high-resolution
    #: small-channel boundary convs — encoder conv1 block (unpack absorbed
    #: by the 2x2 maxpool) and the decoder's res2+out tail (unpack absorbed
    #: by the 3-channel output image).  Numerically equal to the direct ops
    #: up to fp reassociation (tests/test_packed.py).  Kept as a documented
    #: NEGATIVE result: individually-faster packed convs lose ~20% fps once
    #: composed (the 4-conv/concat structure defeats XLA fusion) — see the
    #: measurement table in PERF.md and models/layers.py.  Off by default;
    #: reproducible via ``bench.py --packed``.
    parity_packed: bool = False
    #: Pair-lane Pallas kernels for the 640^2-class 64-channel boundary
    #: convs (encoder conv1_2, decoder res2.conv2, out conv): two adjacent W
    #: pixels fuse into the 128-lane dim so every MXU pass is fully dense in
    #: BOTH contraction and output dims.  Kept as a documented NEGATIVE
    #: result: the kernel beats XLA's ISOLATED conv 7.8 vs 13.9 ms (the
    #: repo's first Pallas win) but loses composed — in-context XLA runs
    #: these convs ~2x faster than their isolated microbenches (fusion +
    #: layout freedom a custom call forfeits), 151 vs 248 fps end-to-end.
    #: See PERF.md round-3 "pair-lane" section.  INFERENCE-ONLY (no VJP),
    #: bf16/f16 only (f16 regions run in bf16 — Mosaic has no f16); the
    #: fp32 parity path never touches it.  Off by default everywhere.
    pairlane: bool = False
    #: Fold the reversed-luma desaturation into conv1_1 (models/vgg.py:
    #: encode_luma): the desaturated encoder input is an exact rank-1
    #: (affine) image of one luma map, so conv1_1 collapses to a
    #: 1-input-channel conv plus a batch-independent border-correction map —
    #: nominally 2/3 of conv1_1's FLOPs and the full-res 3-channel gray
    #: broadcast gone, equal up to fp reassociation (tests/test_luma_fold.py).
    #: Kept as a documented NEGATIVE result (round-4 A/B on the real chip,
    #: PERF.md): 247.7 vs 252.2 fps @512p, 17.59 vs 17.70 @true-1080p,
    #: 133.1 vs 135.8 @436x1024 — the MXU pads input channels to the tile
    #: minimum, so C_in 3->1 saves no real passes, while the ones-conv
    #: border map + full-res correction add cost real HBM traffic.  Gated
    #: to the low-precision inference path (desaturate=True, dtype != fp32,
    #: fp32_mix == 'none', no packed/pairlane) so the fp32-HIGHEST parity
    #: oracle never sees it even when enabled.
    luma_fold: bool = False
    #: Evaluate the full-resolution hot regions — the encoder conv1 block
    #: and the global decoder's res2+out tail — in this many H-tiles with
    #: exact overlap-and-discard (ops/tiling.py).  >1 bounds those regions'
    #: working set at 1/N, breaking the true-1080p HBM ceiling (batch 12 at
    #: 2048x1216 f16 was a compile-time OOM from two 9.5 GB full-res temps,
    #: PERF.md round-4 matrix).  EXACT under frozen statistics — the tiled
    #: path only engages on the global inference graph (Pass 2) and the
    #: norm-free encoder; per-frame instance norms reduce over (H,W) and are
    #: never tiled.  1 = off (the default; geometries that fit shouldn't pay
    #: the tiling loop).  Ignored where inapplicable (fp32_mix regions,
    #: packed/pairlane paths, H not divisible).
    spatial_tiles: int = 1
    #: Paired-output out-conv gate override: 'auto' = the measured
    #: pixel-count gate (models/transformer.py:_use_outpairs), 'on'/'off'
    #: force it (subject to the correctness constraints: even W, low
    #: precision) — for A/B-ing the gate on new geometries
    #: (``bench.py --outpairs``).
    outpairs: str = "auto"

    def with_dtype(self, dtype) -> "ModelConfig":
        return dataclasses.replace(self, dtype=dtype)


@dataclasses.dataclass(frozen=True)
class InferenceConfig:
    """Settings of the video stylization pipeline.

    Defaults follow ``test/generate_real_video.py:20-43,129-148``.
    """

    #: Sample every `interval`-th frame (plus the last) for the global pass.
    sample_interval: int = 8
    #: Use sequence-level global feature sharing (two-pass inference).
    use_global: bool = True
    #: Reflect-pad margin and size granularity (``generate_real_video.py:66-83``).
    pad: int = 64
    granularity: int = 64
    #: Frames stylized per device step in the hot loop.
    batch_size: int = 1
    #: Output video fps (``generate_real_video.py:39``).
    fps: int = 24
    #: Pass-1 encode chunk: sampled frames are encoded this many at a time,
    #: so device memory in the global pass is bounded regardless of clip
    #: length (the reference materializes the whole sampled batch,
    #: ``test/style_network_global.py:477-478``).
    pass1_chunk: int = 8


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Loss toggles and weights (``train/train.py:60-88``)."""

    style_content_loss: bool = True
    recon_loss: bool = True
    tv_loss: bool = True
    temporal_loss: bool = True
    relax_style: bool = True
    old_style_loss: bool = False
    adversarial_loss: bool = False

    #: GAN objective (``train/other_networks.py:81-101``): 'lsgan' (the only
    #: mode the reference driver instantiates, ``train/train.py:287``),
    #: 'vanilla' (BCE-with-logits), or 'wgangp' (mean; the reference has no
    #: gradient-penalty term either).
    gan_mode: str = "lsgan"

    content_weight: float = 1.0
    style_weight: float = 20.0
    recon_weight: float = 20.0
    tv_weight: float = 10.0
    temporal_weight: float = 60.0
    gan_weight: float = 1.0
    old_weight: float = 10.0

    # Compound Regularization knobs (``train/train.py:84-88``).
    data_sigma: bool = True
    data_w: bool = True
    noise_level: float = 0.001
    motion_level: float = 8.0
    shift_level: int = 10

    # Relaxed style loss knobs (``train/style_networks.py:471-475``).
    flow_scale: int = 8
    flow_iter: int = 16
    flow_max: float = 20.0
    flow_lr: float = 16.0
    flow_momentum: float = 0.9

    #: Compute dtype for the relaxed loss's 16-iteration inner flow
    #: optimization ('same' = the model dtype; 'bf16' runs the inner VGG
    #: fwd+bwd passes in bfloat16 with the flow/momentum/loss bookkeeping
    #: kept fp32).  The inner loop only *selects* the warped style target
    #: (it is fully stop-gradient'ed, ``train/style_networks.py:612-617``);
    #: the final differentiable loss always runs at full model precision,
    #: so this changes which flow is found, never the gradient structure.
    #: See PERF.md (train roofline) for the measured speed/parity numbers.
    relaxed_inner_dtype: str = "same"

    #: Smooth the relaxed flow at 1/N resolution (1 = the reference recipe:
    #: upsample the coarse flow to FULL resolution, tanh, then two 101-tap
    #: HIGHEST-precision depthwise blurs — ``train/style_networks.py:
    #: 547-551``).  N>1 applies tanh + a 1/N-scaled Gaussian (ksize
    #: ~101/N odd, sigma 50.5/N) at 1/N resolution and bilinearly upsamples
    #: the result: ~N^3 less blur work.  APPROXIMATE (tanh and the blur
    #: don't commute with resampling exactly); a measured-quality option,
    #: not a parity config — see PERF.md round 5 for the measured speed
    #: and flow-field deltas.  Like relaxed_inner_dtype, this only changes
    #: which warped style target is SELECTED; the gradient path to the
    #: model params is untouched.
    relaxed_blur_scale: int = 1


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training-driver settings (``train/train.py:32-52``)."""

    batch_size: int = 4
    epochs: int = 2
    lr: float = 1e-4
    log_every: int = 1000
    scalar_every: int = 10
    num_workers: int = 4
    load_size: int = 512
    fine_size: int = 256
    flip: bool = True
    seed: int = 0
    content_data: str = "./data/content/"
    style_data: str = "./data/style/"
    out_dir: str = "result"
    val_dir: str = "val"
    log_dir: str = "log"
    train_only_decoder: bool = False
    #: Figure-16 ablation datasets (``train/dataset.py:531-552``): real MPI
    #: Sintel flow (content_data points at the MPI tree) or zip'd video pairs.
    use_mpi: bool = False
    use_video: bool = False
    #: Discriminator weight-init scheme (``train/other_networks.py:28-49``,
    #: init_weights): 'normal' (the reference driver's choice,
    #: ``train/train.py:277``) | 'xavier' | 'kaiming' | 'orthogonal'.
    d_init: str = "normal"
    #: Data-parallel training over this many devices (0 = single-device).
    #: With multiple processes (``--coordinator``/``--num_processes``) the
    #: mesh spans all hosts and ``batch_size`` is PER PROCESS.
    data_parallel: int = 0
    #: Rematerialize the decoder in the backward pass (jax.checkpoint) —
    #: trades ~15% FLOPs for large activation-memory savings; enables big
    #: batches / 512^2 crops on one chip.
    remat: bool = False
    #: Gradient accumulation: split each batch into this many micro-batches
    #: inside ONE jitted step (lax.scan), averaging gradients before the
    #: optimizer update — batch_size's effective memory shrinks ~accum-fold.
    #: Per-sample-mean losses give the identical full-batch gradient; the
    #: relaxed style loss selects its best inner iterate per MICRO-batch
    #: (like training at the smaller batch with averaged grads).  Each
    #: micro-batch draws its own PRNG fold for the compound-regularization
    #: fake motion.
    grad_accum: int = 1

    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
