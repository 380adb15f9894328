"""Unit tests for core ops against independent torch/numpy oracles.

torch (CPU) serves as the numerical oracle for grid_sample / interpolate /
normalization semantics; these tests pin our NHWC implementations to the
exact behavior the reference relies on.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from rerevst_tpu.ops import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    box_blur,
    denormalize,
    flow_warp,
    gaussian_blur,
    grid_sample,
    mean_std,
    normalize,
    pad_reflect_multiple,
    resize_bilinear,
    rgb_to_luma_reversed,
    upsample_nearest_2x,
)
from rerevst_tpu.ops.image import padded_size, crop_back
from rerevst_tpu.ops.stats import channel_minmax, instance_moments, instance_norm


def nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2).contiguous()


def nhwc(x_nchw_t):
    return x_nchw_t.detach().numpy().transpose(0, 2, 3, 1)


class TestNormalize:
    def test_roundtrip(self, rng):
        x = rng.random((2, 8, 8, 3), dtype=np.float32)
        out = denormalize(normalize(jnp.asarray(x)))
        np.testing.assert_allclose(out, x, atol=1e-6)

    def test_matches_reference_formula(self, rng):
        x = rng.random((1, 4, 4, 3), dtype=np.float32)
        got = np.asarray(normalize(jnp.asarray(x)))
        want = (x - IMAGENET_MEAN) / IMAGENET_STD
        np.testing.assert_allclose(got, want, rtol=1e-6)


class TestRGB2Gray:
    def test_reversed_channel_quirk(self, rng):
        """gray = B*0.299 + G*0.587 + R*0.114 on the denormalized image

        (the reference applies BT.601 weights to reversed channels,
        test/style_network_global.py:487-497)."""
        img01 = rng.random((2, 6, 6, 3), dtype=np.float32)
        x = normalize(jnp.asarray(img01))
        got = np.asarray(denormalize(rgb_to_luma_reversed(x)))
        want_gray = (
            img01[..., 2] * 0.299 + img01[..., 1] * 0.587 + img01[..., 0] * 0.114
        )
        for ch in range(3):
            np.testing.assert_allclose(got[..., ch], want_gray, atol=1e-5)


class TestStats:
    def test_instance_norm_matches_torch_formula(self, rng):
        x = rng.standard_normal((3, 5, 7, 4)).astype(np.float32)
        got = np.asarray(instance_norm(jnp.asarray(x)))
        t = nchw(x)
        mean = t.mean((2, 3), keepdim=True)
        c = t - mean
        rstd = torch.rsqrt((c * c).mean((2, 3), keepdim=True) + 1e-8)
        want = nhwc(c * rstd)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_mean_std_unbiased(self, rng):
        x = rng.standard_normal((2, 5, 6, 3)).astype(np.float32)
        m, s = mean_std(jnp.asarray(x))
        t = nchw(x)
        n, c = t.shape[:2]
        tv = t.reshape(n, c, -1)
        want_std = (tv.var(dim=2) + 1e-5).sqrt().numpy()
        want_mean = tv.mean(dim=2).numpy()
        np.testing.assert_allclose(np.asarray(m)[:, 0, 0, :], want_mean, atol=1e-5)
        np.testing.assert_allclose(np.asarray(s)[:, 0, 0, :], want_std, atol=1e-5)

    def test_minmax_over_batch(self, rng):
        x = rng.standard_normal((4, 3, 3, 2)).astype(np.float32)
        mn, mx = channel_minmax(jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(mn)[0, 0, 0], x.min(axis=(0, 1, 2)), atol=0
        )
        np.testing.assert_allclose(
            np.asarray(mx)[0, 0, 0], x.max(axis=(0, 1, 2)), atol=0
        )

    def test_batch_moments_decompose_over_frames(self, rng):
        """mean/var over (N,H,W) == streaming combination of per-frame sums —
        the identity that lets Pass 1 avoid materializing the frame concat."""
        x = rng.standard_normal((6, 4, 4, 3)).astype(np.float32)
        mean_all, rstd_all = instance_moments(jnp.asarray(x), (0, 1, 2))
        cnt = 0.0
        s = np.zeros(3)
        ss = np.zeros(3)
        for f in x:
            cnt += f.shape[0] * f.shape[1]
            s += f.sum((0, 1))
            ss += (f * f).sum((0, 1))
        mean_stream = s / cnt
        var_stream = ss / cnt - mean_stream**2
        np.testing.assert_allclose(
            np.asarray(mean_all).ravel(), mean_stream, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(rstd_all).ravel(), 1 / np.sqrt(var_stream + 1e-8), rtol=1e-4
        )


class TestGridSample:
    @pytest.mark.parametrize("mode", ["bilinear", "nearest"])
    def test_matches_torch(self, rng, mode):
        x = rng.standard_normal((2, 9, 11, 3)).astype(np.float32)
        grid = (rng.random((2, 5, 6, 2), dtype=np.float32) * 2.4) - 1.2
        got = np.asarray(
            grid_sample(jnp.asarray(x), jnp.asarray(grid), mode=mode)
        )
        want = nhwc(
            TF.grid_sample(
                nchw(x), torch.from_numpy(grid), mode=mode,
                padding_mode="border", align_corners=False,
            )
        )
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_fused_corner_gather_bitwise_equals_four_gathers(self, rng):
        """The round-5 single-gather bilinear formulation loads the exact
        same elements as four clipped gathers — bit-equal, narrow or wide
        channels (wide takes the 4-gather branch; same result required)."""
        from rerevst_tpu.ops.warp import _gather_2d, _gather_corners

        for c in (3, 64):
            x = jnp.asarray(rng.standard_normal((2, 7, 9, c)).astype(np.float32))
            iy0 = jnp.asarray(rng.integers(0, 7, (2, 5, 6)).astype(np.int32))
            ix0 = jnp.asarray(rng.integers(0, 9, (2, 5, 6)).astype(np.int32))
            fused = _gather_corners(x, iy0, ix0)
            split = (
                _gather_2d(x, iy0, ix0),
                _gather_2d(x, iy0, jnp.clip(ix0 + 1, 0, 8)),
                _gather_2d(x, jnp.clip(iy0 + 1, 0, 6), ix0),
                _gather_2d(x, jnp.clip(iy0 + 1, 0, 6), jnp.clip(ix0 + 1, 0, 8)),
            )
            for f, s in zip(fused, split):
                np.testing.assert_array_equal(np.asarray(f), np.asarray(s))

    def test_grid_sample_wide_channels_matches_torch(self, rng):
        """C=64 exercises the 4-gather branch (4C > 128 lanes) vs torch."""
        x = rng.standard_normal((2, 9, 11, 64)).astype(np.float32)
        grid = (rng.random((2, 5, 6, 2), dtype=np.float32) * 2.4) - 1.2
        got = np.asarray(grid_sample(jnp.asarray(x), jnp.asarray(grid)))
        want = nhwc(
            TF.grid_sample(
                nchw(x), torch.from_numpy(grid), mode="bilinear",
                padding_mode="border", align_corners=False,
            )
        )
        np.testing.assert_allclose(got, want, atol=1e-5)

    @pytest.mark.parametrize("mode", ["bilinear", "nearest"])
    def test_flow_warp_matches_reference_formula(self, rng, mode):
        """Our flow_warp == the reference warp() (train/style_networks.py:27-44)
        re-executed with torch as oracle."""
        x = rng.standard_normal((2, 8, 10, 3)).astype(np.float32)
        flow = (rng.standard_normal((2, 8, 10, 2)) * 3).astype(np.float32)

        got = np.asarray(flow_warp(jnp.asarray(x), jnp.asarray(flow), mode=mode))

        t = nchw(x)
        flo = nchw(flow)
        B, C, H, W = t.shape
        xx = torch.arange(0, W).view(1, -1).repeat(H, 1)
        yy = torch.arange(0, H).view(-1, 1).repeat(1, W)
        xx = xx.view(1, 1, H, W).repeat(B, 1, 1, 1)
        yy = yy.view(1, 1, H, W).repeat(B, 1, 1, 1)
        grid = torch.cat((xx, yy), 1).float()
        vgrid = grid - flo
        vgrid[:, 0] = 2.0 * vgrid[:, 0] / max(W - 1, 1) - 1.0
        vgrid[:, 1] = 2.0 * vgrid[:, 1] / max(H - 1, 1) - 1.0
        want = nhwc(
            TF.grid_sample(t, vgrid.permute(0, 2, 3, 1), mode=mode,
                           padding_mode="border", align_corners=False)
        )
        np.testing.assert_allclose(got, want, atol=1e-5)

    @pytest.mark.parametrize("c", [3, 64])
    def test_flow_warp_const_src_forward_bit_equal(self, rng, c):
        """The analytic-VJP variant's forward is the same op sequence as
        flow_warp — bit-equal on both the fused (C=3) and 4-gather (C=64)
        branches."""
        from rerevst_tpu.ops.warp import flow_warp_const_src

        x = jnp.asarray(rng.standard_normal((2, 8, 10, c)).astype(np.float32))
        flow = jnp.asarray(
            (rng.standard_normal((2, 8, 10, 2)) * 3).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(flow_warp_const_src(x, flow)),
            np.asarray(flow_warp(x, flow, mode="bilinear")))

    @pytest.mark.parametrize("flow_kind", ["random", "zero"])
    def test_flow_warp_const_src_grad_matches_autodiff(self, rng, flow_kind):
        """Analytic flow-gradient == autodiff through the gather form.
        flow=0 puts EVERY border pixel at an exactly-clipped coordinate —
        the measure-zero tie where torch's clip_coordinates_set_grad zeroes
        the gradient; both forms must agree there too (the corner difference
        vanishes under border padding)."""
        import jax

        from rerevst_tpu.ops.warp import flow_warp_const_src

        x = jnp.asarray(rng.standard_normal((2, 7, 9, 3)).astype(np.float32))
        if flow_kind == "zero":
            flow = jnp.zeros((2, 7, 9, 2), jnp.float32)
        else:
            flow = jnp.asarray(
                (rng.standard_normal((2, 7, 9, 2)) * 2.5).astype(np.float32))
        cot = jnp.asarray(rng.standard_normal((2, 7, 9, 3)).astype(np.float32))

        def loss(fn, f):
            return jnp.sum(fn(x, f) * cot)

        g_auto = jax.grad(lambda f: loss(
            lambda xx, ff: flow_warp(xx, ff, mode="bilinear"), f))(flow)
        g_analytic = jax.grad(lambda f: loss(flow_warp_const_src, f))(flow)
        np.testing.assert_allclose(np.asarray(g_analytic), np.asarray(g_auto),
                                   rtol=1e-5, atol=1e-5)

    def test_flow_warp_const_src_zero_src_cotangent(self, rng):
        """By contract the source cotangent is zero (the relaxed loss
        stop-gradients the style image)."""
        import jax

        from rerevst_tpu.ops.warp import flow_warp_const_src

        x = jnp.asarray(rng.standard_normal((1, 5, 6, 3)).astype(np.float32))
        flow = jnp.asarray(
            (rng.standard_normal((1, 5, 6, 2))).astype(np.float32))
        gx = jax.grad(lambda xx: jnp.sum(flow_warp_const_src(xx, flow)))(x)
        np.testing.assert_array_equal(np.asarray(gx), 0.0)


class TestResize:
    def test_nearest_2x_matches_torch(self, rng):
        x = rng.standard_normal((2, 5, 7, 3)).astype(np.float32)
        got = np.asarray(upsample_nearest_2x(jnp.asarray(x)))
        want = nhwc(TF.interpolate(nchw(x), scale_factor=2, mode="nearest"))
        np.testing.assert_allclose(got, want, atol=0)

    @pytest.mark.parametrize("out_hw", [(32, 40), (7, 9), (16, 16)])
    def test_bilinear_matches_torch(self, rng, out_hw):
        x = rng.standard_normal((2, 16, 16, 2)).astype(np.float32)
        got = np.asarray(resize_bilinear(jnp.asarray(x), *out_hw))
        want = nhwc(
            TF.interpolate(nchw(x), size=out_hw, mode="bilinear",
                           align_corners=False)
        )
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestBlur:
    def test_gaussian_kernel_matches_kornia_formula(self):
        from rerevst_tpu.ops.blur import gaussian_kernel_1d

        k = gaussian_kernel_1d(101, 50.5)
        x = np.arange(101, dtype=np.float64) - 50
        want = np.exp(-(x * x) / (2 * 50.5**2))
        want /= want.sum()
        np.testing.assert_allclose(k, want.astype(np.float32), atol=1e-7)
        assert abs(k.sum() - 1.0) < 1e-6

    def test_gaussian_blur_matches_direct_conv(self, rng):
        from rerevst_tpu.ops.blur import gaussian_kernel_1d

        x = rng.standard_normal((1, 12, 12, 2)).astype(np.float32)
        k = gaussian_kernel_1d(7, 2.0)
        got = np.asarray(gaussian_blur(jnp.asarray(x), ksize=7, sigma=2.0))
        t = nchw(x)
        tp = TF.pad(t, (3, 3, 3, 3), mode="reflect")
        kern = torch.from_numpy(np.outer(k, k)).float()
        kern = kern.expand(2, 1, 7, 7)
        want = nhwc(TF.conv2d(tp, kern, groups=2))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_box_blur_matches_cv2(self, rng):
        cv2 = pytest.importorskip("cv2")
        x = rng.standard_normal((40, 36, 2)).astype(np.float32)
        got = np.asarray(box_blur(jnp.asarray(x[None]), ksize=10))[0]
        want = cv2.blur(x, (10, 10))
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestGeometry:
    def test_padded_size(self):
        # 436x1024 (ambush_4) -> +128 then round up to x64.
        assert padded_size(436, 1024) == (576, 1152)
        assert padded_size(512, 512) == (640, 640)

    def test_pad_matches_cv2_border_reflect(self, rng):
        cv2 = pytest.importorskip("cv2")
        img = rng.random((30, 34, 3), dtype=np.float32)
        th, tw = padded_size(30, 34, pad=8, granularity=16)
        got = np.asarray(
            pad_reflect_multiple(jnp.asarray(img[None]), pad=8, granularity=16)
        )[0]
        want = cv2.copyMakeBorder(
            img, 8, th - 8 - 30, 8, tw - 8 - 34, cv2.BORDER_REFLECT
        )
        np.testing.assert_allclose(got, want, atol=0)

    def test_crop_back_roundtrip(self, rng):
        img = rng.random((1, 30, 34, 3), dtype=np.float32)
        padded = pad_reflect_multiple(jnp.asarray(img), pad=8, granularity=16)
        out = np.asarray(crop_back(padded, 30, 34, pad=8))
        np.testing.assert_allclose(out, img, atol=0)
