"""Native C++ host runtime vs the Python reference path."""

import numpy as np
import pytest

import jax.numpy as jnp

from rerevst_tpu.data import native
from rerevst_tpu.data.transforms import bgr_to_model, model_to_bgr
from rerevst_tpu.ops.image import pad_reflect_multiple, padded_size


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("native runtime not built and no toolchain")


class TestPreprocess:
    def test_matches_python_path(self, rng):
        frame = (rng.random((37, 53, 3)) * 255).astype(np.uint8)
        th, tw = padded_size(37, 53, pad=8, granularity=16)
        got = native.preprocess(frame, th, tw, pad=8)
        want = np.asarray(pad_reflect_multiple(
            jnp.asarray(bgr_to_model(frame)), 8, 16, (th, tw)))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_batch(self, rng):
        frames = (rng.random((3, 20, 24, 3)) * 255).astype(np.uint8)
        got = native.preprocess_batch(frames, 40, 48, pad=8)
        for i in range(3):
            np.testing.assert_allclose(
                got[i], native.preprocess(frames[i], 40, 48, 8)[0], atol=0)

    def test_reflect_is_edge_inclusive(self):
        """cv2.BORDER_REFLECT duplicates the edge pixel (abc -> b a|abc|c b)."""
        frame = np.zeros((2, 3, 3), np.uint8)
        frame[0, 0] = (255, 255, 255)
        out = native.preprocess(frame, 4, 5, pad=1)
        # (0,0) of the padded image reflects source (0,0) -> white pixel.
        white = (255 / 255.0 - 0.485) / 0.229
        assert abs(out[0, 0, 0, 0] - white) < 1e-5


class TestPostprocess:
    def test_roundtrip(self, rng):
        frame = (rng.random((30, 40, 3)) * 255).astype(np.uint8)
        x = native.preprocess(frame, 48, 56, pad=4)
        back = native.postprocess(x, 30, 40, pad=4)
        # u8 -> normalize -> denormalize -> u8 loses at most 1 count.
        assert np.abs(back.astype(int) - frame.astype(int)).max() <= 1

    def test_matches_python_path(self, rng):
        x = rng.standard_normal((1, 24, 32, 3)).astype(np.float32)
        got = native.postprocess(x, 16, 24, pad=4)
        want = model_to_bgr(x[:, 4:20, 4:28, :])
        np.testing.assert_allclose(got.astype(int), want.astype(int), atol=1)
