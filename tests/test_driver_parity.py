"""Driver-protocol parity: our Stylization session vs the reference's full
inference pipeline (padding geometry + Pass-1 sampling + two-pass protocol +
output quantization), frame for frame.

This replays the exact generate_real_video.py flow (``:116-171``) on the
original network (via the oracle import) and compares byte-level outputs of
``Stylization.stylize_video`` on identical weights — the strongest
end-to-end check of the session layer's contracts.
"""

import numpy as np
import pytest
import torch

import jax

from rerevst_tpu.api import Stylization
from rerevst_tpu.config import InferenceConfig, ModelConfig
from rerevst_tpu.io.torch_compat import to_reference_state_dict
from rerevst_tpu.models.transformer import init_transformer_params

import ref_oracle

CFG = ModelConfig()


def _reference_pipeline(sd, frames_bgr, style_bgr, interval):
    """Re-enact test/generate_real_video.py:116-171 on the oracle net."""
    import cv2

    fw = ref_oracle.import_ref("framework", "test")
    net = ref_oracle.load_global_net(sd)

    def to_tensor(img):
        return fw.transform_image(fw.numpy2tensor(img))

    with torch.no_grad():
        net.generate_style_features(to_tensor(style_bgr))
        net.clean()
        n = len(frames_bgr)
        sample_sum = (n - 1) // interval
        for s in range(sample_sum):
            net.add(to_tensor(frames_bgr[s * interval]))
        net.add(to_tensor(frames_bgr[-1]))
        net.compute()

        # ReshapeTool: +128 reflect pad rounded to x64, fixed after frame 1.
        H, W = frames_bgr[0].shape[:2]
        new_h = H + 128 + (-(H + 128)) % 64
        new_w = W + 128 + (-(W + 128)) % 64
        outs = []
        for f in frames_bgr:
            padded = cv2.copyMakeBorder(f, 64, new_h - 64 - H, 64,
                                        new_w - 64 - W, cv2.BORDER_REFLECT)
            styled = net(to_tensor(padded))
            img = fw.tensor2numpy(fw.transform_back_image(styled))
            outs.append(img[64:64 + H, 64:64 + W].astype(np.uint8))
    return outs


@pytest.mark.slow
def test_full_driver_parity():
    cv2 = pytest.importorskip("cv2")
    params = init_transformer_params(jax.random.PRNGKey(7), CFG,
                                     with_loss_net=True)
    params["decoder"] = jax.tree.map(lambda a: a * 5.0, params["decoder"])

    frames = [cv2.imread(
        f"/root/reference/test/inputs/ambush_4/frame_{i:04d}.png")[:64, :96]
        for i in range(1, 8)]
    style = cv2.resize(
        cv2.imread("/root/reference/test/inputs/plum_flower.jpg"), (64, 64))

    interval = 2  # non-divisible into n-1=6? 6//2=3 samples + last
    ref_out = _reference_pipeline(to_reference_state_dict(params), frames,
                                  style, interval)

    s = Stylization(params=params, cfg=CFG, use_global=True,
                    infer=InferenceConfig(sample_interval=interval))
    s.prepare_style(style)
    ours = list(s.stylize_video(frames, batch_size=3))

    assert len(ours) == len(ref_out)
    for i, (a, b) in enumerate(zip(ours, ref_out)):
        diff = np.abs(a.astype(np.int16) - b.astype(np.int16))
        # <=1e-3/pixel in [0,1] units ~ 0.255 counts; allow 1-count rounding
        # splits plus a tiny tail from fp noise.
        assert diff.mean() < 0.5, (i, diff.mean())
        assert (diff > 2).mean() < 0.01, (i, (diff > 2).mean())
