"""Figure-16 ablation losses vs reference + MPI dataset with synthetic fixtures."""

import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from rerevst_tpu.losses.temporal import temporal_loss_mpi, temporal_loss_video

import ref_oracle


class TestAblationTemporalLosses:
    @pytest.fixture(scope="class")
    def ref_tl(self):
        mod = ref_oracle.import_ref("loss_networks", "train")
        return mod.TemporalLoss(data_sigma=False, data_w=True)

    def test_mpi_version_matches(self, rng, ref_tl):
        cur = rng.standard_normal((1, 32, 40, 3)).astype(np.float32)
        pre = rng.standard_normal((1, 32, 40, 3)).astype(np.float32)
        flow = (rng.standard_normal((1, 32, 40, 2)) * 3).astype(np.float32)
        mask = (rng.random((1, 32, 40, 1)) > 0.3).astype(np.float32)
        got, got_fake = temporal_loss_mpi(
            jnp.asarray(cur), jnp.asarray(pre), jnp.asarray(flow),
            jnp.asarray(mask))
        # reference mask layout is NCHW 3-channel; broadcast ours.
        mask3 = np.repeat(mask, 3, axis=-1)
        want, want_fake = ref_tl.MPI_Version(
            ref_oracle.nchw(cur), ref_oracle.nchw(pre),
            ref_oracle.nchw(flow), ref_oracle.nchw(mask3))
        assert abs(float(got) - float(want)) < 1e-6
        np.testing.assert_allclose(np.asarray(got_fake),
                                   ref_oracle.nhwc(want_fake), atol=1e-6)

    def test_video_version_matches(self, rng, ref_tl):
        cur = rng.standard_normal((1, 24, 24, 3)).astype(np.float32)
        pre = rng.standard_normal((1, 24, 24, 3)).astype(np.float32)
        flow = (rng.standard_normal((1, 24, 24, 2)) * 2).astype(np.float32)
        mask = (rng.random((1, 24, 24, 1)) > 0.2).astype(np.float32)
        got, _ = temporal_loss_video(
            jnp.asarray(cur), jnp.asarray(pre), jnp.asarray(flow),
            jnp.asarray(mask))
        mask3 = np.repeat(mask, 3, axis=-1)
        want, _ = ref_tl.Video_Version(
            ref_oracle.nchw(cur), ref_oracle.nchw(pre),
            ref_oracle.nchw(flow), ref_oracle.nchw(mask3))
        assert abs(float(got) - float(want)) < 1e-6


class TestMPIDataset:
    @pytest.fixture()
    def mpi_tree(self, tmp_path, rng):
        cv2 = pytest.importorskip("cv2")
        import scipy.io as scio

        h, w = 300, 300  # MPIDataset crops fineSize from raw frames
        clean = tmp_path / "clean" / "alley_1"
        occ = tmp_path / "occlusions" / "alley_1"
        fmat = tmp_path / "flow_mat"
        for d in (clean, occ, fmat):
            d.mkdir(parents=True)
        for i in (1, 2, 3):
            cv2.imwrite(str(clean / f"frame_{i:04d}.png"),
                        (rng.random((h, w, 3)) * 255).astype(np.uint8))
        for i in (1, 2):
            cv2.imwrite(str(occ / f"frame_{i:04d}.png"),
                        (rng.random((h, w, 3)) > 0.9).astype(np.uint8) * 255)
            scio.savemat(str(fmat / f"alley_1_frame_{i:04d}.mat"),
                         {"Img": rng.standard_normal((h, w, 2)).astype(
                             np.float64) * 2})
        styles = tmp_path / "style"
        styles.mkdir()
        cv2.imwrite(str(styles / "s0.jpg"),
                    (rng.random((64, 64, 3)) * 255).astype(np.uint8))
        return str(tmp_path), str(styles)

    def test_items(self, mpi_tree):
        from rerevst_tpu.data.datasets import MPIDataset

        mpi_path, style_path = mpi_tree
        ds = MPIDataset(load_size=288, fine_size=64, flip=True,
                        mpi_path=mpi_path, style_path=style_path, seed=0)
        assert len(ds) == 2
        item = ds[0]
        assert item["Content"].shape == (64, 64, 3)
        assert item["NextContent"].shape == (64, 64, 3)
        assert item["BackwardFlow"].shape == (64, 64, 2)
        assert item["BackwardMask"].shape[:2] == (64, 64)
        assert item["Style"].shape == (64, 64, 3)
        assert 0.0 <= item["BackwardMask"].min()
        assert item["BackwardMask"].max() <= 1.0


class TestVideoDataset:
    def test_zip_items(self, tmp_path, rng):
        cv2 = pytest.importorskip("cv2")
        import io
        import zipfile

        zpath = str(tmp_path / "video.zip")
        with zipfile.ZipFile(zpath, "w") as zf:
            for name in ("f0.png", "f1.png", "m0.png"):
                ok, buf = cv2.imencode(
                    ".png", (rng.random((100, 100, 3)) * 255).astype(np.uint8))
                zf.writestr(name, buf.tobytes())
            bio = io.BytesIO()
            np.save(bio, rng.standard_normal((100, 100, 2)).astype(np.float32))
            zf.writestr("flow0.npy", bio.getvalue())
        styles = tmp_path / "style"
        styles.mkdir()
        cv2.imwrite(str(styles / "s.jpg"),
                    (rng.random((64, 64, 3)) * 255).astype(np.uint8))

        from rerevst_tpu.data.datasets import VideoDataset

        ds = VideoDataset(load_size=96, fine_size=64, flip=True,
                          video_path=zpath, style_path=str(styles),
                          data={"frames": [("f0.png", "f1.png")],
                                "flows": ["flow0.npy"],
                                "masks": ["m0.png"]}, seed=0)
        item = ds[0]
        assert item["Content"].shape == (64, 64, 3)
        assert item["ForwardFlow"].shape == (64, 64, 2)
        assert item["ForwardMask"].shape[:2] == (64, 64)

    def test_reference_pickle_zip_ingestion(self, tmp_path, rng):
        """The reference's exact --use_video workflow: video_data.pickle
        (pre/cur/flow/mask member lists, ``train/dataset.py:59-63``), raw
        float32 flow blobs with a 32-float header (``:162-164``), inverted
        occlusion masks (``:166-168``), and a zip style archive
        (``:65-78``)."""
        cv2 = pytest.importorskip("cv2")
        import pickle
        import zipfile

        h = w = 100
        zpath = str(tmp_path / "video.zip")
        with zipfile.ZipFile(zpath, "w") as zf:
            for name in ("f0.png", "f1.png"):
                ok, buf = cv2.imencode(
                    ".png", (rng.random((h, w, 3)) * 255).astype(np.uint8))
                zf.writestr(name, buf.tobytes())
            flow = rng.standard_normal((h, w, 2)).astype(np.float32)
            blob = np.concatenate(
                [np.zeros(32, np.float32), flow.ravel()]).tobytes()
            zf.writestr("flow_mat/flow0", blob)
            # All-255 mask member: fully occluded -> validity all zero.
            ok, mbuf = cv2.imencode(
                ".png", np.full((h, w, 3), 255, np.uint8))
            zf.writestr("occlusions/m0.png", mbuf.tobytes())

        spath = str(tmp_path / "styles.zip")
        with zipfile.ZipFile(spath, "w") as zf:
            ok, sbuf = cv2.imencode(
                ".jpg", (rng.random((64, 64, 3)) * 255).astype(np.uint8))
            zf.writestr("s0.jpg", sbuf.tobytes())
            zf.writestr("notes.txt", b"ignored: not a .jpg")

        ppath = str(tmp_path / "video_data.pickle")
        with open(ppath, "wb") as f:
            pickle.dump({"pre_frame_list": ["f0.png"],
                         "cur_frame_list": ["f1.png"],
                         "flow_list": ["flow_mat/flow0"],
                         "mask_list": ["occlusions/m0.png"]}, f)

        from rerevst_tpu.data.datasets import get_loader

        loader = get_loader(1, load_size=96, fine_size=64, flip=True,
                            content_path=zpath, style_path=spath,
                            num_workers=1, use_video=True,
                            video_pickle=ppath)
        batch = next(iter(loader))
        assert batch["Content"].shape == (1, 64, 64, 3)
        assert batch["ForwardFlow"].shape == (1, 64, 64, 2)
        assert batch["Style"].shape == (1, 64, 64, 3)
        # 255-mask means occluded; validity mask must be all zeros.
        np.testing.assert_allclose(batch["ForwardMask"], 0.0)
        # Raw-f32 blob decoded: the cropped flow matches the written field
        # up to flip/crop (check value range sanity).
        assert np.isfinite(batch["ForwardFlow"]).all()
