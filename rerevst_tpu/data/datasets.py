"""Training datasets + loader (host side, numpy NHWC).

Re-designs ``train/dataset.py``:

* ``FrameDataset`` — the real training data: COCO-style content jpgs x a
  random WikiArt-style jpg per sample; resize to loadSize, random fineSize
  crop, random h/v/both flip at p=0.25 each (``train/dataset.py:420-526``).
* ``MPIDataset`` — Figure-16 ablation: MPI Sintel clean frame pairs with
  backward ``.mat`` flow and occlusion masks, composed with out-of-frame
  validity via a warp of ones (``train/dataset.py:224-415``).
* ``VideoDataset`` — ablation: frame pairs + forward flow + masks from a zip
  archive with per-open handles (``train/dataset.py:38-219``).
* ``get_loader`` — dataset selection + a thread-prefetched batch iterator
  replacing torch DataLoader (``train/dataset.py:531-552``).

Batches are dicts of float32 NHWC arrays ready for ``jnp.asarray``.
"""

from __future__ import annotations

import glob
import os
import queue
import random
import threading
import zipfile
from typing import Dict, Iterator, List, Optional

import numpy as np

from rerevst_tpu.ops.image import IMAGENET_MEAN, IMAGENET_STD


def _cv2():
    import cv2

    return cv2


def _apply_flip(img: np.ndarray, flip_rand: float):
    cv2 = _cv2()
    if flip_rand <= 0.25:
        return cv2.flip(img, 1)
    if flip_rand <= 0.5:
        return cv2.flip(img, 0)
    if flip_rand <= 0.75:
        return cv2.flip(img, -1)
    return img


def _process_img(img_bgr, fine_size: int, load_size: Optional[int],
                 x1: int, y1: int, flip_rand: Optional[float]) -> np.ndarray:
    """BGR uint8 -> normalized RGB float32 HWC with crop/flip aug
    (``train/dataset.py:442-469``)."""
    cv2 = _cv2()
    img = cv2.cvtColor(img_bgr, cv2.COLOR_BGR2RGB)
    if load_size is not None:
        img = cv2.resize(img, (load_size, load_size))
    img = img[x1 : x1 + fine_size, y1 : y1 + fine_size, :]
    if flip_rand is not None:
        img = _apply_flip(img, flip_rand)
    img = img.astype(np.float32) / 255.0
    return (img - IMAGENET_MEAN) / IMAGENET_STD


def _process_flow(flow, fine_size: int, x1: int, y1: int,
                  flip_rand: Optional[float]) -> np.ndarray:
    """Crop/flip a flow field, negating components under flips
    (``train/dataset.py:335-352``)."""
    flow = flow[x1 : x1 + fine_size, y1 : y1 + fine_size, :].copy()
    if flip_rand is not None:
        if flip_rand <= 0.25:
            flow = _apply_flip(flow, flip_rand)
            flow[:, :, 0] = -flow[:, :, 0]
        elif flip_rand <= 0.5:
            flow = _apply_flip(flow, flip_rand)
            flow[:, :, 1] = -flow[:, :, 1]
        elif flip_rand <= 0.75:
            flow = _apply_flip(flow, flip_rand)
            flow[:, :, 0] = -flow[:, :, 0]
            flow[:, :, 1] = -flow[:, :, 1]
    return flow.astype(np.float32)


def _warp_validity(shape_hw, backward_flow) -> np.ndarray:
    """Mask of pixels whose backward-warped source lands in frame
    (warp_opencv of ones, ``train/dataset.py:27-33,270``)."""
    cv2 = _cv2()
    h, w = shape_hw
    flow = -backward_flow.astype(np.float32).copy()
    flow[:, :, 0] += np.arange(w)
    flow[:, :, 1] += np.arange(h)[:, None]
    ones = np.ones((h, w, 3), np.float32)
    return cv2.remap(ones, flow, None, cv2.INTER_LINEAR)


class FrameDataset:
    """Content jpg x random style jpg (``train/dataset.py:420-526``)."""

    def __init__(self, load_size=288, fine_size=256, flip=True,
                 content_path="data/content", style_path="data/style",
                 seed: Optional[int] = None):
        self.content = sorted(glob.glob(os.path.join(content_path, "*.jpg")))
        self.styles = sorted(glob.glob(os.path.join(style_path, "*.jpg")))
        if not self.content or not self.styles:
            raise FileNotFoundError(
                f"no jpgs under {content_path!r} / {style_path!r}")
        self.load_size, self.fine_size, self.flip = load_size, fine_size, flip
        self.rng = random.Random(seed)

    def __len__(self):
        return len(self.content)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        cv2 = _cv2()
        rng = self.rng
        content = cv2.imread(self.content[index])
        style = cv2.imread(rng.choice(self.styles))

        x1 = rng.randint(0, self.load_size - self.fine_size)
        y1 = rng.randint(0, self.load_size - self.fine_size)
        fr = rng.random() if self.flip else None
        out = {"Content": _process_img(content, self.fine_size,
                                       self.load_size, x1, y1, fr)}

        h, w, _ = style.shape
        ls = max(h, w, self.load_size)
        x1 = rng.randint(0, ls - self.fine_size)
        y1 = rng.randint(0, ls - self.fine_size)
        fr = rng.random() if self.flip else None
        out["Style"] = _process_img(style, self.fine_size, ls, x1, y1, fr)
        return out


class MPIDataset:
    """MPI Sintel pairs + backward flow + occlusion masks
    (``train/dataset.py:224-415``).  Expects mpi_path/{clean,flow_mat,occlusions}."""

    def __init__(self, load_size=288, fine_size=256, flip=True,
                 mpi_path="data/MPI", style_path="data/style",
                 seed: Optional[int] = None):
        import scipy.io as scio  # noqa: F401 — fail early if missing

        self.pre, self.cur, self.flow, self.mask = [], [], [], []
        for folder in sorted(glob.glob(os.path.join(mpi_path, "clean", "*/"))):
            n = len(glob.glob(os.path.join(folder, "*.png")))
            name = os.path.basename(os.path.dirname(folder))
            for i in range(2, n + 1):
                self.pre.append(os.path.join(folder, f"frame_{i-1:04d}.png"))
                self.cur.append(os.path.join(folder, f"frame_{i:04d}.png"))
                self.flow.append(os.path.join(
                    mpi_path, "flow_mat", f"{name}_frame_{i-1:04d}.mat"))
                self.mask.append(os.path.join(
                    mpi_path, "occlusions", name, f"frame_{i-1:04d}.png"))
        self.styles = sorted(glob.glob(os.path.join(style_path, "*.jpg")))
        self.load_size, self.fine_size, self.flip = load_size, fine_size, flip
        self.rng = random.Random(seed)

    def __len__(self):
        return len(self.cur)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        import scipy.io as scio

        cv2 = _cv2()
        rng = self.rng
        pre = cv2.imread(self.pre[index])
        cur = cv2.imread(self.cur[index])
        backward_flow = -scio.loadmat(
            self.flow[index], verify_compressed_data_integrity=False)["Img"]
        mask = 1.0 - cv2.imread(self.mask[index]) / 255.0
        mask = mask * _warp_validity(pre.shape[:2], backward_flow)

        x1 = rng.randint(0, pre.shape[0] - self.fine_size)
        y1 = rng.randint(0, pre.shape[1] - self.fine_size)
        fr = rng.random() if self.flip else None
        out = {
            "Content": _process_img(pre, self.fine_size, None, x1, y1, fr),
            "NextContent": _process_img(cur, self.fine_size, None, x1, y1, fr),
            "BackwardFlow": _process_flow(backward_flow, self.fine_size,
                                          x1, y1, fr),
            "BackwardMask": _apply_flip(
                mask[x1 : x1 + self.fine_size, y1 : y1 + self.fine_size],
                fr if fr is not None else 1.0).astype(np.float32),
        }

        style = cv2.imread(rng.choice(self.styles))
        h, w, _ = style.shape
        ls = max(h, w, self.load_size)
        x1 = rng.randint(0, ls - self.fine_size)
        y1 = rng.randint(0, ls - self.fine_size)
        fr = rng.random() if self.flip else None
        out["Style"] = _process_img(style, self.fine_size, ls, x1, y1, fr)
        return out


def normalize_video_data(data: Dict) -> Dict:
    """Accept either our internal schema ({'frames': [(pre, cur)...],
    'flows', 'masks'}) or the reference's ``video_data.pickle`` schema
    ({'pre_frame_list', 'cur_frame_list', 'flow_list', 'mask_list'},
    ``train/dataset.py:59-63``)."""
    if "pre_frame_list" in data:
        return {
            "frames": list(zip(data["pre_frame_list"],
                               data["cur_frame_list"])),
            "flows": list(data["flow_list"]),
            "masks": list(data["mask_list"]),
        }
    return data


def load_video_pickle(path: str = "video_data.pickle") -> Dict:
    """The reference hardcodes this file for --use_video
    (``train/dataset.py:541-542``)."""
    import pickle

    with open(path, "rb") as f:
        return normalize_video_data(pickle.load(f))


class VideoDataset:
    """Frame pairs + forward flow + masks read from a zip archive
    (``train/dataset.py:38-219``).  `data` maps zip member names; both our
    internal schema and the reference's video_data.pickle schema are
    accepted (see ``normalize_video_data``).  `style_path` may be a
    directory of .jpg files or a ``.zip`` archive of them
    (``train/dataset.py:65-78``)."""

    def __init__(self, load_size=288, fine_size=256, flip=True,
                 video_path="data/video.zip", style_path="data/style",
                 data: Optional[Dict] = None, seed: Optional[int] = None):
        self.zip_path = video_path
        self._zip = None  # opened lazily per process/thread (dataset.py:173-174)
        self.data = normalize_video_data(
            data or {"frames": [], "flows": [], "masks": []})
        if style_path.endswith(".zip"):
            self.style_zip_path = style_path
            self._style_zip = None
            with zipfile.ZipFile(style_path) as z:
                self.styles = sorted(n for n in z.namelist()
                                     if n.endswith(".jpg"))
        else:
            self.style_zip_path = None
            self.styles = sorted(glob.glob(os.path.join(style_path, "*.jpg")))
        self.load_size, self.fine_size, self.flip = load_size, fine_size, flip
        self.rng = random.Random(seed)
        self._lock = threading.Lock()

    def _zf(self):
        if self._zip is None:
            self._zip = zipfile.ZipFile(self.zip_path)
        return self._zip

    def _read_img(self, member: str):
        cv2 = _cv2()
        with self._lock:
            buf = self._zf().read(member)
        return cv2.imdecode(np.frombuffer(buf, np.uint8), 1)

    def _read_style(self, name: str):
        cv2 = _cv2()
        if self.style_zip_path is None:
            return cv2.imread(name)
        with self._lock:
            if self._style_zip is None:
                self._style_zip = zipfile.ZipFile(self.style_zip_path)
            buf = self._style_zip.read(name)
        return cv2.imdecode(np.frombuffer(buf, np.uint8), 1)

    def _read_flow(self, member: str, h: int, w: int):
        """Reference flow members are raw float32 blobs: a 32-float header
        then H*W*2 values (``train/dataset.py:162-164``); ``.npy`` is also
        accepted as our extension."""
        cv2 = _cv2()
        with self._lock:
            buf = self._zf().read(member)
        if member.endswith(".npy"):
            return np.load(__import__("io").BytesIO(buf))
        arr = np.frombuffer(buf, np.float32)
        if arr.size == 32 + h * w * 2:
            return np.reshape(arr[32:], (h, w, 2))
        return cv2.imdecode(np.frombuffer(buf, np.uint8), -1)

    def __len__(self):
        return len(self.data["frames"])

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        cv2 = _cv2()
        rng = self.rng
        pre_name, cur_name = self.data["frames"][index]
        pre = self._read_img(pre_name)
        cur = self._read_img(cur_name)
        flow = self._read_flow(self.data["flows"][index],
                               cur.shape[0], cur.shape[1])
        # Zip masks mark occlusions with 255: validity = 1 - mask/255
        # (``train/dataset.py:166-168``).
        mask = 1.0 - self._read_img(self.data["masks"][index]) / 255.0

        x1 = rng.randint(0, pre.shape[0] - self.fine_size)
        y1 = rng.randint(0, pre.shape[1] - self.fine_size)
        fr = rng.random() if self.flip else None
        out = {
            "Content": _process_img(pre, self.fine_size, None, x1, y1, fr),
            "NextContent": _process_img(cur, self.fine_size, None, x1, y1, fr),
            "ForwardFlow": _process_flow(flow, self.fine_size, x1, y1, fr),
            "ForwardMask": _apply_flip(
                mask[x1 : x1 + self.fine_size, y1 : y1 + self.fine_size],
                fr if fr is not None else 1.0).astype(np.float32),
        }
        style = self._read_style(rng.choice(self.styles))
        h, w, _ = style.shape
        ls = max(h, w, self.load_size)
        x1 = rng.randint(0, ls - self.fine_size)
        y1 = rng.randint(0, ls - self.fine_size)
        fr = rng.random() if self.flip else None
        out["Style"] = _process_img(style, self.fine_size, ls, x1, y1, fr)
        return out


class Loader:
    """Shuffled, batched, thread-prefetched epoch iterator.

    Replaces torch DataLoader (``train/dataset.py:551``): `num_workers`
    reader threads fill a bounded queue; batches are stacked NHWC numpy.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 2, seed: int = 0, drop_last: bool = True):
        self.ds = dataset
        self.bs = batch_size
        self.shuffle = shuffle
        self.workers = max(num_workers, 1)
        self.seed = seed
        self.drop_last = drop_last
        self._epoch = 0

    def __len__(self):
        n = len(self.ds) // self.bs
        return n if self.drop_last else -(-len(self.ds) // self.bs)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        idx = list(range(len(self.ds)))
        if self.shuffle:
            random.Random(self.seed + self._epoch).shuffle(idx)
        self._epoch += 1

        batches: List[List[int]] = [
            idx[i : i + self.bs] for i in range(0, len(idx), self.bs)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.bs]

        q: "queue.Queue" = queue.Queue(maxsize=4)
        stop = object()

        def worker(my_batches):
            # Always emit the stop sentinel (exception included) — a dead
            # worker must never deadlock the consumer.
            err = None
            try:
                for b in my_batches:
                    items = [self.ds[i] for i in b]
                    out = {k: np.stack([it[k] for it in items])
                           for k in items[0]}
                    q.put(out)
            except BaseException as e:  # noqa: BLE001 — reraised below
                err = e
            q.put((stop, err))

        n_w = min(self.workers, max(len(batches), 1))
        shards = [batches[i::n_w] for i in range(n_w)]
        threads = [threading.Thread(target=worker, args=(s,), daemon=True)
                   for s in shards]
        for t in threads:
            t.start()
        done = 0
        while done < n_w:
            item = q.get()
            if isinstance(item, tuple) and len(item) == 2 and item[0] is stop:
                done += 1
                if item[1] is not None:
                    raise RuntimeError("data loader worker failed") from item[1]
            else:
                yield item


def get_loader(batch_size, load_size=288, fine_size=256, flip=True,
               content_path="./data/content/", style_path="./data/style/",
               num_workers=2, use_mpi=False, use_video=False,
               video_data: Optional[Dict] = None, seed: int = 0,
               video_pickle: str = "video_data.pickle") -> Loader:
    """Dataset factory (``train/dataset.py:531-552``)."""
    if use_mpi and use_video:
        raise ValueError("use_mpi and use_video are mutually exclusive")
    if use_mpi:
        ds = MPIDataset(load_size, fine_size, flip, content_path, style_path,
                        seed=seed)
    elif use_video:
        if video_data is None:
            # The reference loads this pickle unconditionally for
            # --use_video (``train/dataset.py:541-542``).
            video_data = load_video_pickle(video_pickle)
        ds = VideoDataset(load_size, fine_size, flip, content_path,
                          style_path, data=video_data, seed=seed)
    else:
        ds = FrameDataset(load_size, fine_size, flip, content_path,
                          style_path, seed=seed)
    return Loader(ds, batch_size, shuffle=True, num_workers=num_workers,
                  seed=seed)
