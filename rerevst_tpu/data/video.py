"""Frame readers / video writer (host side).

Covers the reference driver's IO: glob'd frame reading
(``test/generate_real_video.py:101-157``) and the MJPG .avi writer
(``:175-186``).  cv2 is optional at import time so the compute path stays
usable in cv2-free environments.
"""

from __future__ import annotations

import glob
import os
from typing import Iterator, List

import numpy as np


def _cv2():
    import cv2

    return cv2


def list_frames(pattern: str) -> List[str]:
    files = glob.glob(pattern)
    files.sort()
    return files


def read_frame(path: str) -> np.ndarray:
    """BGR uint8 HWC, like the reference's read_img."""
    img = _cv2().imread(path)
    if img is None:
        raise FileNotFoundError(path)
    return img


def iter_frames(pattern: str) -> Iterator[np.ndarray]:
    for p in list_frames(pattern):
        yield read_frame(p)


#: Extensions treated as container video files by the drivers (the
#: reference only reads frame directories; video-file input is new here).
VIDEO_EXTS = (".avi", ".mp4", ".mov", ".mkv", ".webm", ".m4v")


def is_video_file(path: str) -> bool:
    return (os.path.splitext(path)[1].lower() in VIDEO_EXTS
            and os.path.isfile(path))


def iter_video(path: str, max_frames: int = 0) -> Iterator[np.ndarray]:
    """Stream BGR uint8 frames from a video file — one decoded frame in
    memory at a time (the container analog of the frame-glob lazy reader)."""
    cv2 = _cv2()
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video {path!r}")
    n = 0
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            yield frame
            n += 1
            if max_frames and n >= max_frames:
                break
    finally:
        cap.release()
    if n == 0:
        raise ValueError(f"no decodable frames in {path!r}")


def read_video(path: str, max_frames: int = 0) -> List[np.ndarray]:
    """Decode a video file into BGR uint8 frames (all of them by default).

    Materializes the whole clip — for long videos prefer ``iter_video`` or
    ``rerevst_tpu.data.source.VideoSource``.
    """
    return list(iter_video(path, max_frames))


def write_frame(path: str, img_bgr: np.ndarray) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    _cv2().imwrite(path, img_bgr)


class VideoWriter:
    """Incremental video writer (opens on first frame, so streaming
    pipelines write as they go instead of buffering the clip)."""

    def __init__(self, path: str, fps: int = 24, codec: str = "MJPG"):
        self.path, self.fps, self.codec = path, fps, codec
        self._writer = None

    def write(self, frame_bgr: np.ndarray) -> None:
        cv2 = _cv2()
        if self._writer is None:
            os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
            fourcc = cv2.VideoWriter_fourcc(*self.codec)
            self._writer = cv2.VideoWriter(
                self.path, fourcc, self.fps,
                (frame_bgr.shape[1], frame_bgr.shape[0]))
        self._writer.write(frame_bgr)

    def close(self) -> None:
        if self._writer is not None:
            self._writer.release()
            self._writer = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def write_video(path: str, frames_bgr, fps: int = 24,
                codec: str = "MJPG") -> None:
    """Write BGR uint8 frames to a video file (MJPG .avi @ 24fps default,
    matching ``test/generate_real_video.py:180-182``)."""
    with VideoWriter(path, fps=fps, codec=codec) as w:
        for f in frames_bgr:
            w.write(f)
