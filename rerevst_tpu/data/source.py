"""Frame sources: uniform streaming + sampled access to clip frames.

The reference driver reads frame FILES one ``cv2.imread`` at a time
(``test/generate_real_video.py:152-171``) and therefore never holds a whole
clip in memory.  A ``FrameSource`` gives every input kind that property —
an in-memory list, a glob of frame files, or a container video file:

* ``len(source)``       — frame count (needed for the reference's
  every-``interval``-th-plus-last Pass-1 sampling);
* ``iter(source)``      — ordered frames, decoded lazily (Pass 2);
* ``read_indices(ix)``  — only the sampled frames, one at a time (Pass 1).

``Stylization.stylize_video`` accepts any of these (plain sequences are
wrapped), so the pipeline is constant-memory in clip length end to end:
disk -> bounded chunk -> device -> disk.
"""

from __future__ import annotations

from typing import Iterator, Sequence, Union

import numpy as np


class FrameSource:
    """Length + ordered iteration + non-decreasing-index random access."""

    def __len__(self) -> int:
        raise NotImplementedError

    def __iter__(self) -> Iterator[np.ndarray]:
        raise NotImplementedError

    def read_indices(self, indices: Sequence[int]) -> Iterator[np.ndarray]:
        """Yield frames at `indices` (non-decreasing), one at a time.

        Default: a single sequential scan — O(1) memory for any source.
        Subclasses with cheap random access (frame files) override.
        """
        want = list(indices)
        if any(b < a for a, b in zip(want, want[1:])):
            raise ValueError("indices must be non-decreasing")
        it = iter(self)
        cur, cur_i = None, -1
        for idx in want:
            while cur_i < idx:
                cur = next(it)
                cur_i += 1
            yield cur


class ListSource(FrameSource):
    """In-memory frames (the pre-round-3 calling convention)."""

    def __init__(self, frames: Sequence[np.ndarray]):
        self._frames = frames

    def __len__(self) -> int:
        return len(self._frames)

    def __iter__(self) -> Iterator[np.ndarray]:
        return iter(self._frames)

    def read_indices(self, indices: Sequence[int]) -> Iterator[np.ndarray]:
        for i in indices:
            yield self._frames[i]


class PathsSource(FrameSource):
    """One image file per frame (the reference's input layout)."""

    def __init__(self, paths: Sequence[str]):
        self.paths = list(paths)

    def __len__(self) -> int:
        return len(self.paths)

    def __iter__(self) -> Iterator[np.ndarray]:
        from rerevst_tpu.data.video import read_frame

        for p in self.paths:
            yield read_frame(p)

    def read_indices(self, indices: Sequence[int]) -> Iterator[np.ndarray]:
        from rerevst_tpu.data.video import read_frame

        for i in indices:
            yield read_frame(self.paths[i])


class VideoSource(FrameSource):
    """Container video file, decoded lazily.

    Every access is a fresh sequential pass: cv2 frame *seeking* is
    codec-unreliable, a scan is always exact.  ``len`` uses a decode-free
    ``grab()`` count (the ``CAP_PROP_FRAME_COUNT`` header field is a hint
    and can lie for some containers).
    """

    def __init__(self, path: str):
        self.path = path
        self._n = None

    def __len__(self) -> int:
        if self._n is None:
            import cv2

            cap = cv2.VideoCapture(self.path)
            if not cap.isOpened():
                raise FileNotFoundError(f"cannot open video {self.path!r}")
            n = 0
            try:
                while cap.grab():
                    n += 1
            finally:
                cap.release()
            if n == 0:
                raise ValueError(f"no decodable frames in {self.path!r}")
            self._n = n
        return self._n

    def __iter__(self) -> Iterator[np.ndarray]:
        from rerevst_tpu.data.video import iter_video

        return iter_video(self.path)


def as_source(obj: Union[FrameSource, str, Sequence[np.ndarray]],
              ) -> FrameSource:
    """Coerce: FrameSource passthrough; str = video file or frame glob;
    anything else = in-memory sequence."""
    if isinstance(obj, FrameSource):
        return obj
    if isinstance(obj, str):
        from rerevst_tpu.data.video import is_video_file, list_frames

        if is_video_file(obj):
            return VideoSource(obj)
        paths = list_frames(obj)
        if not paths:
            raise FileNotFoundError(f"no frames match {obj!r}")
        return PathsSource(paths)
    return ListSource(obj)
