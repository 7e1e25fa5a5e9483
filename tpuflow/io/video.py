"""Video-container frame source (host-side IO, optional).

Decodes video files (mp4/avi/mkv — whatever the local OpenCV build's
ffmpeg supports) into the same grayscale float32 frame stream the .bin
/.mem loaders produce, so the flow and VO CLIs can consume real footage
directly. Decode is host-side IO only — the compute path stays
jax/Pallas; cv2 here plays the same harness-side role it does in the
test-pattern generator (SURVEY.md blesses cv2 for harness IO, the
reference's own generator uses it: python/generate_test_suite.py).

Import is lazy and failure is explicit: environments without OpenCV
can use every other part of the package.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np


def _cv2():
    try:
        import cv2
    except ImportError as exc:  # pragma: no cover - environment-specific
        raise ImportError(
            "video ingestion needs opencv-python (cv2); install it or "
            "extract frames to .bin/.png and use the directory loaders"
        ) from exc
    return cv2


class VideoFrameStream:
    """Iterate grayscale float32 frames from a video file.

    Mirrors ``tpuflow.io.stream.FrameStream``'s iteration contract
    (``__iter__`` over frames, ``pairs()`` over consecutive pairs) so
    the CLIs treat files and frame directories uniformly.

    ``size``: optional (width, height) to resize each frame to (area
    interpolation — decode-side conditioning, not part of the measured
    pipeline). ``max_frames`` bounds ingestion for long clips.
    """

    def __init__(
        self,
        path: str,
        size: Optional[Tuple[int, int]] = None,
        max_frames: Optional[int] = None,
    ) -> None:
        self.path = str(path)
        self.size = size
        self.max_frames = max_frames
        cv2 = _cv2()
        cap = cv2.VideoCapture(self.path)
        if not cap.isOpened():
            raise IOError(f"cannot open video: {self.path}")
        n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        # Some containers/codecs report 0 or negative counts; expose
        # None rather than garbage.
        self.frame_count = n if n > 0 else None
        fps = float(cap.get(cv2.CAP_PROP_FPS))
        self.fps = fps if fps > 0 else None
        cap.release()

    def __iter__(self) -> Iterator[np.ndarray]:
        cv2 = _cv2()
        cap = cv2.VideoCapture(self.path)
        try:
            n = 0
            while self.max_frames is None or n < self.max_frames:
                ret, frame = cap.read()
                if not ret:
                    break
                if frame.ndim == 3:
                    frame = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
                if self.size is not None:
                    frame = cv2.resize(
                        frame, self.size, interpolation=cv2.INTER_AREA
                    )
                yield frame.astype(np.float32)
                n += 1
        finally:
            cap.release()

    def pairs(self) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        prev = None
        for frame in self:
            if prev is not None:
                yield prev, frame
            prev = frame

    def read_all(self) -> list[np.ndarray]:
        return list(self)
