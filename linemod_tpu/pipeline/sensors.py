"""Frame sources (replaces C12 Kinect2, src/Kinect2.cpp).

The reference binds libfreenect2 at link time; here sensors are pluggable
iterables yielding (color BGR uint8 [H,W,3], depth mm uint16 [H,W]) pairs.
`FileSequenceSource` replays recorded sequences (the detector's default input,
detector.cpp:12-25); `Kinect2Source` documents the hardware interface and the
registration/crop/flip semantics of the reference, raising if no backend is
available (no USB hardware in this environment).
"""

from __future__ import annotations

import os

import numpy as np


class FrameSource:
    """Iterable of (color, depth) frames."""

    def __iter__(self):
        raise NotImplementedError


class FileSequenceSource(FrameSource):
    def __init__(self, img_template: str, depth_template: str, start: int = 0):
        self.img_template = img_template
        self.depth_template = depth_template
        self.start = start

    def __iter__(self):
        import cv2

        from ..utils.io import load_depth_linemod_dataset

        i = self.start
        while True:
            img_path = self.img_template % i
            depth_path = self.depth_template % i
            if not os.path.exists(img_path):
                return
            color = cv2.imread(img_path)
            if depth_path.endswith(".dpt"):
                depth = load_depth_linemod_dataset(depth_path)
            else:
                depth = cv2.imread(depth_path, cv2.IMREAD_ANYDEPTH)
            yield color, depth
            i += 1


class ArraySource(FrameSource):
    """In-memory frames (tests, synthetic data)."""

    def __init__(self, frames):
        self.frames = list(frames)

    def __iter__(self):
        return iter(self.frames)


class Kinect2Source(FrameSource):
    """Kinect v2 via libfreenect2 (capability parity with src/Kinect2.cpp:3-61).

    The frame math — depth->color registration, float mm -> uint16, the
    1920x1080 -> 640x480 center crop, BGRA->BGR and horizontal flip
    (src/Kinect2.cpp:41-61) — is implemented and tested in
    ops/registration.py; only the USB device entry is hardware-gated. A raw
    recording (bgra [1080,1920,4] + big-depth [1082,1920] pairs) can be
    replayed through `from_raw_frames` without any hardware."""

    def __init__(self):
        try:
            import freenect2  # noqa: F401  (no binding shipped in this image)
        except ImportError as e:
            raise RuntimeError(
                "Kinect2 live capture requires libfreenect2 python bindings and "
                "USB hardware, neither of which is available in this "
                "environment. Use Kinect2Source.from_raw_frames to replay raw "
                "recordings, or FileSequenceSource for processed sequences."
            ) from e

    @staticmethod
    def from_raw_frames(raw_pairs):
        """Replay raw (bgra, bigdepth) recordings through the reference's
        frame transform (registration assumed already applied, as
        libfreenect2's Registration::apply does on-device)."""
        from ..ops.registration import kinect_frame_transform

        return ArraySource(
            [kinect_frame_transform(bgra, big) for bgra, big in raw_pairs]
        )
