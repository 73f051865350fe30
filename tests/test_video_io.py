"""video_io round-trip: rawvideo-pipe encode -> decode preserves the clip.

Counterpart of reference gradio_utils/face_swapping.py:53-119 (cv2 decode +
ffmpeg PNG-sequence mux); this build streams raw RGB through ffmpeg pipes.
"""

import os

import numpy as np
import pytest

from e4s2024_tpu.video_io import extract_frames, write_video


@pytest.mark.quick
def test_video_roundtrip(tmp_path, rng):
    h, w, n = 64, 96, 12
    # smooth gradient frames: H.264 is lossy, so content must be
    # low-frequency for a tight reconstruction bound
    base = np.linspace(0, 200, w, dtype=np.float32)[None, :, None]
    frames = [np.clip(base + 5 * i, 0, 255).astype(np.uint8)
              * np.ones((h, 1, 3), np.uint8) for i in range(n)]
    path = os.path.join(tmp_path, "clip.mp4")
    write_video(frames, path, fps=20.0)
    assert os.path.getsize(path) > 0

    back, fps = extract_frames(path)
    assert len(back) == n
    assert back[0].shape == (h, w, 3) and back[0].dtype == np.uint8
    assert abs(fps - 20.0) < 0.5
    # lossy codec: mean error small on smooth content
    err = np.mean([np.abs(a.astype(np.float32) - b.astype(np.float32)).mean()
                   for a, b in zip(frames, back)])
    assert err < 8.0, err


@pytest.mark.quick
def test_extract_max_frames(tmp_path, rng):
    frames = [(rng.random((48, 48, 3)) * 255).astype(np.uint8)
              for _ in range(10)]
    path = os.path.join(tmp_path, "clip.mp4")
    write_video(frames, path, fps=25.0)
    back, _ = extract_frames(path, max_frames=4)
    assert len(back) == 4
