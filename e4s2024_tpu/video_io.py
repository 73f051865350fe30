"""Video IO: frame extraction and H.264 muxing with source audio.

Counterpart of reference gradio_utils/face_swapping.py:53-119 (cv2 frame
extraction + ffmpeg mux). Uses cv2 for decode and the ffmpeg binary (if
present) for encode; falls back to cv2.VideoWriter without audio.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

import cv2
import numpy as np


def extract_frames(video_path: str, max_frames: int | None = None
                   ) -> tuple[list[np.ndarray], float]:
    """Decode a video into RGB uint8 frames. Returns (frames, fps)."""
    cap = cv2.VideoCapture(video_path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
    frames = []
    while True:
        ok, bgr = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB))
        if max_frames and len(frames) >= max_frames:
            break
    cap.release()
    return frames, fps


def write_video(frames: list[np.ndarray], out_path: str, fps: float = 25.0,
                audio_from: str | None = None) -> str:
    """Encode RGB frames to H.264, muxing audio from `audio_from` when ffmpeg
    is available."""
    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        h, w = frames[0].shape[:2]
        vw = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                             (w, h))
        for f in frames:
            vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        vw.release()
        return out_path

    with tempfile.TemporaryDirectory() as td:
        for i, f in enumerate(frames):
            cv2.imwrite(os.path.join(td, f"{i:06d}.png"),
                        cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        cmd = [ffmpeg, "-y", "-framerate", str(fps),
               "-i", os.path.join(td, "%06d.png")]
        if audio_from:
            cmd += ["-i", audio_from, "-map", "0:v", "-map", "1:a?",
                    "-c:a", "aac", "-shortest"]
        cmd += ["-c:v", "libx264", "-pix_fmt", "yuv420p", out_path]
        subprocess.run(cmd, check=True, capture_output=True)
    return out_path
