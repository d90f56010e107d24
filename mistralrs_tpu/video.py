"""Video inputs: decode → sampled RGB frames + per-frame hashing.

The analog of the reference's `mistralrs-core/src/video_input.rs` (VideoInput:
frames + fps + sampled indices + per-frame hashes) and
`mistralrs-server-core/src/video.rs` (decode `video_url` parts; GIF decoded
natively, other containers through an external decoder). Here: GIF/animated
WebP via PIL frame extraction; mp4/webm/… via OpenCV's ``VideoCapture`` when
its codecs are present. Zero-egress: remote URLs are rejected, media rides
``data:`` URIs or local paths.
"""

from __future__ import annotations

import base64
import hashlib
import io
import os
import tempfile
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

#: default frame budget (reference samples to a model-friendly count;
#: qwen2-vl's temporal patches merge pairs of frames)
DEFAULT_NUM_FRAMES = 8


@dataclass
class VideoInput:
    """Decoded video: sampled RGB frames with provenance for timestamps.

    Mirrors `video_input.rs` VideoInput (frames / fps / total_num_frames /
    sampled_indices / frame_hashes)."""

    frames: list  # list of HWC uint8 RGB arrays (uniform shape)
    fps: float = 24.0
    total_num_frames: int = 0
    sampled_indices: list = field(default_factory=list)

    def __post_init__(self):
        if not self.sampled_indices:
            self.sampled_indices = list(range(len(self.frames)))
        if not self.total_num_frames:
            self.total_num_frames = (self.sampled_indices[-1] + 1
                                     if self.sampled_indices else 0)

    @property
    def num_frames(self) -> int:
        return len(self.frames)

    def timestamps_secs(self) -> list:
        """Per-sampled-frame timestamps in seconds (video_input.rs
        `timestamps_secs`)."""
        fps = self.fps or 24.0
        return [idx / fps for idx in self.sampled_indices]

    def frame_hashes(self) -> list:
        """Per-frame content digests — chained into the prefix-cache block
        hashes / encoder-cache key (the analog of `Sequence::video_hashes`,
        reference sequence.rs:205 + block_hash.rs media chaining)."""
        return [
            hashlib.blake2b(np.ascontiguousarray(f).tobytes(),
                            digest_size=8).hexdigest()
            for f in self.frames
        ]

    def content_hash(self) -> str:
        h = hashlib.blake2b(digest_size=8)
        for fh in self.frame_hashes():
            h.update(fh.encode())
        return h.hexdigest()

    def stacked(self) -> np.ndarray:
        """[N, H, W, C] uint8 (frames resized to the first frame's shape if
        a decoder produced ragged sizes)."""
        h, w = self.frames[0].shape[:2]
        out = []
        for f in self.frames:
            if f.shape[:2] != (h, w):
                f = _resize_uint8(f, h, w)
            out.append(np.asarray(f, np.uint8))
        return np.stack(out)


def _resize_uint8(img: np.ndarray, h: int, w: int) -> np.ndarray:
    try:
        from PIL import Image

        return np.asarray(
            Image.fromarray(img).resize((w, h), Image.BICUBIC), np.uint8
        )
    except ImportError:
        yi = (np.arange(h) * img.shape[0] // h).clip(0, img.shape[0] - 1)
        xi = (np.arange(w) * img.shape[1] // w).clip(0, img.shape[1] - 1)
        return img[yi][:, xi]


def sample_indices(total: int, num_frames: int) -> list:
    """Uniform frame sampling (video.rs `sample_frame_indices`)."""
    if total <= num_frames:
        return list(range(total))
    step = (total - 1) / (num_frames - 1) if num_frames > 1 else 0.0
    return sorted({round(i * step) for i in range(num_frames)})


def _decode_gif(raw: bytes, num_frames: int) -> VideoInput:
    from PIL import Image, ImageSequence

    img = Image.open(io.BytesIO(raw))
    frames = [
        np.asarray(f.convert("RGB"), np.uint8)
        for f in ImageSequence.Iterator(img)
    ]
    duration_ms = img.info.get("duration", 0) or 42  # ~24 fps default
    fps = 1000.0 / duration_ms
    idx = sample_indices(len(frames), num_frames)
    return VideoInput(
        frames=[frames[i] for i in idx], fps=fps,
        total_num_frames=len(frames), sampled_indices=idx,
    )


def _decode_cv2(raw: bytes, num_frames: int, suffix: str) -> VideoInput:
    import cv2

    fd, path = tempfile.mkstemp(suffix=suffix or ".mp4")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(raw)
        cap = cv2.VideoCapture(path)
        if not cap.isOpened():
            raise ValueError(
                "cannot decode video: OpenCV failed to open the container "
                "(codec missing in this build?)"
            )
        fps = cap.get(cv2.CAP_PROP_FPS) or 24.0
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) or 0
        frames_all: list = []
        idx: list = []
        if total > 0:
            want = set(sample_indices(total, num_frames))
            i = 0
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                if i in want:
                    frames_all.append(
                        cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
                    )
                    idx.append(i)
                i += 1
            total = max(total, i)
        else:  # stream without frame count: read all, then sample
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                frames_all.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            total = len(frames_all)
            idx = sample_indices(total, num_frames)
            frames_all = [frames_all[i] for i in idx]
        cap.release()
        if not frames_all:
            raise ValueError("video decoded to zero frames")
        return VideoInput(
            frames=[np.asarray(f, np.uint8) for f in frames_all], fps=fps,
            total_num_frames=total, sampled_indices=idx,
        )
    finally:
        os.unlink(path)


def decode_video_bytes(
    raw: bytes, num_frames: int = DEFAULT_NUM_FRAMES,
    mime: Optional[str] = None,
) -> VideoInput:
    """Container bytes → uniformly sampled VideoInput."""
    is_gif = raw[:6] in (b"GIF87a", b"GIF89a") or (mime or "").endswith("gif")
    if is_gif:
        return _decode_gif(raw, num_frames)
    suffix = ""
    if mime and "/" in mime:
        suffix = "." + mime.rsplit("/", 1)[1].split(";")[0]
    return _decode_cv2(raw, num_frames, suffix)


def decode_video_url(
    url: str, num_frames: int = DEFAULT_NUM_FRAMES
) -> VideoInput:
    """`data:video/...;base64,<payload>` / bare base64 / local path →
    VideoInput (video.rs `parse_video_url`; zero-egress: no remote fetch)."""
    if url.startswith(("http://", "https://")):
        raise ValueError(
            "remote video URLs are not fetched (zero-egress deployment); "
            "send videos as data: URIs"
        )
    mime = None
    if url.startswith("data:"):
        head, payload = url.split(",", 1)
        mime = head[5:].split(";", 1)[0]
        raw = base64.b64decode(payload)
    elif os.path.exists(url):
        with open(url, "rb") as f:
            raw = f.read()
    else:
        raw = base64.b64decode(url)
    return decode_video_bytes(raw, num_frames, mime=mime)
