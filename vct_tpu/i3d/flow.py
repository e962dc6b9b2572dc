"""Host-side optical flow for the I3D flow stream (round-4 VERDICT #7).

The Kinetics I3D flow stream expects per-pixel displacement fields,
truncated to [-20, 20] px and rescaled to [-1, 1] (the kinetics-i3d
preprocessing contract the ``video_features`` dependency follows). Flow is
computed AFTER the geometric transform (resize-short-256, center-crop-224)
so displacement magnitudes live in the crop's pixel space — computing flow
first and resizing the field would silently rescale the magnitudes.

Estimator provenance (documented substitution): the upstream toolchain uses
TV-L1 (or PWC-Net); this cv2 build ships neither (``cv2.optflow`` /
opencv-contrib absent), so the estimator is **Farnebäck** — same contract
(dense [H, W, 2] displacement in pixels), different smoothness prior, so
absolute flow-stream features differ from TV-L1-trained expectations. The
estimator is DATA into the tower, not architecture: drop-in replace
``estimate_flow`` when a TV-L1 build exists. The reference's own I3D arm
cannot run at all (``/root/reference/predict_video.py:32-38`` hard-imports
ExtractCLIP), so any working flow path exceeds it; parity-critical use
stays on the shipped CLIP4CLIP configs.
"""

from __future__ import annotations

import numpy as np

from vct_tpu.i3d.model import resize_center_crop

FLOW_TRUNCATE = 20.0  # kinetics-i3d: truncate flow to [-20, 20] px, /20


def estimate_flow(frames: np.ndarray) -> np.ndarray:
    """uint8 RGB [T, H, W, 3] -> float32 [T-1, H, W, 2] raw per-pixel
    displacement (Farnebäck on grayscale; see module docstring for the
    TV-L1 substitution note). Needs T >= 2."""
    import cv2

    if len(frames) < 2:
        raise ValueError("optical flow needs at least 2 frames")
    grays = [cv2.cvtColor(f, cv2.COLOR_RGB2GRAY) for f in frames]
    out = np.empty((len(frames) - 1, *grays[0].shape, 2), np.float32)
    for i in range(len(grays) - 1):
        out[i] = cv2.calcOpticalFlowFarneback(
            grays[i], grays[i + 1], None,
            0.5, 3, 15, 3, 5, 1.2, 0,
        )
    return out


def flow_from_cropped(cropped: np.ndarray) -> np.ndarray:
    """Cropped uint8 frames [T, 224, 224, 3] -> float32 scaled flow
    [max(T-1, 1), 224, 224, 2] in [-1, 1]: flow estimation, +/-20 px
    truncation, /20 rescale. Tolerates T == 1 by duplicating the frame
    (a near-zero flow field — Farneback leaves ~0.05 px numerical residue
    on identical frames) — the degenerate-video tolerance lives HERE so no
    flow consumer can forget it and crash on 1-frame videos."""
    if len(cropped) < 2:
        cropped = np.concatenate([cropped, cropped])
    flow = estimate_flow(cropped)
    return np.clip(flow, -FLOW_TRUNCATE, FLOW_TRUNCATE) / FLOW_TRUNCATE


def preprocess_i3d_flow(frames: np.ndarray) -> np.ndarray:
    """uint8 RGB [T, H, W, 3] -> float32 [max(T-1, 1), 224, 224, 2] in
    [-1, 1]: geometric transform then ``flow_from_cropped`` — ready for
    ``i3d_stacks`` (C=2) and the flow-weight ``I3DTower``."""
    return flow_from_cropped(resize_center_crop(frames))
