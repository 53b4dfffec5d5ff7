"""Depth visualization: colormaps, comparison strips, error maps, grids.

Covers both reference visualizers (`src/visualization/depth_viz.h` —
trainer-side [RGB | GT | Pred | Error] strips with per-image min/max
normalization — and `src/visualization/depth_visualizer.h` — eval-side
9-colormap rendering, error maps, histograms, batch grids). Host-side
numpy/cv2; everything returns RGB uint8 arrays.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

# 9 colormaps, parity with the eval-side enum (`depth_visualizer.h:15-25`).
COLORMAPS = ("viridis", "jet", "hot", "plasma", "inferno", "magma",
             "turbo", "rainbow", "bone")


def _cv2_colormap(name: str):
    import cv2

    table = {
        "viridis": cv2.COLORMAP_VIRIDIS,
        "jet": cv2.COLORMAP_JET,
        "hot": cv2.COLORMAP_HOT,
        "plasma": cv2.COLORMAP_PLASMA,
        "inferno": cv2.COLORMAP_INFERNO,
        "magma": cv2.COLORMAP_MAGMA,
        "turbo": cv2.COLORMAP_TURBO,
        "rainbow": cv2.COLORMAP_RAINBOW,
        "bone": cv2.COLORMAP_BONE,
    }
    if name not in table:
        raise ValueError(f"Unknown colormap '{name}'; choose from {COLORMAPS}")
    return table[name]


def apply_colormap(depth: np.ndarray, colormap: str = "viridis",
                   min_depth: Optional[float] = None,
                   max_depth: Optional[float] = None) -> np.ndarray:
    """(H, W[,1]) depth -> (H, W, 3) RGB uint8.

    Per-image min/max normalization by default (`depth_viz.h:88-107`), or
    fixed range scaling (`depth_visualizer.h:53-87`).
    """
    import cv2

    d = np.asarray(depth, np.float32)
    if d.ndim == 3:
        d = d[..., 0]
    lo = float(np.min(d)) if min_depth is None else min_depth
    hi = float(np.max(d)) if max_depth is None else max_depth
    scale = hi - lo if hi > lo else 1.0
    norm = np.clip((d - lo) / scale, 0.0, 1.0)
    u8 = (norm * 255.0).astype(np.uint8)
    bgr = cv2.applyColorMap(u8, _cv2_colormap(colormap))
    return cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)


def create_error_map(pred: np.ndarray, gt: np.ndarray,
                     max_error: float = 2.0,
                     colormap: str = "hot") -> np.ndarray:
    """|pred - gt| / max_error under a hot colormap (`depth_visualizer.h:97-121`)."""
    p = np.asarray(pred, np.float32)
    g = np.asarray(gt, np.float32)
    if p.ndim == 3:
        p = p[..., 0]
    if g.ndim == 3:
        g = g[..., 0]
    err = np.abs(p - g)
    return apply_colormap(err, colormap, min_depth=0.0, max_depth=max_error)


def _to_rgb_u8(rgb: np.ndarray) -> np.ndarray:
    arr = np.asarray(rgb)
    if arr.dtype != np.uint8:
        arr = np.clip(arr * 255.0, 0, 255).astype(np.uint8)
    return arr


def create_comparison(rgb: np.ndarray, gt: np.ndarray, pred: np.ndarray,
                      colormap: str = "viridis",
                      max_error: float = 2.0) -> np.ndarray:
    """[RGB | GT | Pred | Error] horizontal strip (`depth_viz.h:23-56`)."""
    panels = [
        _to_rgb_u8(rgb),
        apply_colormap(gt, colormap),
        apply_colormap(pred, colormap),
        create_error_map(pred, gt, max_error=max_error),
    ]
    h = min(p.shape[0] for p in panels)
    panels = [p[:h] for p in panels]
    return np.concatenate(panels, axis=1)


def create_depth_histogram(depth: np.ndarray, bins: int = 50,
                           width: int = 400, height: int = 200,
                           max_depth: float = 10.0) -> np.ndarray:
    """Depth distribution bar plot (`depth_visualizer.h:177-...`)."""
    d = np.asarray(depth, np.float32).reshape(-1)
    d = d[(d > 0) & (d <= max_depth)]
    img = np.full((height, width, 3), 255, np.uint8)
    if d.size == 0:
        return img
    counts, _ = np.histogram(d, bins=bins, range=(0, max_depth))
    peak = counts.max() if counts.max() > 0 else 1
    bar_w = max(width // bins, 1)
    for i, c in enumerate(counts):
        bar_h = int((c / peak) * (height - 10))
        if bar_h > 0:
            img[height - bar_h:, i * bar_w:(i + 1) * bar_w] = (70, 130, 180)
    return img


def create_comparison_grid(rgbs: Sequence[np.ndarray],
                           gts: Sequence[np.ndarray],
                           preds: Sequence[np.ndarray],
                           colormap: str = "viridis") -> np.ndarray:
    """Stack per-sample comparison strips vertically
    (`depth_visualizer.h:382-455`, `BatchVisualizer::createComparisonGrid`)."""
    rows = [create_comparison(r, g, p, colormap)
            for r, g, p in zip(rgbs, gts, preds)]
    w = min(r.shape[1] for r in rows)
    return np.concatenate([r[:, :w] for r in rows], axis=0)


def save_depth_image(path: str, depth: np.ndarray,
                     colormap: str = "viridis",
                     min_depth: Optional[float] = None,
                     max_depth: Optional[float] = None) -> None:
    """Write a colormapped depth PNG (`depth_viz.h:61-82`)."""
    import cv2

    rgb = apply_colormap(depth, colormap, min_depth, max_depth)
    cv2.imwrite(str(path), cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
