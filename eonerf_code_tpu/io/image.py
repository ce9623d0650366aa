"""Image loading helpers (satellite RGB crops, masks, synthetic renders).

Mirrors the behavior of the reference loader (datasets/satellite.py:152-172):
values scaled to [0, 1], grayscale PNGs tiled to 3 channels, optional
antialiased bicubic downscale. The downscale uses torch's CPU
`interpolate(antialias=True)`, which is numerically identical to the
torchvision `Resize` the reference uses.
"""

import numpy as np


def _resize_bicubic(img_hwc, h, w):
    import torch
    import torch.nn.functional as F

    t = torch.from_numpy(np.ascontiguousarray(img_hwc.transpose(2, 0, 1)))[None].float()
    out = F.interpolate(t, size=(h, w), mode="bicubic", antialias=True)
    return out[0].numpy().transpose(1, 2, 0)


def load_rgb_image(img_path, downscale_factor=1):
    """Load a .tif/.png image as float (h, w, 3) in [0, 1].

    Reference: datasets/satellite.py:152-172 (`load_rgb_geotiff`).
    """
    p = str(img_path)
    if p.endswith(".tif") or p.endswith(".tiff"):
        from eonerf_code_tpu.io.geotiff import read_geotiff

        img = read_geotiff(p).transpose(1, 2, 0).astype(np.float64)
        if img.shape[2] == 1:
            img = np.tile(img, (1, 1, 3))
    elif p.endswith(".png"):
        from PIL import Image

        img = np.asarray(Image.open(p))
        if img.ndim == 2:
            img = img[:, :, None]
        img = np.tile(img[:, :, :1], (1, 1, 3)) if img.shape[2] == 1 else img[:, :, :3]
        img = img.astype(np.float64)
    else:
        raise ValueError(f"unknown image extension: {p}")

    img = img / 255.0 if img.max() > 1.1 else img
    img = np.clip(img, 0, 1)
    if downscale_factor > 1:
        h, w = img.shape[:2]
        img = _resize_bicubic(img.astype(np.float32), int(h // downscale_factor), int(w // downscale_factor))
    return np.clip(img, 0, 1).astype(np.float32)


def save_image_like(output_path, array_chw, source_path=None, crs=None, transform=None):
    """Save a (C, H, W) float array as GeoTIFF, inheriting georeferencing
    from ``source_path`` when given (reference: datasets/satellite.py:174-193)."""
    from eonerf_code_tpu.io.geotiff import GeoTiffFile, write_geotiff

    arr = np.asarray(array_chw, dtype=np.float32)
    if arr.ndim == 2:
        arr = arr[None]
    if source_path is not None:
        try:
            src = GeoTiffFile(source_path)
            crs = crs or src.crs
            transform = transform or src.transform
        except (OSError, ValueError):
            pass
    write_geotiff(output_path, arr, crs=crs, transform=transform)
