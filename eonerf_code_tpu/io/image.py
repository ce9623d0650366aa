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

    Reference: datasets/satellite.py:152-172 (`load_rgb_geotiff`), hardened
    for real-metadata quirks the reference crashes or saturates on:
    - integer rasters with values above 1 scale by their dtype range
      (uint8 -> /255, identical to the reference; uint16 WorldView crops ->
      /65535 instead of the reference's clip-to-white); binary 0/1 masks
      pass through untouched either way;
    - multispectral rasters (>3 bands) keep the first 3 bands;
    - nodata values (NaN or the file's declared nodata) map to 0.
    """
    p = str(img_path)
    nodata = None
    if p.endswith(".tif") or p.endswith(".tiff"):
        from eonerf_code_tpu.io.geotiff import GeoTiffFile

        f = GeoTiffFile(p)
        raw = f.read()
        nodata = f.nodata
        img = raw.transpose(1, 2, 0)
    elif p.endswith(".png"):
        from PIL import Image

        img = np.asarray(Image.open(p))
        if img.ndim == 2:
            img = img[:, :, None]
    else:
        raise ValueError(f"unknown image extension: {p}")

    int_max = (float(np.iinfo(img.dtype).max)
               if np.issubdtype(img.dtype, np.integer) else None)
    img = img.astype(np.float64)
    if nodata is not None and not np.isnan(nodata):
        img = np.where(img == nodata, np.nan, img)
    if img.shape[2] == 1:
        img = np.tile(img, (1, 1, 3))
    elif img.shape[2] == 2:
        img = np.tile(img[:, :, :1], (1, 1, 3))
    else:
        img = img[:, :, :3]

    if np.nanmax(img) > 1.1:  # reference heuristic; keeps binary 0/1 masks
        if int_max is not None and int_max > 255:
            # integer rasters whose payload bit depth is smaller than the
            # container (11-bit WorldView in uint16, 16-bit PNG decoded to
            # int32 by PIL): dividing by the container max crushes the data
            # toward 0. Use the smallest standard full-scale that holds the
            # data max — deterministic per sensor, so multi-view radiometry
            # stays consistent across images of the same bit depth.
            data_max = float(np.nanmax(img))
            scale = next((fs for fs in (255.0, 1023.0, 2047.0, 4095.0,
                                        16383.0, 65535.0) if fs >= data_max),
                         data_max)
            img = img / scale
        else:
            img = img / 255.0
    img = np.nan_to_num(img, nan=0.0)
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
