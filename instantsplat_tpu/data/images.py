"""Image loading + the MASt3R input resize/crop policy.

Reference behavior (utils/sfm_utils.py:71-98 get_sorted_image_files and
123-176 load_images):

- files sorted by the first integer in the stem (fallback: stable order);
- each image resized so its LONG side equals `size` (512) with LANCZOS when
  downscaling / BICUBIC when upscaling (dust3r/utils/image.py
  _resize_pil_image), then center-cropped so both sides are multiples of 16
  (halfw = (W//16)*8); for exactly-square non-square_ok inputs the crop
  height is 3/4 of the width;
- returns float arrays in [0, 1] (the ImgNorm normalization to [-1, 1] is
  applied by the model wrapper, not here) plus the original (W, H).
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np
from PIL import Image

ALLOWED_EXTENSIONS = {".png", ".jpg", ".jpeg", ".bmp", ".tiff"}


def sorted_image_files(image_dir):
    """Numerically sorted image paths + the (first) file suffix."""
    p = Path(image_dir)

    def key(f: Path):
        m = re.search(r"\d+", f.stem)
        return int(m.group()) if m else float("inf")

    files = sorted(
        (f for f in p.iterdir()
         if f.is_file() and f.suffix.lower() in ALLOWED_EXTENSIONS),
        key=key,
    )
    assert files, f"no images found in {image_dir}"
    return [str(f) for f in files], files[0].suffix


def _resize_long_side(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    scale = size / max(w, h)
    interp = Image.LANCZOS if scale < 1 else Image.BICUBIC
    return img.resize((round(w * scale), round(h * scale)), interp)


def _load_one(path, size, square_ok):
    img = Image.open(path).convert("RGB")
    orig_wh = img.size
    img = _resize_long_side(img, size)
    w, h = img.size
    cx, cy = w // 2, h // 2
    halfw, halfh = (w // 16) * 8, (h // 16) * 8
    if not square_ok and w == h:
        halfh = 3 * halfw // 4
    img = img.crop((cx - halfw, cy - halfh, cx + halfw, cy + halfh))
    return np.asarray(img, np.float32) / 255.0, orig_wh


def load_images(paths, size=512, square_ok=False):
    """-> (imgs [V, H, W, 3] float32 in [0,1], true_shape (H, W),
    original (W, H)).

    All images must share one resolution after the crop (the sparse-view
    pipeline assumes a single camera; the reference stacks them the same
    way). For mixed-aspect folders use `load_images_mixed`.
    """
    out = []
    orig_wh = None
    for path in paths:
        arr, orig_wh = _load_one(path, size, square_ok)
        out.append(arr)
    shapes = {o.shape for o in out}
    if len(shapes) > 1:
        raise ValueError(
            f"mixed image shapes after resize/crop: {sorted(shapes)} — use "
            "load_images_mixed (pipelines route mixed-aspect scenes "
            "through it automatically)."
        )
    arr = np.stack(out)
    return arr, arr.shape[1:3], orig_wh


def load_images_mixed(paths, size=512, square_ok=False):
    """Mixed-aspect loader (reference behavior: dust3r inference tolerates
    mixed shapes by forcing batch_size=1, dust3r/inference.py:62-64).

    -> (imgs: list of [H_i, W_i, 3] float32 in [0,1],
        shapes: [V, 2] int (H_i, W_i),
        org_whs: list of original (W, H) per image).
    """
    imgs, org_whs = [], []
    for path in paths:
        arr, orig_wh = _load_one(path, size, square_ok)
        imgs.append(arr)
        org_whs.append(orig_wh)
    shapes = np.array([im.shape[:2] for im in imgs], np.int64)
    return imgs, shapes, org_whs


def pad_to_canvas(maps, canvas_hw=None, fill=0.0):
    """Stack per-image maps of mixed shapes onto one canvas, each placed
    at the top-left corner. maps: list of [H_i, W_i, ...]; canvas_hw
    defaults to the max extent over `maps`. Returns [V, Hc, Wc, ...]."""
    if canvas_hw is None:
        canvas_hw = (max(np.asarray(m).shape[0] for m in maps),
                     max(np.asarray(m).shape[1] for m in maps))
    hm, wm = int(canvas_hw[0]), int(canvas_hw[1])
    first = np.asarray(maps[0])
    out = np.full((len(maps), hm, wm) + first.shape[2:], fill, first.dtype)
    for v, m in enumerate(maps):
        h, w = np.asarray(m).shape[:2]
        out[v, :h, :w] = m
    return out


def load_images_from_dir(image_dir, size=512):
    files, suffix = sorted_image_files(image_dir)
    imgs, hw, orig_wh = load_images(files, size=size)
    return imgs, hw, orig_wh, files, suffix


def save_image(path, img):
    """img [H, W, 3] float in [0, 1] -> 8-bit file. Non-finite pixels
    (divergent optimization states can render NaN) save as black instead
    of casting to undefined uint8 values."""
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    arr = np.nan_to_num(np.asarray(img, np.float32), nan=0.0,
                        posinf=1.0, neginf=0.0)
    arr = np.clip(arr * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def load_image(path):
    """-> [H, W, 3] float32 in [0, 1]."""
    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0


def pil_resize(img_array, resolution_wh):
    """Resize a float [H, W, 3] array (reference PILtoTorch,
    utils/general_utils.py:21-27: PIL bilinear default)."""
    img = Image.fromarray(
        np.clip(np.asarray(img_array) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    )
    img = img.resize(tuple(resolution_wh))
    return np.asarray(img, np.float32) / 255.0
