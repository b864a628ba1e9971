"""IO utilities: unicode-safe image read/write (PIL-backed, BGR contract
like the reference's cv2-based io_utils.py), directory walking, numpy-aware
JSON encoding."""

from __future__ import annotations

import glob
import json
import os.path as osp
from pathlib import Path
from typing import List

import numpy as np
from PIL import Image

IMG_EXT = [".bmp", ".jpg", ".png", ".jpeg", ".webp"]


class NumpyEncoder(json.JSONEncoder):
    def default(self, obj):
        if isinstance(obj, np.ndarray):
            return obj.tolist()
        if isinstance(obj, np.bool_):
            return bool(obj)
        if isinstance(obj, np.floating):
            return float(obj)
        if isinstance(obj, np.integer):
            return int(obj)
        return json.JSONEncoder.default(self, obj)


def find_all_imgs(img_dir: str, abs_path: bool = False) -> List[str]:
    imglist = []
    for filep in sorted(glob.glob(osp.join(img_dir, "*"))):
        filename = osp.basename(filep)
        if Path(filename).suffix.lower() not in IMG_EXT:
            continue
        imglist.append(filep if abs_path else filename)
    return imglist


def imread(imgpath: str, grayscale: bool = False) -> np.ndarray:
    """Read an image as BGR uint8 (H, W, 3) — the pipeline's color contract
    matches the reference's cv2.imread."""
    img = Image.open(imgpath)
    if grayscale:
        return np.asarray(img.convert("L"))
    return np.asarray(img.convert("RGB"))[:, :, ::-1].copy()


def imwrite(img_path: str, img: np.ndarray, ext: str = ".png") -> None:
    """Write a BGR (or single-channel) uint8 image; forces ``ext`` like the
    reference imwrite (io_utils.py:47-53)."""
    suffix = Path(img_path).suffix
    img_path = img_path.replace(suffix, ext) if suffix else img_path + ext
    if img.ndim == 3:
        Image.fromarray(img[:, :, ::-1]).save(img_path)
    else:
        Image.fromarray(img).save(img_path)
