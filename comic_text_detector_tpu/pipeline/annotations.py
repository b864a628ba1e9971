"""Batch annotation driver — the weak-supervision label factory.

Mirrors the reference ``model2annotations`` (inference.py:19-70): walk image
dirs, run the detector with annotation-mode refinement, write YOLO labels,
line polygons, refined masks and optional block-dict JSON.  Output filename
conventions (``mask-*``, ``line-*``) are the dataset contract consumed by
the training loaders (data/seg_dataset.py, data/db_dataset.py).
"""

from __future__ import annotations

import json
import os.path as osp
from pathlib import Path
from typing import List, Union

import numpy as np

from comic_text_detector_tpu.constants import REFINEMASK_ANNOTATION
from comic_text_detector_tpu.pipeline.detector import TextDetector
from comic_text_detector_tpu.utils.imgproc import get_yololabel_strings, xyxy2yolo
from comic_text_detector_tpu.utils.io import NumpyEncoder, find_all_imgs, imread, imwrite


def model2annotations(
    model_path: Union[str, TextDetector],
    img_dir_list: Union[str, List[str]],
    save_dir: str,
    save_json: bool = False,
    input_size: int = 1024,
    progress: bool = True,
) -> None:
    if isinstance(img_dir_list, str):
        img_dir_list = [img_dir_list]
    if isinstance(model_path, TextDetector):
        model = model_path
    else:
        model = TextDetector(model_path=model_path, input_size=input_size, act="leaky")
    imglist: List[str] = []
    for img_dir in img_dir_list:
        imglist += find_all_imgs(img_dir, abs_path=True)
    it = imglist
    if progress:
        try:
            from tqdm import tqdm

            it = tqdm(imglist)
        except ImportError:
            pass
    for img_path in it:
        imgname = osp.basename(img_path)
        img = imread(img_path)
        im_h, im_w = img.shape[:2]
        imname = imgname.replace(Path(imgname).suffix, "")
        maskname = "mask-" + imname + ".png"
        poly_save_path = osp.join(save_dir, "line-" + imname + ".txt")
        mask, mask_refined, blk_list = model(
            img, refine_mode=REFINEMASK_ANNOTATION, keep_undetected_mask=True
        )
        polys = []
        blk_xyxy = []
        blk_dict_list = []
        for blk in blk_list:
            polys += blk.lines
            blk_xyxy.append(blk.xyxy)
            blk_dict_list.append(blk.to_dict())
        blk_xyxy = xyxy2yolo(blk_xyxy, im_w, im_h)
        if blk_xyxy is not None:
            cls_list = [1] * len(blk_xyxy)
            yolo_label = get_yololabel_strings(cls_list, blk_xyxy)
        else:
            yolo_label = ""
        with open(osp.join(save_dir, imname + ".txt"), "w", encoding="utf8") as f:
            f.write(yolo_label)
        if len(polys) != 0:
            polys = np.array(polys).reshape(-1, 8)
            np.savetxt(poly_save_path, polys, fmt="%d")
        if save_json:
            with open(osp.join(save_dir, imname + ".json"), "w", encoding="utf8") as f:
                f.write(json.dumps(blk_dict_list, ensure_ascii=False, cls=NumpyEncoder))
        imwrite(osp.join(save_dir, imgname), img)
        imwrite(osp.join(save_dir, maskname), mask_refined)


def traverse_by_dict(
    img_dir_list: Union[str, List[str]],
    dict_dir: str,
    save_dir: Union[str, None] = None,
) -> None:
    """Re-load saved block dicts + masks, re-run refinement and save
    visualizations (the reference's traverse_by_dict debug loop,
    inference.py:180-200, writing files instead of cv2.imshow)."""
    import os

    from comic_text_detector_tpu.postproc.textblock import TextBlock, visualize_textblocks
    from comic_text_detector_tpu.postproc.textmask import refine_mask

    if isinstance(img_dir_list, str):
        img_dir_list = [img_dir_list]
    save_dir = save_dir or dict_dir
    os.makedirs(save_dir, exist_ok=True)
    imglist: List[str] = []
    for img_dir in img_dir_list:
        imglist += find_all_imgs(img_dir, abs_path=True)
    for img_path in imglist:
        imgname = osp.basename(img_path)
        imname = imgname.replace(Path(imgname).suffix, "")
        mask_path = osp.join(dict_dir, "mask-" + imname + ".png")
        json_path = osp.join(dict_dir, imname + ".json")
        if not (osp.exists(mask_path) and osp.exists(json_path)):
            continue
        with open(json_path, "r", encoding="utf8") as f:
            blk_list = [TextBlock(**d) for d in json.loads(f.read())]
        img = imread(img_path)
        mask = imread(mask_path, grayscale=True)
        mask = refine_mask(img, mask, blk_list)
        canvas = img.copy()
        visualize_textblocks(canvas, blk_list)
        imwrite(osp.join(save_dir, "viz-" + imname + ".png"), canvas)
        imwrite(osp.join(save_dir, "refined-" + imname + ".png"), mask)
