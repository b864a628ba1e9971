"""TextBlock objects + detection grouping.

Behavioral re-implementation of the reference's utils/textblock.py: the
TextBlock rich-text container (:12-265), line-geometry analysis
(examine_textblk :302), scattered-line merging (:344-388), distance-gap
splitting (:390-419), manga-reading-order sort (:267-300) and the
grouping driver ``group_output`` (:421-508).  Polygon predicates use this
framework's convex geometry (SAT) instead of shapely.
"""

from __future__ import annotations

import copy
import math
from typing import Dict, List, Optional

import numpy as np

from comic_text_detector_tpu.constants import LANG_LIST
from comic_text_detector_tpu.ops import geometry as geo
from comic_text_detector_tpu.utils.imgproc import (
    intersect_area,
    perspective_transform_matrix,
    rotate_polygons,
    warp_perspective,
    xywh2xyxypoly,
)


class TextBlock:
    """A detected text block: bbox, member line polygons, orientation/format
    metadata, and rich-text fields consumed by downstream translator apps.

    Field set mirrors the reference TextBlock so serialized block dicts are
    interchangeable between frameworks.
    """

    def __init__(
        self,
        xyxy: List,
        lines: Optional[List] = None,
        language: str = "unknown",
        vertical: bool = False,
        font_size: float = -1,
        distance: Optional[List] = None,
        angle: int = 0,
        vec: Optional[List] = None,
        norm: float = -1,
        merged: bool = False,
        weight: float = -1,
        text: Optional[List] = None,
        translation: str = "",
        fg_r=0,
        fg_g=0,
        fg_b=0,
        bg_r=0,
        bg_g=0,
        bg_b=0,
        line_spacing=1.0,
        font_family: str = "",
        bold: bool = False,
        underline: bool = False,
        italic: bool = False,
        alignment: int = -1,
        alpha: float = 255,
        rich_text: str = "",
        _bounding_rect: Optional[List] = None,
        accumulate_color=True,
        default_stroke_width=0.2,
        target_lang: str = "",
        **kwargs,
    ) -> None:
        self.xyxy = [int(num) for num in xyxy]
        self.lines = [] if lines is None else lines
        self.vertical = vertical
        self.language = language
        self.font_size = font_size
        self.distance = None if distance is None else np.array(distance, np.float64)
        self.angle = angle
        self.vec = None if vec is None else np.array(vec, np.float64)
        self.norm = norm
        self.merged = merged
        self.weight = weight
        self.text = text if text is not None else []
        self.prob = 1
        self.translation = translation
        self.fg_r = fg_r
        self.fg_g = fg_g
        self.fg_b = fg_b
        self.bg_r = bg_r
        self.bg_g = bg_g
        self.bg_b = bg_b
        self.font_family = font_family
        self.bold = bold
        self.underline = underline
        self.italic = italic
        self.alpha = alpha
        self.rich_text = rich_text
        self.line_spacing = line_spacing
        self._alignment = alignment
        self._target_lang = target_lang
        self._bounding_rect = _bounding_rect
        self.default_stroke_width = default_stroke_width
        self.accumulate_color = accumulate_color

    # --- geometry ---

    def lines_array(self, dtype=np.float64) -> np.ndarray:
        return np.array(self.lines, dtype=dtype)

    def adjust_bbox(self, with_bbox: bool = False):
        lines = self.lines_array().astype(np.int32)
        if with_bbox:
            self.xyxy[0] = min(int(lines[..., 0].min()), self.xyxy[0])
            self.xyxy[1] = min(int(lines[..., 1].min()), self.xyxy[1])
            self.xyxy[2] = max(int(lines[..., 0].max()), self.xyxy[2])
            self.xyxy[3] = max(int(lines[..., 1].max()), self.xyxy[3])
        else:
            self.xyxy = [
                int(lines[..., 0].min()),
                int(lines[..., 1].min()),
                int(lines[..., 0].max()),
                int(lines[..., 1].max()),
            ]

    def sort_lines(self):
        if self.distance is not None:
            idx = np.argsort(self.distance)
            self.distance = self.distance[idx]
            self.lines = np.array(self.lines, dtype=np.int32)[idx].tolist()

    def center(self) -> np.ndarray:
        xyxy = np.array(self.xyxy)
        return (xyxy[:2] + xyxy[2:]) / 2

    def aspect_ratio(self) -> float:
        min_rect = self.min_rect()
        mid = (min_rect[:, [1, 2, 3, 0]] + min_rect) / 2
        norm_v = np.linalg.norm(mid[:, 2] - mid[:, 0])
        norm_h = np.linalg.norm(mid[:, 1] - mid[:, 3])
        return norm_v / norm_h

    def min_rect(self, rotate_back: bool = True) -> np.ndarray:
        angled = self.angle != 0
        center = self.center()
        polygons = self.lines_array().reshape(-1, 8)
        if angled:
            polygons = rotate_polygons(center, polygons, self.angle)
        min_x, min_y = polygons[:, ::2].min(), polygons[:, 1::2].min()
        max_x, max_y = polygons[:, ::2].max(), polygons[:, 1::2].max()
        box = np.array([[min_x, min_y, max_x, min_y, max_x, max_y, min_x, max_y]])
        if angled and rotate_back:
            box = rotate_polygons(center, box, -self.angle)
        return box.reshape(-1, 4, 2).astype(np.int64)

    def bounding_rect(self) -> List:
        if self._bounding_rect is None:
            box = self.min_rect(rotate_back=False)[0]
            x, y = box[0]
            w, h = box[2] - box[0]
            return [int(x), int(y), int(w), int(h)]
        return self._bounding_rect

    def __getattribute__(self, name: str):
        if name == "pts":
            return self.lines_array()
        return object.__getattribute__(self, name)

    def __len__(self):
        return len(self.lines)

    def __getitem__(self, idx):
        return self.lines[idx]

    def to_dict(self) -> Dict:
        return copy.deepcopy(vars(self))

    def xywh(self) -> List:
        x, y, x2, y2 = self.xyxy
        return [x, y, x2 - x, y2 - y]

    def get_text(self) -> str:
        if isinstance(self.text, str):
            return self.text
        return " ".join(self.text).strip()

    def get_transformed_region(self, img: np.ndarray, idx: int, textheight: int) -> np.ndarray:
        """Rectify one text line to an axis-aligned strip of height
        ``textheight`` (reference :162-194)."""
        im_h, im_w = img.shape[:2]
        src_pts = np.array(self.lines[idx], dtype=np.float64)
        if self.language == "eng" or (self.language == "unknown" and not self.vertical):
            e = self.font_size / 3
            src_pts[..., 0] += np.array([-e, e, e, -e])
            src_pts[..., 1] += np.array([-e, -e, e, e])
            src_pts[..., 0] = np.clip(src_pts[..., 0], 0, im_w)
            src_pts[..., 1] = np.clip(src_pts[..., 1], 0, im_h)
        mid = (src_pts[[1, 2, 3, 0]] + src_pts) / 2
        vec_v = mid[2] - mid[0]
        vec_h = mid[1] - mid[3]
        ratio = np.linalg.norm(vec_v) / max(np.linalg.norm(vec_h), 1e-9)
        if not self.vertical:
            h = int(textheight)
            w = max(int(round(textheight / max(ratio, 1e-9))), 1)
            dst = np.array([[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]], np.float64)
            M = perspective_transform_matrix(src_pts, dst)
            return warp_perspective(img, M, (w, h))
        w = int(textheight)
        h = max(int(round(textheight * ratio)), 1)
        dst = np.array([[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]], np.float64)
        M = perspective_transform_matrix(src_pts, dst)
        region = warp_perspective(img, M, (w, h))
        return np.ascontiguousarray(np.rot90(region, k=1))  # rotate 90° CCW

    # --- colors / formatting ---

    def set_font_colors(self, frgb, srgb, accumulate: bool = True):
        self.accumulate_color = accumulate
        num_lines = len(self.lines) if accumulate and len(self.lines) > 0 else 1
        frgb = np.array(frgb) * num_lines
        self.fg_r, self.fg_g, self.fg_b = frgb
        srgb = np.array(srgb) * num_lines
        self.bg_r, self.bg_g, self.bg_b = srgb

    def get_font_colors(self, bgr: bool = False):
        num_lines = len(self.lines)
        frgb = np.array([self.fg_r, self.fg_g, self.fg_b])
        brgb = np.array([self.bg_r, self.bg_g, self.bg_b])
        if self.accumulate_color:
            if num_lines > 0:
                frgb = (frgb / num_lines).astype(np.int32)
                brgb = (brgb / num_lines).astype(np.int32)
                return (frgb[::-1], brgb[::-1]) if bgr else (frgb, brgb)
            return [0, 0, 0], [0, 0, 0]
        return frgb, brgb

    def alignment(self) -> int:
        """0 = left, 1 = center (inferred from line-left/center stddev)."""
        if self._alignment >= 0:
            return self._alignment
        if self.vertical:
            return 0
        lines = self.lines_array()
        if len(lines) == 1:
            return 0
        polygons = lines.reshape(-1, 8)
        if self.angle != 0:
            polygons = rotate_polygons((0, 0), polygons, self.angle)
        polygons = polygons.reshape(-1, 4, 2)
        left_std = np.std(polygons[:, 0, 0])
        center_std = np.std((polygons[:, 0, 0] + polygons[:, 1, 0]) / 2)
        return 0 if left_std < center_std else 1

    def target_lang(self) -> str:
        return self._target_lang

    @property
    def stroke_width(self):
        var = np.array([self.fg_r, self.fg_g, self.fg_b]) - np.array([self.bg_r, self.bg_g, self.bg_b])
        if np.abs(var).sum() > 40:
            return self.default_stroke_width
        return 0


def sort_textblk_list(blk_list: List[TextBlock], im_w: int, im_h: int) -> List[TextBlock]:
    """Manga reading-order sort: 4x3 grid weights, right-to-left when the
    page is ja-majority, two-page spreads handled by halving wide pages
    (reference :267-300)."""
    if len(blk_list) == 0:
        return blk_list
    num_ja = sum(1 for blk in blk_list if blk.language == "ja")
    xyxy = np.array([blk.xyxy for blk in blk_list])
    flip_lr = num_ja > len(blk_list) / 2
    im_oriw = im_w
    if im_w > im_h:
        im_w /= 2
    num_gridy, num_gridx = 4, 3
    img_area = im_h * im_w
    center_x = (xyxy[:, 0] + xyxy[:, 2]) / 2
    if flip_lr:
        center_x = (im_oriw - center_x) if im_w != im_oriw else (im_w - center_x)
    grid_x = (center_x / im_w * num_gridx).astype(np.int32)
    center_y = (xyxy[:, 1] + xyxy[:, 3]) / 2
    grid_y = (center_y / im_h * num_gridy).astype(np.int32)
    grid_indices = grid_y * num_gridx + grid_x
    grid_weights = (
        grid_indices * img_area
        + 1.2 * (center_x - grid_x * im_w / num_gridx)
        + (center_y - grid_y * im_h / num_gridy)
    )
    if im_w != im_oriw:
        grid_weights[np.where(grid_x >= num_gridx)] += img_area * num_gridy * num_gridx
    for blk, weight in zip(blk_list, grid_weights):
        blk.weight = weight
    blk_list.sort(key=lambda blk: blk.weight)
    return blk_list


def examine_textblk(blk: TextBlock, im_w: int, im_h: int, sort: bool = False) -> None:
    """Infer orientation/angle/font-size/line distances from line-edge
    vectors (reference :302-342)."""
    lines = blk.lines_array()
    middle_pnts = (lines[:, [1, 2, 3, 0]] + lines) / 2
    vec_v = middle_pnts[:, 2] - middle_pnts[:, 0]
    vec_h = middle_pnts[:, 1] - middle_pnts[:, 3]
    center_pnts = (lines[:, 0] + lines[:, 2]) / 2
    v = np.sum(vec_v, axis=0)
    h = np.sum(vec_h, axis=0)
    norm_v, norm_h = np.linalg.norm(v), np.linalg.norm(h)
    vertical = norm_v > norm_h if blk.language == "ja" else norm_v > norm_h * 2
    if vertical:
        primary_vec, primary_norm = v, norm_v
        distance_vectors = center_pnts - np.array([[im_w, 0]], dtype=np.float64)
        font_size = int(round(norm_h / len(lines)))
    else:
        primary_vec, primary_norm = h, norm_h
        distance_vectors = center_pnts - np.array([[0, 0]], dtype=np.float64)
        font_size = int(round(norm_v / len(lines)))
    rotation_angle = int(math.atan2(primary_vec[1], primary_vec[0]) / math.pi * 180)
    distance = np.linalg.norm(distance_vectors, axis=1)
    with np.errstate(invalid="ignore", divide="ignore"):
        rad = np.arccos(
            np.clip(distance_vectors @ primary_vec / (distance * primary_norm), -1.0, 1.0)
        )
    distance = np.abs(np.sin(rad) * distance)
    blk.lines = lines.astype(np.int32).tolist()
    blk.distance = distance
    blk.angle = rotation_angle
    if vertical:
        blk.angle -= 90
    if abs(blk.angle) < 3:
        blk.angle = 0
    blk.font_size = font_size
    blk.vertical = vertical
    blk.vec = primary_vec
    blk.norm = primary_norm
    if sort:
        blk.sort_lines()


def try_merge_textline(blk: TextBlock, blk2: TextBlock, fntsize_tol=1.3, distance_tol=2) -> bool:
    """Merge blk2's line into blk when geometry agrees (reference :344-373)."""
    if blk2.merged:
        return False
    fntsize_div = blk.font_size / blk2.font_size
    num_l1, num_l2 = len(blk), len(blk2)
    fntsz_avg = (blk.font_size * num_l1 + blk2.font_size * num_l2) / (num_l1 + num_l2)
    vec_prod = blk.vec @ blk2.vec
    vec_sum = blk.vec + blk2.vec
    cos_vec = vec_prod / blk.norm / blk2.norm
    distance = blk2.distance[-1] - blk.distance[-1]
    distance_p1 = np.linalg.norm(np.array(blk2.lines[-1][0]) - np.array(blk.lines[-1][0]))
    l1 = np.asarray(blk.lines[-1], np.float64)
    l2 = np.asarray(blk2.lines[-1], np.float64)
    if not geo.convex_polygons_intersect(l1, l2):
        if fntsize_div > fntsize_tol or 1 / fntsize_div > fntsize_tol:
            return False
        if abs(cos_vec) < 0.866:  # cos30
            return False
        if distance > distance_tol * fntsz_avg or distance_p1 > fntsz_avg * 2.5:
            return False
    blk.lines.append(blk2.lines[0])
    blk.vec = vec_sum
    blk.angle = int(round(np.rad2deg(math.atan2(vec_sum[1], vec_sum[0]))))
    if blk.vertical:
        blk.angle -= 90
    blk.norm = np.linalg.norm(vec_sum)
    blk.distance = np.append(blk.distance, blk2.distance[-1])
    blk.font_size = fntsz_avg
    blk2.merged = True
    return True


def merge_textlines(blk_list: List[TextBlock]) -> List[TextBlock]:
    if len(blk_list) < 2:
        return blk_list
    blk_list.sort(key=lambda blk: blk.distance[0])
    merged_list = []
    for ii, current_blk in enumerate(blk_list):
        if current_blk.merged:
            continue
        for blk in blk_list[ii + 1 :]:
            try_merge_textline(current_blk, blk)
        merged_list.append(current_blk)
    for blk in merged_list:
        blk.adjust_bbox(with_bbox=False)
    return merged_list


def split_textblk(blk: TextBlock):
    """Split a block wherever consecutive (distance-sorted) lines leave a
    gap > 2 font sizes (reference :390-419)."""
    font_size, distance, lines = blk.font_size, blk.distance, blk.lines
    l0 = np.array(blk.lines[0])
    lines.sort(key=lambda line: np.linalg.norm(np.array(line[0]) - l0[0]))
    distance_tol = font_size * 2
    current_blk = copy.deepcopy(blk)
    current_blk.lines = [l0]
    sub_blk_list = [current_blk]
    textblock_splitted = False
    for jj, line in enumerate(lines[1:]):
        l1 = np.asarray(lines[jj], np.float64)
        l2 = np.asarray(line, np.float64)
        split = False
        if not geo.convex_polygons_intersect(l1, l2):
            line_disance = abs(distance[jj + 1] - distance[jj])
            if line_disance > distance_tol:
                split = True
            elif blk.vertical and abs(blk.angle) < 15:
                if len(current_blk.lines) > 1 or line_disance > font_size:
                    split = abs(lines[jj][0][1] - line[0][1]) > font_size
        if split:
            current_blk = copy.deepcopy(current_blk)
            current_blk.lines = [line]
            sub_blk_list.append(current_blk)
        else:
            current_blk.lines.append(line)
    if len(sub_blk_list) > 1:
        textblock_splitted = True
        for current_blk in sub_blk_list:
            current_blk.adjust_bbox(with_bbox=False)
    return textblock_splitted, sub_blk_list


def group_output(blks, lines, im_w: int, im_h: int, mask=None, sort_blklist: bool = True) -> List[TextBlock]:
    """Assign DB text-lines to YOLO blocks, rescue/merge scattered lines,
    split ja/vertical blocks, sort in reading order (reference :421-508).

    ``blks`` is the (boxes, classes, confs) triple from YOLO post-processing.
    """
    blk_list: List[TextBlock] = []
    scattered_lines: Dict[str, List[TextBlock]] = {"ver": [], "hor": []}
    for bbox, cls, conf in zip(*blks):
        blk_list.append(TextBlock(bbox, language=LANG_LIST[cls]))

    # step 1: assign lines to blocks by intersection-over-line-area
    bbox_score_thresh = 0.4
    mask_score_thresh = 0.1
    for line in lines:
        bx1, bx2 = line[:, 0].min(), line[:, 0].max()
        by1, by2 = line[:, 1].min(), line[:, 1].max()
        bbox_score, bbox_idx = -1, -1
        line_area = (by2 - by1) * (bx2 - bx1)
        for jj, blk in enumerate(blk_list):
            score = intersect_area(blk.xyxy, [bx1, by1, bx2, by2]) / line_area
            if bbox_score < score:
                bbox_score = score
                bbox_idx = jj
        if bbox_score > bbox_score_thresh:
            blk_list[bbox_idx].lines.append(line)
        else:
            if mask is not None:
                mask_score = mask[by1:by2, bx1:bx2].mean() / 255
                if mask_score < mask_score_thresh:
                    continue
            blk = TextBlock([bx1, by1, bx2, by2], [line])
            examine_textblk(blk, im_w, im_h, sort=False)
            scattered_lines["ver" if blk.vertical else "hor"].append(blk)

    # step 2: filter blocks, sort & split lines
    final_blk_list: List[TextBlock] = []
    for blk in blk_list:
        if len(blk.lines) == 0:
            bx1, by1, bx2, by2 = blk.xyxy
            if mask is not None:
                mask_score = mask[by1:by2, bx1:bx2].mean() / 255
                if mask_score < mask_score_thresh:
                    continue
            xywh = np.array([[bx1, by1, bx2 - bx1, by2 - by1]])
            blk.lines = xywh2xyxypoly(xywh).reshape(-1, 4, 2).tolist()
        examine_textblk(blk, im_w, im_h, sort=True)

        textblock_splitted = False
        if len(blk.lines) > 1:
            if blk.language == "ja" or blk.vertical:
                textblock_splitted = True
        if textblock_splitted:
            textblock_splitted, sub_blk_list = split_textblk(blk)
        else:
            sub_blk_list = [blk]
        if not textblock_splitted:
            for sblk in sub_blk_list:
                sblk.adjust_bbox(with_bbox=True)
        final_blk_list += sub_blk_list

    # step 3: merge scattered lines, reading-order sort
    final_blk_list += merge_textlines(scattered_lines["hor"])
    final_blk_list += merge_textlines(scattered_lines["ver"])
    if sort_blklist:
        final_blk_list = sort_textblk_list(final_blk_list, im_w, im_h)

    # expand slightly-tight eng horizontal line polys
    for blk in final_blk_list:
        if blk.language == "eng" and not blk.vertical:
            if len(blk.lines) == 0:
                continue
            expand_size = max(int(blk.font_size * 0.1), 2)
            rad = np.deg2rad(blk.angle)
            shifted = np.array([[[-1, -1], [1, -1], [1, 1], [-1, 1]]])
            shifted = shifted * np.array([[[np.sin(rad), np.cos(rad)]]]) * expand_size
            lines_arr = blk.lines_array() + shifted
            lines_arr[..., 0] = np.clip(lines_arr[..., 0], 0, im_w - 1)
            lines_arr[..., 1] = np.clip(lines_arr[..., 1], 0, im_h - 1)
            blk.lines = lines_arr.astype(np.int64).tolist()
            blk.font_size += expand_size

    return final_blk_list


def visualize_textblocks(canvas: np.ndarray, blk_list: List[TextBlock]) -> np.ndarray:
    """Draw block bboxes + line polys on a BGR canvas (PIL-based; the
    reference uses cv2 drawing, inference.py debug path)."""
    from PIL import Image, ImageDraw

    img = Image.fromarray(canvas[:, :, ::-1])
    draw = ImageDraw.Draw(img)
    lw = max(round(sum(canvas.shape) / 2 * 0.003), 2)
    for ii, blk in enumerate(blk_list):
        bx1, by1, bx2, by2 = blk.xyxy
        draw.rectangle([bx1, by1, bx2, by2], outline=(127, 255, 127), width=lw)
        for jj, line in enumerate(blk.lines_array(dtype=np.int32)):
            draw.polygon([tuple(p) for p in line], outline=(255, 127, 0), width=2)
            draw.text(tuple(line[0]), str(jj), fill=(0, 127, 255))
        draw.text((bx1, by1 + lw + 2), str(ii), fill=(255, 127, 127))
        draw.text((int((bx1 + bx2) / 2), int((by1 + by2) / 2)), str(blk.angle), fill=(255, 127, 127))
    out = np.asarray(img)[:, :, ::-1]
    canvas[:] = out
    return canvas
