"""Batched volume pipeline — the throughput configuration.

Processes whole chapters/volumes: pages are letterboxed to one static shape,
batched, and run through a single jitted graph per batch (net + NMS + DB
pixel decode for every page in one device dispatch), optionally sharded
over a ``data`` mesh axis.  Host-side decode/letterbox runs in a prefetch
thread, double-buffered against device compute; host polygon/grouping/
refinement runs after each batch returns.

This is the TPU replacement for the reference's serial per-page loop
(model2annotations, inference.py:19-70).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from comic_text_detector_tpu import constants as C
from comic_text_detector_tpu.models.detector import build_inference_model, init_variables
from comic_text_detector_tpu.config import YOLOV5S_CFG
from comic_text_detector_tpu.ops.db_decode import boxes_from_device_rects, db_decode_full_device
from comic_text_detector_tpu.ops.nms import nms_single
from comic_text_detector_tpu.ops.resize import letterbox_device_u8, letterbox_shape, resize_bilinear_fast
from comic_text_detector_tpu.pipeline.detector import upload_page
from comic_text_detector_tpu.postproc.textblock import group_output
from comic_text_detector_tpu.postproc.textmask import refine_mask, refine_undetected_mask


class BatchTextDetector:
    """Fixed-batch detector: (B, S, S, 3) pages per device dispatch.

    Use :meth:`stream` for an end-to-end iterator over image arrays.
    """

    def __init__(
        self,
        variables,
        batch_size: int = 4,
        input_size: int = C.DEFAULT_INPUT_SIZE,
        act: str = "leaky",
        cfg: Optional[dict] = None,
        half: bool = True,
        conf_thresh: float = C.DEFAULT_CONF_THRESH,
        nms_thresh: float = C.DEFAULT_NMS_THRESH,
        mesh=None,
        refine_backend: str = "host",
        mask_transfer: str = "grey",
    ):
        # see TextDetector for the refine_backend / mask_transfer contract
        self.refine_backend = refine_backend
        self.mask_transfer = mask_transfer
        if mask_transfer == "packed" and refine_backend != "device":
            raise ValueError("mask_transfer='packed' requires refine_backend='device'")
        self.batch_size = batch_size
        self.size = input_size
        self.conf_thresh = conf_thresh
        self.nms_thresh = nms_thresh
        self.db_thresh = C.DEFAULT_DB_THRESH
        self.box_thresh = C.DEFAULT_BOX_THRESH
        dtype = jnp.bfloat16 if half else jnp.float32
        self.model = build_inference_model(cfg or YOLOV5S_CFG, act=act, dtype=dtype)
        self.mesh = mesh
        if mesh is not None:
            from comic_text_detector_tpu.parallel.mesh import replicated_spec

            variables = jax.device_put(variables, replicated_spec(mesh))
        else:
            variables = jax.device_put(variables)
        self.variables = variables
        self._infer = self._build_infer()

    @classmethod
    def random_init(cls, batch_size: int = 4, input_size: int = C.DEFAULT_INPUT_SIZE, seed: int = 0, **kw):
        model = build_inference_model(YOLOV5S_CFG, act="leaky")
        variables = init_variables(model, jax.random.PRNGKey(seed), input_size=256)
        return cls(variables, batch_size=batch_size, input_size=input_size, **kw)

    def _build_infer(self):
        size = self.size

        @jax.jit
        def infer(variables, x_u8):
            """(B, S, S, 3) uint8 letterboxed -> per-page NMS rows/counts,
            uint8 (or 1-bpp packed) masks, on-device DB rects — one dispatch,
            compact transfers.  Also returns the full-res device mask batch
            for the on-device refinement stage."""
            x = x_u8.astype(jnp.float32) / 255.0
            blks, mask, lines = self.model.apply(variables, x)
            rows, counts = jax.vmap(
                lambda p: nms_single(p.astype(jnp.float32), self.conf_thresh, self.nms_thresh)
            )(blks)
            masks_full = (mask[..., 0].astype(jnp.float32) * 255.0).astype(jnp.uint8)
            boxes, scores, valid = jax.vmap(lambda s: db_decode_full_device(s, self.db_thresh))(
                lines[..., 0].astype(jnp.float32)
            )
            return rows, counts, boxes, scores, valid, masks_full

        return infer

    def submit(self, pages: Sequence[np.ndarray]):
        """Letterbox + enqueue one batch on device (non-blocking).

        Returns an opaque ticket for :meth:`collect`; keep one in flight to
        overlap device compute with the previous batch's download +
        host post-processing.  Letterboxing runs ON DEVICE (per-page-shape
        cached jits) — the 1-vCPU host can't hide a NumPy resize behind
        device compute.
        """
        size = self.size
        metas = []
        lbs = []
        origs = []
        for img in pages:
            im_h, im_w = img.shape[:2]
            _, _, dw, dh, _ = letterbox_shape(im_h, im_w, size)
            orig = upload_page(img)  # one upload serves letterbox AND refine
            origs.append(orig)
            lbs.append(letterbox_device_u8(orig, size))
            metas.append((im_h, im_w, dw, dh))
        while len(lbs) < self.batch_size:
            lbs.append(jnp.zeros((size, size, 3), jnp.uint8))
        device_batch = jnp.stack(lbs)
        if self.mesh is not None:
            from comic_text_detector_tpu.parallel.mesh import shard_batch_spec

            device_batch = jax.device_put(device_batch, shard_batch_spec(self.mesh, 4))
        rows, counts, boxes, scores, valid, masks_full = self._infer(
            self.variables, device_batch
        )
        mask_devs = None
        if self.mask_transfer == "packed":
            # per-page: upsample the grey mask to ORIGINAL resolution on
            # device (cv2-exact) and binarize at the reference's >30 AFTER
            # interpolation (binarize-then-upsample measured raw-mask IoU
            # 0.913 vs the reference); ship 1 bpp.  The upsampled masks stay
            # device-resident for the refine stage (no recompute there).
            from comic_text_detector_tpu.pipeline.detector import _upsample_mask_packed

            mask_devs, masks_out = [], []
            for i, (im_h, im_w, dw, dh) in enumerate(metas):
                md, pk = _upsample_mask_packed(
                    masks_full[i], size - dh, size - dw, (im_h, im_w)
                )
                mask_devs.append(md)
                masks_out.append(pk)
        else:
            # crop masks to the batch's shared content region before transfer
            min_dh = min(m[3] for m in metas)
            min_dw = min(m[2] for m in metas)
            masks_out = masks_full[:, : size - min_dh, : size - min_dw]
        outputs = (rows, counts, masks_out, boxes, scores, valid)
        # start the device->host copies without blocking
        for o in jax.tree_util.tree_leaves(outputs):
            o.copy_to_host_async()
        # device-resident extras for the on-device refinement stage
        extras = (origs, masks_full, mask_devs) if self.refine_backend == "device" else None
        return outputs, metas, list(pages), extras

    def collect(
        self,
        ticket,
        refine_mode: int = C.REFINEMASK_INPAINT,
        keep_undetected_mask: bool = False,
    ) -> List[Tuple[np.ndarray, np.ndarray, list]]:
        outputs, metas, pages, extras = ticket
        size = self.size
        rows, counts, masks_out, dboxes, dscores, dvalid = jax.device_get(outputs)
        staged = []
        for i, page in enumerate(pages):
            im_h, im_w, dw, dh = metas[i]
            resize_ratio = (im_w / (size - dw), im_h / (size - dh))
            det = rows[i][: counts[i]].copy()
            det[:, [0, 2]] *= resize_ratio[0]
            det[:, [1, 3]] *= resize_ratio[1]
            blks = (det[:, :4].astype(np.int32), det[:, 5].astype(np.int32), np.round(det[:, 4], 3))

            lines, scores = boxes_from_device_rects(
                dboxes[i], dscores[i], dvalid[i], size, size, size, size
            )
            if len(scores):
                keep = scores > self.box_thresh
                lines, scores = lines[keep], scores[keep]
            if self.mask_transfer == "packed":
                # device already upsampled to original resolution + binarized >30
                mask = np.unpackbits(masks_out[i], axis=-1)[:, :im_w] * np.uint8(255)
            else:
                mask = masks_out[i][: size - dh, : size - dw]
                mask = resize_bilinear_fast(mask, (im_h, im_w))
            if lines.size == 0:
                lines = []
            else:
                lines = lines.astype(np.float64)
                lines[..., 0] *= resize_ratio[0]
                lines[..., 1] *= resize_ratio[1]
                lines = lines.astype(np.int32)
            blk_list = group_output(blks, lines, im_w, im_h, mask)
            staged.append((mask, blk_list))

        if self.refine_backend == "device":
            refine_tickets = self._submit_refines(
                extras, metas, pages, [bl for _, bl in staged], refine_mode
            )

        out = []
        for i, page in enumerate(pages):
            mask, blk_list = staged[i]
            if self.refine_backend == "device":
                mask_refined = self._finish_refine(refine_tickets[i])
                if keep_undetected_mask:
                    mask_refined = self._rescue_undetected(
                        refine_tickets[i], mask_refined, mask, blk_list,
                        page.shape, refine_mode,
                    )
            else:
                mask_refined = refine_mask(page, mask, blk_list, refine_mode=refine_mode)
                if keep_undetected_mask:
                    mask_refined = refine_undetected_mask(
                        page, mask, mask_refined, blk_list, refine_mode
                    )
            out.append((mask, mask_refined, blk_list))
        return out

    def _submit_refines(self, extras, metas, pages, blk_lists, refine_mode):
        """Dispatch the whole batch's window refinement at ORIGINAL page
        resolution (same semantics as TextDetector._refine_on_device —
        sub-256px windows bit-exact vs the host merge).  Windows from all
        same-shaped pages pack into shared SLOTS dispatches (ops/refine.py::
        refine_pages), so a 20-block page no longer serializes 3 padded
        dispatches on its own.  Returns one ticket per page."""
        from comic_text_detector_tpu.ops.refine import refine_pages
        from comic_text_detector_tpu.pipeline.detector import _pack_canvas, _upsample_mask
        from comic_text_detector_tpu.utils.imgproc import expand_textwindow

        origs, masks_full, mask_devs = extras
        size = self.size
        if mask_devs is None:  # grey transfer mode: upsample here
            mask_devs = []
            for i in range(len(pages)):
                im_h, im_w, dw, dh = metas[i]
                mask_devs.append(
                    _upsample_mask(masks_full[i], size - dh, size - dw, (im_h, im_w))
                )

        groups: dict = {}
        for i, page in enumerate(pages):
            groups.setdefault(page.shape[:2], []).append(i)
        tickets = [None] * len(pages)
        for shape, idxs in groups.items():
            # Canonicalize the group stack to P = batch_size: with mixed
            # page shapes the per-batch group size P varies page-mix to
            # page-mix, and every new (P, bucket) combination retraces
            # _refine_windows_jit — a multi-minute remote compile on this
            # backend (r5c measured a distinct-page stream at 0.12 pages/s,
            # all recompiles).  Pad rows repeat page 0 and receive no
            # windows, so they add device memory but no compute; tickets
            # only read rows < len(idxs).  For a homogeneous batch this is
            # a no-op (P == batch_size already).
            pad = self.batch_size - len(idxs)
            pad_idx = [idxs[0]] * max(0, pad)
            imgs = jnp.stack([origs[i] for i in idxs] + [origs[i] for i in pad_idx])
            masks = jnp.stack([mask_devs[i] for i in idxs] + [mask_devs[i] for i in pad_idx])
            windows, pids = [], []
            for gi, i in enumerate(idxs):
                for blk in blk_lists[i]:
                    windows.append(expand_textwindow(pages[i].shape, blk.xyxy, expand_r=16))
                    pids.append(gi)
            canvases = refine_pages(
                imgs, masks,
                np.asarray(windows, np.int32).reshape(-1, 4),
                np.asarray(pids, np.int32), refine_mode,
            )
            packed = _pack_canvas(canvases)
            packed.copy_to_host_async()
            fetch_cache: dict = {}  # one device_get for the whole shape group
            for gi, i in enumerate(idxs):
                tickets[i] = (packed, canvases, imgs, masks, gi, shape, fetch_cache)
        return tickets

    def _finish_refine(self, ticket) -> np.ndarray:
        packed, _canvases, _imgs, _masks, gi, shape, fetch_cache = ticket
        if "host" not in fetch_cache:
            # fetch the WHOLE group's packed canvases in one transfer: a
            # per-page packed[gi] would dispatch a device slice + pay a
            # tunnel round trip per page (RTT is ~25 ms and spikes under
            # service congestion)
            fetch_cache["host"] = np.asarray(jax.device_get(packed))
        row = fetch_cache["host"][gi]
        # packbits pads the row tail; crop back to the page width
        return (np.unpackbits(row, axis=-1) * np.uint8(255))[:, : shape[1]]

    def _rescue_undetected(self, ticket, refined, raw_mask, blk_list, img_shape, refine_mode):
        """keep_undetected_mask for the batch path: identical original-
        resolution semantics as the single-page pipeline (shared helper in
        pipeline/detector.py; reference textmask.py:135-156)."""
        from comic_text_detector_tpu.pipeline.detector import (
            _pack_canvas,
            _rescue_undetected_device,
        )

        _packed, canvases, imgs, masks, gi, shape, _fetch_cache = ticket
        extra = _rescue_undetected_device(
            imgs[gi], masks[gi], canvases[gi], refined, raw_mask, blk_list,
            img_shape, refine_mode,
        )
        if extra is None:
            return refined
        packed = np.asarray(jax.device_get(_pack_canvas(extra)))
        extra_host = (np.unpackbits(packed, axis=-1) * np.uint8(255))[:, : shape[1]]
        return np.where(extra_host > 0, np.uint8(255), refined)

    def process_batch(
        self,
        pages: Sequence[np.ndarray],
        refine_mode: int = C.REFINEMASK_INPAINT,
        keep_undetected_mask: bool = False,
    ) -> List[Tuple[np.ndarray, np.ndarray, list]]:
        """Run <=batch_size BGR pages; returns [(mask, mask_refined, blk_list)]."""
        return self.collect(self.submit(pages), refine_mode, keep_undetected_mask)

    def stream(
        self,
        images: Iterable[np.ndarray],
        refine_mode: int = C.REFINEMASK_INPAINT,
        keep_undetected_mask: bool = False,
        prefetch: int = 2,
    ) -> Iterator[Tuple[np.ndarray, np.ndarray, list]]:
        """Double-buffered stream: host letterboxing of batch k+1 overlaps the
        device run of batch k."""
        q: queue.Queue = queue.Queue(maxsize=prefetch)
        stop = object()
        error: List[BaseException] = []

        def producer():
            chunk: List[np.ndarray] = []
            try:
                for img in images:
                    chunk.append(img)
                    if len(chunk) == self.batch_size:
                        q.put(chunk)
                        chunk = []
                if chunk:
                    q.put(chunk)
            except BaseException as e:  # surface source errors in the consumer
                error.append(e)
            finally:
                q.put(stop)

        threading.Thread(target=producer, daemon=True).start()
        from collections import deque

        in_flight: deque = deque()
        depth = max(1, prefetch)
        while True:
            chunk = q.get()
            if chunk is stop:
                break
            in_flight.append(self.submit(chunk))
            if len(in_flight) > depth:
                yield from self.collect(in_flight.popleft(), refine_mode, keep_undetected_mask)
        while in_flight:
            yield from self.collect(in_flight.popleft(), refine_mode, keep_undetected_mask)
        if error:
            raise error[0]
