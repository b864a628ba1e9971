"""Headline benchmark: full-pipeline pages/sec/chip at 1024px.

Runs the end-to-end TextDetector (device letterbox + 3-head net + NMS + DB
decode pixel stage on TPU; polygon/grouping/refinement on host) on the
reference example page, and compares against the measured PyTorch-reference
CPU baseline (BENCH_BASELINE.json, net-path scope — conservative: the
reference's CPU post-processing would only slow it further).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _distinct(pages: list) -> list:
    """Make every page in a (possibly cycled) stream byte-distinct by
    rolling it a page-dependent amount.  The axon transport DEDUPES
    repeated identical payloads (measured: same-buffer re-upload 2.6 GB/s
    vs 47 MB/s fresh, r4), so a stream cycling identical pages gets its
    uploads nearly for free — fiction relative to the reference driver's
    workload of distinct files.  Rolls keep the shape, the byte statistics,
    and the B==G==R grey-ness (all channels move together)."""
    return [
        np.ascontiguousarray(np.roll(p, (37 * i) % (p.shape[0] - 1) + 1, 0))
        for i, p in enumerate(pages)
    ]


def _mixed_stream(example: np.ndarray, n_pages: int) -> list:
    """Fixed-seed heterogeneous page stream: the example page + two synthetic
    renderer pages at different aspect ratios (a tall portrait and a wide
    spread), cycled to ``n_pages``.  Mirrors the reference batch driver's
    arbitrary-directory walks (reference inference.py:19-70), where page
    shapes and text densities vary within one run."""
    from comic_text_detector_tpu.data.render import ComicTextRenderer

    rng = np.random.default_rng(7)
    rend = ComicTextRenderer(seed=7, bubble_prob=0.5, blocks_per_page=(4, 10))
    synth = []
    for h, w in ((1500, 1060), (1056, 1500)):
        g = np.linspace(180, 240, h).astype(np.uint8)
        bg = np.broadcast_to(g[:, None, None], (h, w, 3)).copy()
        bg = (
            (bg.astype(np.int16) + rng.integers(-18, 18, (h, w, 1)))
            .clip(0, 255)
            .astype(np.uint8)
        )
        synth.append(rend.render_page(bg)["img"])
    cycle = [example] + synth
    return [cycle[i % len(cycle)] for i in range(n_pages)]


def main() -> None:
    os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")  # real TPU when present
    import jax

    cache_dir = os.environ.get("CTD_COMPILE_CACHE", "/root/repo/.jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from comic_text_detector_tpu.models.detector import damp_output_biases
    from comic_text_detector_tpu.pipeline import TextDetector
    from comic_text_detector_tpu.utils.io import imread

    dtype_env = os.environ.get("CTD_BENCH_DTYPE", "bf16")
    half = dtype_env in ("bf16", "bfloat16", "half")
    refine_backend = os.environ.get("CTD_BENCH_REFINE", "device")
    mask_transfer = os.environ.get("CTD_BENCH_MASK", "packed")
    if refine_backend != "device":
        mask_transfer = "grey"

    # The SHIPPING checkpoint: flagship_r4 (in-framework trained; DB head
    # val F1 0.605, promoted through scripts/eval_db_quality.py AND the
    # torch-side pad-hazard gate, scripts/check_pad_hazard.py).  The
    # cross-framework goldens stay pinned to flagship_r2 (its higher-margin
    # heads keep torch-vs-XLA conv noise away from decision thresholds;
    # tests/test_flagship_parity.py docstring) — that gates the CODE; this
    # benches the shipped ARTIFACT, like the reference benches its own
    # released model.
    ckpt = os.environ.get(
        "CTD_BENCH_CKPT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "flagship_r4.npz"),
    )
    if os.path.exists(ckpt):
        # trained-on-synthetic flagship checkpoint: realistic detection
        # counts exercise the full host+device post-processing
        det = TextDetector(
            model_path=ckpt, input_size=1024, half=half,
            refine_backend=refine_backend, mask_transfer=mask_transfer,
        )
        variables = det.variables
    else:
        det = TextDetector.random_init(
            input_size=1024, half=half,
            refine_backend=refine_backend, mask_transfer=mask_transfer,
        )
        # Random conv weights threshold into page-sized noise; damp output
        # biases so prediction sparsity matches a trained detector.
        det.variables = jax.device_put(damp_output_biases(det.variables))
        variables = det.variables
    img = imread("/root/reference/data/examples/AisazuNihaIrarenai-003.jpg")

    # --- tunnel bandwidth probe ---
    # Host->device transfer over the axon tunnel is the stream's dominant
    # byte path (1.9 MB/page grey u8) and its bandwidth swings 20 KB/s-
    # 20 MB/s between sessions (CLAUDE.md); stamping the measured rate into
    # the metric makes cross-round comparisons interpretable.  Two traps,
    # both hit in past rounds: the transport COMPRESSES (a zeros probe
    # measured 4.2 GB/s of fiction) and it DEDUPES/CACHES repeats (the r4
    # probe re-uploaded one real plane 3x and stamped 2.6-3.2 GB/s while a
    # fresh page upload in the same session measured 47 MB/s).  So every
    # rep must carry DISTINCT real-page entropy: rolled copies of the page
    # plane (same byte statistics, different bytes at every offset), and
    # the stamp is cross-checked against one timed fresh full-page upload —
    # the two must agree within 2x or the stamp is marked suspect.
    plane = np.ascontiguousarray(img[..., 0])
    jax.block_until_ready(jax.device_put(plane))  # warm the path
    rng = np.random.default_rng(12345)
    reps = [
        np.ascontiguousarray(
            np.roll(plane, (int(rng.integers(37, plane.shape[0] - 37)),
                            int(rng.integers(37, plane.shape[1] - 37))), (0, 1))
        )
        for _ in range(6)
    ]
    t0 = time.perf_counter()
    jax.block_until_ready([jax.device_put(p) for p in reps])
    tunnel_mbps = sum(p.nbytes for p in reps) / (time.perf_counter() - t0) / 1e6
    page_probe = np.ascontiguousarray(
        np.roll(img, int(rng.integers(37, img.shape[0] - 37)), 0)
    )
    t0 = time.perf_counter()
    jax.block_until_ready(jax.device_put(page_probe))
    page_mbps = page_probe.nbytes / (time.perf_counter() - t0) / 1e6
    ratio = max(tunnel_mbps, page_mbps) / max(1e-9, min(tunnel_mbps, page_mbps))
    tunnel_note = f"tunnel {tunnel_mbps:.1f} MB/s" + (
        f" (SUSPECT: page xcheck {page_mbps:.1f})" if ratio > 2.0 else ""
    )

    # --- single-page latency (p50) ---
    for _ in range(2):
        det(img)  # compile + warm
    iters = int(os.environ.get("CTD_BENCH_ITERS", "10"))
    times = []
    for rep in _distinct([img] * iters):  # dedupe-proof: see _distinct
        t0 = time.perf_counter()
        det(rep)
        times.append(time.perf_counter() - t0)
    p50_ms = float(np.median(times)) * 1e3

    # --- volume-stream throughput (the production configuration) ---
    from comic_text_detector_tpu.pipeline.batch import BatchTextDetector

    bsz = int(os.environ.get("CTD_BENCH_BATCH", "4"))
    bdet = BatchTextDetector(
        variables, batch_size=bsz, input_size=1024, half=half,
        refine_backend=refine_backend, mask_transfer=mask_transfer,
    )
    # enough pages that tunnel-bandwidth variance averages out (per-page
    # cost dropped ~4x since round 2; a short stream reads as noise)
    n_pages = bsz * int(os.environ.get("CTD_BENCH_BATCHES", "12"))
    depth = int(os.environ.get("CTD_BENCH_DEPTH", "2"))
    mixed = os.environ.get("CTD_BENCH_MIXED", "0") == "1"
    if mixed:
        # heterogeneous stream: fixed-seed renderer pages at two extra
        # aspect ratios interleaved with the example page, so refine cost,
        # bucket mix, upload bytes and detection counts vary page to page
        # (a homogeneous stream can overfit optimizations to one page's
        # window profile — VERDICT r3 weak #5)
        pages = _distinct(_mixed_stream(img, n_pages))
    else:
        pages = _distinct([img] * n_pages)
    list(bdet.stream(iter(pages[: bsz * 2]), prefetch=depth))  # compile + warm
    t0 = time.perf_counter()
    results = list(bdet.stream(iter(pages), prefetch=depth))
    stream_sec = time.perf_counter() - t0
    assert len(results) == n_pages
    pages_per_sec = n_pages / stream_sec

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json")
    vs_baseline = None
    base = None
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        vs_baseline = pages_per_sec / base["torch_cpu_net_path_pages_per_sec"]

    # --- mixed-page stream (the reference batch driver's real workload) ---
    # Reported INSIDE the one metric line so the driver records it: the
    # homogeneous headline alone hides the heterogeneous cost (VERDICT r4
    # weak #6).  Skipped when the main stream is already mixed.
    mixed_note = ""
    if not mixed and os.environ.get("CTD_BENCH_MIXED2", "1") == "1":
        mpages = _distinct(_mixed_stream(img, n_pages))
        list(bdet.stream(iter(mpages[: bsz * 2]), prefetch=depth))  # compile+warm
        t0 = time.perf_counter()
        mres = list(bdet.stream(iter(mpages), prefetch=depth))
        msec = time.perf_counter() - t0
        assert len(mres) == n_pages
        mpps = n_pages / msec
        mx = f" = {mpps / base['torch_cpu_net_path_pages_per_sec']:.1f}x" if base else ""
        mixed_note = f"; mixed {mpps:.2f} pages/s{mx}"

    print(
        json.dumps(
            {
                "metric": (
                    f"volume-stream pages/sec/chip @1024px (full pipeline, distinct-bytes stream, B={bsz}, "
                    f"{'bf16' if half else 'f32'}{', mixed pages' if mixed else ''}, "
                    f"{jax.devices()[0].device_kind}; "
                    f"single-page p50 {p50_ms:.0f} ms; "
                    f"{tunnel_note}{mixed_note})"
                ),
                "value": round(pages_per_sec, 4),
                "unit": "pages/sec",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline is not None else None,
            }
        )
    )


if __name__ == "__main__":
    main()
