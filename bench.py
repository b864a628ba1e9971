"""Headline benchmark: full-pipeline pages/sec/chip at 1024px.

Runs the end-to-end batch pipeline (device letterbox + 3-head net + NMS + DB
decode + device mask refinement on TPU; polygon/grouping on host) and
compares against the measured PyTorch-reference CPU baseline
(BENCH_BASELINE.json, net-path scope — conservative: the reference's CPU
post-processing would only slow it further).

HEADLINE = the MIXED distinct-pages stream (r5): genuinely distinct pages at
three aspect ratios, so every page pays its real first-time upload cost and
the refine bucket mix varies page to page — the workload the reference's
batch driver actually runs (reference inference.py:19-70 walks arbitrary
directories).  The homogeneous example-page stream (the r2-r4 headline;
uploads content-dedupe on the transport, so it measures pure per-page
compute) is still measured and reported in the metric note for cross-round
comparability.  CTD_BENCH_HEADLINE=homog restores the old headline.

The baseline denominator is valid for either stream: the torch net-path
cost is content-independent (dense convs on the fixed 1024px letterbox —
every page costs the same forward), and the CPU reference pays no upload
at all, so the mixed comparison is conservative in the baseline's favor.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


# Stream honesty note (r5).  The axon transport dedupes repeated content
# with content-defined chunking: re-sending the same page is nearly free,
# and even ROLLED copies of a page dedupe (r5b measured a rolled-plane
# probe at 3.4 GB/s vs 142 MB/s for a genuinely fresh page).  There is no
# cheap way to make "the same page repeated" honest on the wire, so the
# two streams split the concern:
#   * homogeneous (headline): the example page repeated — measures per-page
#     COMPUTE throughput with content-cached uploads; comparable to the
#     r2-r4 records and the BASELINE bar.
#   * mixed: GENUINELY DISTINCT renderer pages (below) — every page's
#     bytes are first-time content, so it carries the full upload cost the
#     reference batch driver's arbitrary-directory walks pay
#     (reference inference.py:19-70).


def _mixed_stream(example: np.ndarray, n_pages: int, warm: int = 0) -> tuple:
    """(warm_pages, timed_pages): genuinely distinct synthetic pages cycling
    three shapes — the example page's, a tall portrait, and a wide spread —
    plus the real example page once.  Distinct content per page (no cycling:
    the deduping transport would strip repeated uploads, see note above).
    ``warm`` extra pages (same shape cycle, distinct content) are returned
    separately so every page-shape jit compiles OUTSIDE the timed region
    without the warm pass priming the timed pages' bytes."""
    from comic_text_detector_tpu.data.render import ComicTextRenderer

    rng = np.random.default_rng(7)
    rend = ComicTextRenderer(seed=7, bubble_prob=0.5, blocks_per_page=(4, 10))
    shapes = [example.shape[:2], (1500, 1060), (1056, 1500)]

    def make(i: int) -> np.ndarray:
        h, w = shapes[i % 3]
        lo, hi = int(rng.integers(165, 205)), int(rng.integers(220, 252))
        g = np.linspace(lo, hi, h).astype(np.uint8)
        bg = np.broadcast_to(g[:, None, None], (h, w, 3)).copy()
        bg = (
            (bg.astype(np.int16) + rng.integers(-18, 18, (h, w, 1)))
            .clip(0, 255)
            .astype(np.uint8)
        )
        return rend.render_page(bg)["img"]

    warm_pages = [make(i) for i in range(warm)]
    timed = [example] + [make(warm + i) for i in range(n_pages - 1)]
    return warm_pages, timed


def _warm_buckets(pages: list, bsz: int, refine_backend: str) -> None:
    """Pre-compile every refine bucket kernel for each distinct page shape
    in the stream (one-time, untimed — see ops/refine.py::warm_refine_buckets)."""
    if refine_backend != "device":
        return
    from comic_text_detector_tpu.ops.refine import warm_refine_buckets

    for shape in {p.shape[:2] for p in pages}:
        warm_refine_buckets(shape, p=bsz)


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

    # The SHIPPING checkpoint: flagship_r2 — the only artifact that passes
    # the FULL promotion gate (speck + eval + pad + cross-framework parity
    # goldens).  The round-5 audit found flagship_r4 fails 5 parity goldens
    # (bright-page speck storm, data/parity_r4_r5.log) and every epoch of
    # the r5 retrain fires hundreds of letterbox-pad lines through the
    # torch export (data/pad_sweep_r5.log) — higher-F1 but unshippable
    # under the gates.  Checkpoint speed deltas measured within session
    # noise across three same-batch A/Bs (BENCH_HISTORY r4e/r5c/r5d), so
    # benching the golden-gated artifact costs nothing real.
    ckpt = os.environ.get(
        "CTD_BENCH_CKPT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "flagship_r2.npz"),
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
    # r5 probe design: content-derived reps (rolls included — the chunking
    # is content-defined) dedupe and stamp fiction.  Two honest numbers:
    #   floor  — fresh random bytes per rep: incompressible, undedupable;
    #            the transport's worst-case rate.
    #   page   — ONE first-time upload of the raw example page (nothing has
    #            sent these interleaved bytes yet this process): the
    #            real-page rate including legitimate compression gains.
    # Warm the transfer path with a small random buffer (never page bytes —
    # anything sent now is 'seen' by the dedupe).
    rng = np.random.default_rng(12345)
    jax.block_until_ready(jax.device_put(rng.integers(0, 256, (256, 256), np.uint8)))
    plane_shape = img.shape[:2]
    floors = []
    for _ in range(4):
        buf = rng.integers(0, 256, plane_shape, np.uint8)
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(buf))
        floors.append(buf.nbytes / (time.perf_counter() - t0) / 1e6)
    floor_mbps = float(np.median(floors))
    t0 = time.perf_counter()
    jax.block_until_ready(jax.device_put(img))
    page_mbps = img.nbytes / (time.perf_counter() - t0) / 1e6
    # a page rate far above the incompressible floor means the 'fresh' page
    # wasn't fresh after all (cached earlier in the process) — flag it
    tunnel_note = f"tunnel page {page_mbps:.1f} MB/s (random floor {floor_mbps:.1f})" + (
        " SUSPECT" if page_mbps > 20 * floor_mbps else ""
    )

    # --- single-page latency (p50) ---
    for _ in range(2):
        det(img)  # compile + warm
    iters = int(os.environ.get("CTD_BENCH_ITERS", "10"))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        det(img)
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
        warm_pages, pages = _mixed_stream(img, n_pages, warm=bsz * 3)
        _warm_buckets(pages, bsz, refine_backend)
    else:
        pages = [img] * n_pages
        warm_pages = pages[: bsz * 2]
    list(bdet.stream(iter(warm_pages), prefetch=depth))  # compile + warm
    t0 = time.perf_counter()
    results = list(bdet.stream(iter(pages), prefetch=depth))
    stream_sec = time.perf_counter() - t0
    assert len(results) == n_pages
    pages_per_sec = n_pages / stream_sec

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json")
    base = None
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)

    # --- mixed-page stream (the reference batch driver's real workload) ---
    # The r5 HEADLINE (see module docstring); the homogeneous number above
    # rides in the metric note for r2-r4 comparability.  Skipped when the
    # main stream is already mixed (CTD_BENCH_MIXED=1).
    headline = os.environ.get("CTD_BENCH_HEADLINE", "mixed")
    mpps = None
    if not mixed and os.environ.get("CTD_BENCH_MIXED2", "1") == "1":
        mwarm, mpages = _mixed_stream(img, n_pages, warm=bsz * 3)
        _warm_buckets(mpages, bsz, refine_backend)
        list(bdet.stream(iter(mwarm), prefetch=depth))  # compile+warm
        t0 = time.perf_counter()
        mres = list(bdet.stream(iter(mpages), prefetch=depth))
        msec = time.perf_counter() - t0
        assert len(mres) == n_pages
        mpps = n_pages / msec
    elif mixed:
        mpps = pages_per_sec

    homog_pps = None if mixed else pages_per_sec
    if headline == "mixed" and mpps is not None:
        value, kind = mpps, "mixed distinct pages"
        note_pps, note_kind = homog_pps, "homogeneous example-page"
    else:
        value, kind = pages_per_sec, ("mixed distinct pages" if mixed else "homogeneous example-page")
        note_pps, note_kind = mpps if not mixed else None, "mixed distinct pages"
    vs = None
    other_note = ""
    if base is not None:
        vs = value / base["torch_cpu_net_path_pages_per_sec"]
        if note_pps is not None:
            ox = note_pps / base["torch_cpu_net_path_pages_per_sec"]
            other_note = f"; {note_kind} {note_pps:.2f} pages/s = {ox:.1f}x"
    elif note_pps is not None:
        other_note = f"; {note_kind} {note_pps:.2f} pages/s"

    print(
        json.dumps(
            {
                "metric": (
                    f"volume-stream pages/sec/chip @1024px (full pipeline, {kind}, "
                    f"ckpt={os.path.basename(ckpt) if os.path.exists(ckpt) else 'random'}, "
                    f"B={bsz}, {'bf16' if half else 'f32'}, "
                    f"{jax.devices()[0].device_kind}; "
                    f"single-page p50 {p50_ms:.0f} ms; "
                    f"{tunnel_note}{other_note})"
                ),
                "value": round(value, 4),
                "unit": "pages/sec",
                "vs_baseline": round(vs, 2) if vs is not None else None,
            }
        )
    )


if __name__ == "__main__":
    main()
