#!/bin/bash
# Round-5 hardware measurement batch. Run ONLY with training paused (the
# remote TPU serializes programs; contention garbles every timing).
# Usage: scripts/hw_batch_r5.sh [tag]    (logs land in data/*_r5<tag>.log)
#
# Phase discipline: the chunk2 default flip happens BETWEEN batches — run
# `scripts/hw_batch_r5.sh gate` first (cc A/B on realistic text windows +
# the Mosaic canvas repro), flip _DEFAULT_FUSED_VARIANT if the gate says
# faster+bit-equal, then run the full `scripts/hw_batch_r5.sh b` batch.
set -u
cd "$(dirname "$0")/.."
TAG=${1:-b}
run() {
  local name=$1; shift
  echo "=== $(date +%H:%M:%S) $name ==="
  timeout 3600 "$@" > "data/${name}_r5${TAG}.log" 2>&1
  echo "rc=$? $(date +%H:%M:%S)"
}

if [ "$TAG" = "gate" ]; then
  # realistic-density glyph windows at EVERY bucket shape (the r4f
  # serpentine synth gate timed junk); diag variants already lost in r4e
  CTD_AB_CASES=text CTD_AB_VARIANTS=base,chunk2 \
    run cc_text_ab python scripts/cc_variant_ab.py
  run repro_chunk2 python scripts/repro_chunk2_canvas.py
  echo "=== gate done $(date +%H:%M:%S) ==="
  exit 0
fi

if [ "$TAG" = "b" ]; then
  # per-stage r2-vs-r4 reconciliation (VERDICT r4 item 4): same session,
  # same code, only the checkpoint changes
  run profile_page python scripts/profile_page.py
  CTD_PROFILE_CKPT=data/flagship_r2.npz run profile_page_ckpt2 python scripts/profile_page.py
  run profile_refine python scripts/profile_refine.py
fi
# headline: homog + mixed-distinct-pages in ONE metric line
run bench_homog python bench.py
# r2 comparability + sweep-style runs skip the mixed tail (time)
CTD_BENCH_CKPT=data/flagship_r2.npz CTD_BENCH_MIXED2=0 run bench_ckpt2 python bench.py
# upload wire-coding A/B on the stream where uploads are real (distinct
# pages; homog uploads content-dedupe either way): raw vs the rowdelta
# default (= bench_homog's mixed note)
CTD_UPLOAD_MODE=raw CTD_BENCH_MIXED=1 run bench_rawup_mixed python bench.py
CTD_REFINE_SLOTS_MULT=2 CTD_BENCH_MIXED2=0 run bench_slots2 python bench.py
CTD_BENCH_DEPTH=3 CTD_BENCH_MIXED2=0 run bench_depth3 python bench.py
# drift bracket: repeat the headline config so within-batch service drift
# is visible (service conditions swing ~2x between sessions, CLAUDE.md)
CTD_BENCH_MIXED2=0 run bench_homog2 python bench.py
echo "=== done $(date +%H:%M:%S) ==="
