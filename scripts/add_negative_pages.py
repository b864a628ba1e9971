"""Inject textless (pure-negative) pages into the r5 DB training set.

The r4/r5 DB heads hallucinate confident speck lines on bright sparse pages
(scripts/check_speck_hazard.py).  Every r5 training page contains text, so
the only supervision against those false positives is batch-level OHEM
picking them as hard negatives on TEXTY pages; pages that are entirely
empty never occur.  This adds ~10% textless extended-background pages
(near-flat bright, stripes, screentone — the exact hazard families) with
empty `line-*.txt` annotations: the loss needs no change because OHEM is
computed over the whole batch (a textless page's speck pixels become the
batch's hardest negatives whenever any other page supplies positives).

Run once mid-retrain (the chunk driver re-globs the dataset each chunk):
    python scripts/add_negative_pages.py [n_pages]
Idempotent: skips if neg_bg pages already exist.
"""

from __future__ import annotations

import os
import os.path as osp
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    sys.path.insert(0, osp.join(ROOT, "scripts"))
    from train_flagship import make_backgrounds

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 250
    work = os.environ.get("CTD_DB_WORK", osp.join(ROOT, "data", "db_work_r5"))
    train = osp.join(work, "train")
    if not osp.isdir(train):
        print(f"no train dir at {train}")
        return 1
    existing = [f for f in os.listdir(train) if f.startswith("neg_bg")]
    if existing:
        print(f"{len(existing)} neg_bg files already present; nothing to do")
        return 0
    tmp = osp.join(work, "bg_neg")
    make_backgrounds(tmp, n, seed=71, extended=True)
    added = 0
    for f in sorted(os.listdir(tmp)):
        stem, ext = osp.splitext(f)
        dst = f"neg_{stem}{ext}"
        os.replace(osp.join(tmp, f), osp.join(train, dst))
        with open(osp.join(train, f"line-neg_{stem}.txt"), "w"):
            pass  # empty = zero text polygons
        added += 1
    print(f"added {added} textless pages to {train}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
