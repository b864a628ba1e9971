"""Harvest a rich English word corpus for the synthetic renderer.

The reference samples real text via trdg/pandas corpora
(/root/reference/text_rendering.py:14-16,207-249); this image has no
network egress and no dictionary package, so we harvest natural-language
words from documentation files already on disk (README/LICENSE/rst of the
installed Python packages) — thousands of real words with a natural length
distribution, versus the ~60-word builtin fallback in data/render.py.

Writes data/corpus_en.txt (one word per line, frequency-weighted by
repetition so common words appear more often in sampled text).

Run:  python scripts/build_corpus.py
"""

from __future__ import annotations

import collections
import os
import os.path as osp
import re
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))

DOC_ROOTS = ["/usr/lib/python3.12", "/opt/venv/lib/python3.12/site-packages"]
MAX_FILES = 1200
MIN_COUNT = 3
MAX_UNIQUE = 8000


def harvest() -> list[str]:
    words: collections.Counter = collections.Counter()
    pat = re.compile(r"[A-Za-z']{2,12}")
    n_files = 0
    for root in DOC_ROOTS:
        for dirpath, dirs, files in os.walk(root):
            dirs[:] = [d for d in dirs if d not in ("__pycache__", "node_modules")]
            for f in files:
                if not f.endswith((".txt", ".rst", ".md")):
                    continue
                if n_files >= MAX_FILES:
                    break
                n_files += 1
                try:
                    with open(osp.join(dirpath, f), encoding="utf8", errors="ignore") as fh:
                        for w in pat.findall(fh.read()):
                            words[w.lower()] += 1
                except OSError:
                    pass
    keep = []
    for w, c in words.most_common(MAX_UNIQUE * 2):
        if c < MIN_COUNT or not w.isalpha():
            continue
        keep.append((w, c))
        if len(keep) >= MAX_UNIQUE:
            break
    # frequency weighting: repeat common words (log-compressed) so sampled
    # text skews natural; also mix in capitalized/upper variants like real
    # comic lettering
    out = []
    for w, c in keep:
        reps = min(8, max(1, int(c ** 0.33)))
        out.extend([w] * reps)
        if reps >= 3:
            out.append(w.capitalize())
        if reps >= 5:
            out.append(w.upper())
    return out


def main() -> None:
    out_path = osp.join(ROOT, "data", "corpus_en.txt")
    words = harvest()
    with open(out_path, "w", encoding="utf8") as f:
        f.write("\n".join(words))
    uniq = len(set(words))
    print(f"wrote {out_path}: {len(words)} entries, {uniq} unique")
    if uniq < 1000:
        print("WARNING: corpus unexpectedly small", file=sys.stderr)


if __name__ == "__main__":
    main()
