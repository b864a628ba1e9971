"""Command-line entry points (the reference has only ``__main__`` blocks;
this framework ships a proper CLI).

    python -m comic_text_detector_tpu.cli annotate  --model X.pt --img-dir D --save-dir O
    python -m comic_text_detector_tpu.cli detect    --model X.pt --image page.jpg --out-prefix o
    python -m comic_text_detector_tpu.cli train-seg --hyp hyp.yaml [--set train.lr0=0.004 ...]
    python -m comic_text_detector_tpu.cli train-db  --hyp hyp.yaml
    python -m comic_text_detector_tpu.cli render    --bg-dir D --save-dir O [--n 100]
    python -m comic_text_detector_tpu.cli export    --model X.pt --out model.stablehlo
"""

from __future__ import annotations

import argparse
import json
from typing import Dict, List


def _parse_sets(pairs: List[str]) -> Dict:
    """--set a.b.c=value (YAML-typed) into a nested override dict."""
    import yaml

    out: Dict = {}
    for pair in pairs or []:
        key, _, val = pair.partition("=")
        node = out
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = yaml.safe_load(val)
    return out


def cmd_annotate(args):
    from comic_text_detector_tpu.pipeline import model2annotations

    model2annotations(args.model, args.img_dir, args.save_dir, save_json=args.save_json,
                      input_size=args.input_size)


def cmd_detect(args):
    from comic_text_detector_tpu.pipeline import TextDetector
    from comic_text_detector_tpu.utils.io import NumpyEncoder, imread, imwrite

    det = TextDetector(args.model, input_size=args.input_size)
    img = imread(args.image)
    mask, mask_refined, blk_list = det(img, keep_undetected_mask=True)
    imwrite(args.out_prefix + "-mask.png", mask)
    imwrite(args.out_prefix + "-mask-refined.png", mask_refined)
    with open(args.out_prefix + "-blocks.json", "w", encoding="utf8") as f:
        json.dump([b.to_dict() for b in blk_list], f, ensure_ascii=False, cls=NumpyEncoder)
    print(f"{len(blk_list)} blocks -> {args.out_prefix}-*")


def cmd_train_seg(args):
    from comic_text_detector_tpu.training import seg_trainer
    from comic_text_detector_tpu.utils.config import dump_effective, load_hyp

    hyp = load_hyp(args.hyp, kind="seg", overrides=_parse_sets(args.set))
    dump_effective(hyp, hyp["data"].get("save_dir", "data") + "/training_hyp.yaml")
    seg_trainer.train(hyp, max_steps=args.max_steps)


def cmd_train_db(args):
    from comic_text_detector_tpu.training import db_trainer
    from comic_text_detector_tpu.utils.config import dump_effective, load_hyp

    hyp = load_hyp(args.hyp, kind="db", overrides=_parse_sets(args.set))
    dump_effective(hyp, hyp["data"].get("save_dir", "data") + "/training_db_hyp.yaml")
    db_trainer.train(hyp, max_steps=args.max_steps)


def cmd_render(args):
    from comic_text_detector_tpu.data.render import render_comictext

    n = render_comictext(args.bg_dir, args.save_dir, n_pages=args.n, seed=args.seed)
    print(f"rendered {n} pages -> {args.save_dir}")


def cmd_export(args):
    from comic_text_detector_tpu.export import export_stablehlo, parity_check
    from comic_text_detector_tpu.models.convert import load_textdet_base_variables

    variables, cfg = load_textdet_base_variables(args.model)
    export_stablehlo(variables, args.out, input_size=args.input_size, cfg=cfg)
    ok, diff = parity_check(variables, args.out, input_size=args.input_size, cfg=cfg)
    print(f"exported -> {args.out}; parity ok={ok} max_diff={diff:.2e}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="comic_text_detector_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    a = sub.add_parser("annotate", help="batch-annotate image dirs (label factory)")
    a.add_argument("--model", required=True)
    a.add_argument("--img-dir", required=True, nargs="+")
    a.add_argument("--save-dir", required=True)
    a.add_argument("--save-json", action="store_true")
    a.add_argument("--input-size", type=int, default=1024)
    a.set_defaults(fn=cmd_annotate)

    d = sub.add_parser("detect", help="detect text on one page")
    d.add_argument("--model", required=True)
    d.add_argument("--image", required=True)
    d.add_argument("--out-prefix", default="out")
    d.add_argument("--input-size", type=int, default=1024)
    d.set_defaults(fn=cmd_detect)

    for name, fn in (("train-seg", cmd_train_seg), ("train-db", cmd_train_db)):
        t = sub.add_parser(name)
        t.add_argument("--hyp", default=None)
        t.add_argument("--set", nargs="*", help="dotted overrides, e.g. train.lr0=0.004")
        t.add_argument("--max-steps", type=int, default=None)
        t.set_defaults(fn=fn)

    r = sub.add_parser("render", help="render synthetic training pages")
    r.add_argument("--bg-dir", required=True)
    r.add_argument("--save-dir", required=True)
    r.add_argument("--n", type=int, default=None)
    r.add_argument("--seed", type=int, default=0)
    r.set_defaults(fn=cmd_render)

    e = sub.add_parser("export", help="export StableHLO deploy artifact")
    e.add_argument("--model", required=True)
    e.add_argument("--out", required=True)
    e.add_argument("--input-size", type=int, default=1024)
    e.set_defaults(fn=cmd_export)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
