"""CLI + config + profiling utility tests."""

import numpy as np

from comic_text_detector_tpu.utils.config import DB_DEFAULTS, SEG_DEFAULTS, deep_merge, load_hyp
from comic_text_detector_tpu.utils.profiling import StageTimer


def test_config_defaults_and_merge(tmp_path):
    hyp = load_hyp(None, kind="seg")
    assert hyp["train"]["epochs"] == 15 and hyp["data"]["imgsz"] == 1024
    merged = deep_merge(SEG_DEFAULTS, {"train": {"lr0": 0.004}})
    assert merged["train"]["lr0"] == 0.004 and merged["train"]["epochs"] == 15
    # yaml file override
    p = tmp_path / "h.yaml"
    p.write_text("train:\n  batch_size: 8\n")
    hyp2 = load_hyp(str(p), kind="db", overrides={"data": {"imgsz": 512}})
    assert hyp2["train"]["batch_size"] == 8 and hyp2["data"]["imgsz"] == 512
    assert hyp2["data"]["aug_param"]["rotate"] == 0.33


def test_cli_set_parsing():
    from comic_text_detector_tpu.cli import _parse_sets

    out = _parse_sets(["train.lr0=0.004", "data.cache=true", "data.aug_param.size_range=[0.8,1.1]"])
    assert out["train"]["lr0"] == 0.004
    assert out["data"]["cache"] is True
    assert out["data"]["aug_param"]["size_range"] == [0.8, 1.1]


def test_cli_render_and_detect(tmp_path):
    from comic_text_detector_tpu import cli
    from comic_text_detector_tpu.utils.io import imwrite

    bg = tmp_path / "bg"
    out = tmp_path / "out"
    bg.mkdir()
    imwrite(str(bg / "a.png"), np.full((256, 200, 3), 240, np.uint8))
    cli.main(["render", "--bg-dir", str(bg), "--save-dir", str(out), "--seed", "3"])
    assert (out / "a.png").exists() and (out / "mask-a.png").exists()


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2 and s["b"]["count"] == 1
    assert "a" in t.report()
