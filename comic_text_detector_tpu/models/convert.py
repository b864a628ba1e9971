"""PyTorch checkpoint -> JAX variables converter.

Ingests the reference checkpoint layouts (basemodel.py:211-220,
utils/export.py:23-28):

* combined deploy ckpt: ``{'blk_det': {'cfg': dict, 'weights': state_dict},
  'text_seg': state_dict, 'text_det': state_dict}``
* single-component ckpts: ``{'cfg', 'weights'}`` (yolo) or
  ``{'weights': state_dict, ...}`` (head training ckpts)

and produces flax variables ``{'params': ..., 'batch_stats': ...}`` for the
models in this package.  Weight layouts: conv OIHW->HWIO, transposed conv
(I,O,kh,kw) -> spatially-flipped HWIO; BatchNorm weight/bias/running_mean/
running_var -> scale/bias/mean/var.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Iterable, Mapping, Tuple

import numpy as np

# torch ConvTranspose2d module prefixes inside the heads (everything else 4D
# is a regular conv).  reference basemodel.py:26 (double_conv_up_c3 conv.1),
# :57 (upconv6.0), :99-102 (binarize.3/.6), :138-141 (thresh.3/.6).
_CONVT_RE = re.compile(
    r"(^|\.)((upconv\d+\.conv\.1)|(upconv6\.0)|(binarize\.[36])|(thresh\.[36]))\.weight$"
)


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _convt_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (I, O, kh, kw) -> flipped HWIO."""
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _bn_prefixes(sd: Mapping[str, Any]) -> set:
    return {k[: -len(".running_mean")] for k in sd if k.endswith(".running_mean")}


def _translate_tokens(tokens: Iterable[str]) -> Tuple[str, ...]:
    """Map torch module-path tokens to this package's linen names.

    Rules:
      model.{i} -> model_{i}          (yolo graph layers)
      m.{j}     -> m_{j}              (C3 bottlenecks / Detect convs)
      upconvK.conv.0 -> upconvK.c3; .conv.1 -> .up; .conv.2 -> .bn
      down_conv1.conv -> down_conv1.c3
      conv.N / binarize.N / thresh.N -> .../seqN  (DBHead sequentials)
      upconv6.0 -> upconv6            (bare ConvT)
    """
    toks = list(tokens)
    out = []
    i = 0
    while i < len(toks):
        t = toks[i]
        nxt = toks[i + 1] if i + 1 < len(toks) else None
        if t == "model" and nxt is not None and nxt.isdigit():
            out.append(f"model_{nxt}")
            i += 2
        elif t == "m" and nxt is not None and nxt.isdigit():
            out.append(f"m_{nxt}")
            i += 2
        elif t.startswith("upconv") and nxt == "conv":
            sub = toks[i + 2] if i + 2 < len(toks) else None
            if sub in ("0", "1", "2"):
                out.append(t)
                out.append({"0": "c3", "1": "up", "2": "bn"}[sub])
                i += 3
            elif t == "upconv6":  # Sequential(ConvT, Sigmoid): upconv6.0.weight
                out.append(t)
                i += 2  # skip the '0'
            else:
                out.append(t)
                i += 1
        elif t == "upconv6" and nxt == "0":
            out.append(t)
            i += 2
        elif t == "down_conv1" and nxt == "conv":
            out.append(t)
            out.append("c3")
            i += 2
        elif t in ("conv", "binarize", "thresh", "shortcut") and nxt is not None and nxt.isdigit():
            out.append(t)
            out.append(f"seq{nxt}")
            i += 2
        elif t == "tr" and nxt is not None and nxt.isdigit():
            out.append(f"tr_{nxt}")  # TransformerBlock stack
            i += 2
        else:
            out.append(t)
            i += 1
    return tuple(out)


def convert_state_dict(sd: Mapping[str, Any], fused_bn_eps: float = 1e-3) -> Dict[str, Dict]:
    """Convert one torch state dict into {'params': tree, 'batch_stats': tree}.

    Handles conv+bn-fused checkpoints (the reference fuses the yolo graph at
    load, models/yolov5/yolo.py:185-192): a ``X.conv.bias`` with no sibling
    ``X.bn`` means the BN was folded away — we synthesize an exact-identity
    BN (scale=1, mean=0, var=1-eps) carrying the fused bias.
    """
    params: Dict = {}
    stats: Dict = {}
    bn_pref = _bn_prefixes(sd)
    for key, val in sd.items():
        if key.endswith(".conv.bias"):
            parent = key[: -len(".conv.bias")]
            if f"{parent}.bn.weight" not in sd:
                arr = _to_np(val)
                path = _translate_tokens(parent.split("."))
                c = arr.shape[0]
                _set(params, path + ("bn", "scale"), np.ones(c, np.float32))
                _set(params, path + ("bn", "bias"), arr.astype(np.float32))
                _set(stats, path + ("bn", "mean"), np.zeros(c, np.float32))
                _set(stats, path + ("bn", "var"), np.full(c, 1.0 - fused_bn_eps, np.float32))
                continue
        if key.endswith("num_batches_tracked"):
            continue
        if key.endswith((".anchors", ".anchor_grid")) or key in ("anchors", "anchor_grid", "stride"):
            continue  # anchors/strides are static config in this package
        arr = _to_np(val)
        tokens = key.split(".")
        leaf = tokens[-1]
        prefix = ".".join(tokens[:-1])
        path = _translate_tokens(tokens[:-1])
        if prefix in bn_pref:
            if leaf == "weight":
                _set(params, path + ("scale",), arr)
            elif leaf == "bias":
                _set(params, path + ("bias",), arr)
            elif leaf == "running_mean":
                _set(stats, path + ("mean",), arr)
            elif leaf == "running_var":
                _set(stats, path + ("var",), arr)
            continue
        if leaf == "weight":
            if arr.ndim == 4:
                if _CONVT_RE.search(key):
                    _set(params, path + ("kernel",), _convt_kernel(arr))
                else:
                    _set(params, path + ("kernel",), _conv_kernel(arr))
            else:
                _set(params, path + ("kernel",), arr)
        elif leaf == "bias":
            _set(params, path + ("bias",), arr)
        elif leaf in ("in_proj_weight", "in_proj_bias"):
            # torch nn.MultiheadAttention packed projection (TransformerLayer)
            _set(params, path + (leaf,), arr)
        else:
            raise ValueError(f"unhandled torch key: {key}")
    return {"params": params, "batch_stats": stats}


def convert_combined_checkpoint(ckpt: Mapping[str, Any]) -> Tuple[Dict, dict]:
    """Convert the combined deploy checkpoint into TextDetBase variables.

    Returns (variables, yolo_cfg_dict). ``ckpt`` is the already-torch.load'ed
    dict; pass strings through :func:`load_torch_file` first.
    """
    blk = ckpt["blk_det"]
    cfg = blk.get("cfg") if isinstance(blk, Mapping) else None
    blk_sd = blk["weights"] if isinstance(blk, Mapping) and "weights" in blk else blk
    sub = {
        "blk_det": convert_state_dict(blk_sd),
        "text_seg": convert_state_dict(_unwrap(ckpt["text_seg"])),
        "text_det": convert_state_dict(_unwrap(ckpt["text_det"])),
    }
    variables = {
        "params": {k: v["params"] for k, v in sub.items()},
        "batch_stats": {k: v["batch_stats"] for k, v in sub.items()},
    }
    return variables, cfg


def _unwrap(sd: Mapping[str, Any]) -> Mapping[str, Any]:
    return sd["weights"] if isinstance(sd, Mapping) and "weights" in sd else sd


_FOLD_PAIRS = (("conv", "bn"), ("up", "bn"), ("seq0", "seq1"), ("seq3", "seq4"))


def fold_batchnorm(variables: Mapping[str, Any], yolo_roots=("blk_det", "backbone")) -> Dict:
    """Fold eval-mode BatchNorms into their preceding conv kernels/biases
    (the reference's fuse_conv_and_bn at load, utils/yolov5_utils.py:23-43 /
    TextDetBase.fuse, basemodel.py:229-237) — a pure pytree transform; the
    module structure is unchanged (BNs become exact identities).

    ``yolo_roots`` name the subtrees whose BNs use eps=1e-3 (the yolo graph,
    initialize_weights); everything else uses torch's default 1e-5.
    """
    import copy as _copy

    params = _copy.deepcopy(_to_plain(variables["params"]))
    stats = _copy.deepcopy(_to_plain(variables["batch_stats"]))

    def walk(p_node: Dict, s_node: Dict, eps: float) -> None:
        for conv_key, bn_key in _FOLD_PAIRS:
            if (
                isinstance(p_node.get(conv_key), dict)
                and "kernel" in p_node.get(conv_key, {})
                and isinstance(p_node.get(bn_key), dict)
                and "scale" in p_node.get(bn_key, {})
                and isinstance(s_node.get(bn_key), dict)
            ):
                conv = p_node[conv_key]
                bn = p_node[bn_key]
                st = s_node[bn_key]
                inv = np.asarray(bn["scale"]) / np.sqrt(np.asarray(st["var"]) + eps)
                # scale the kernel; the additive term rides the (now
                # identity-scale) BN bias — convs in this package have no
                # bias slot by construction
                conv["kernel"] = np.asarray(conv["kernel"]) * inv  # O last
                bias = np.asarray(bn["bias"]) - np.asarray(st["mean"]) * inv
                if "bias" in conv:
                    bias = bias + np.asarray(conv["bias"]) * inv
                    conv["bias"] = np.zeros_like(np.asarray(conv["bias"]), np.float32)
                bn["scale"] = np.ones_like(inv, np.float32)
                bn["bias"] = bias.astype(np.float32)
                st["mean"] = np.zeros_like(inv, np.float32)
                st["var"] = np.full_like(inv, 1.0 - eps, np.float32)
        for k, v in p_node.items():
            if isinstance(v, dict):
                walk(v, s_node.get(k, {}), eps)

    for root, p_sub in params.items():
        eps = 1e-3 if root in yolo_roots else 1e-5
        walk(p_sub, stats.get(root, {}), eps)
    return {"params": params, "batch_stats": stats}


def _to_plain(tree) -> Dict:
    if isinstance(tree, Mapping):
        return {k: _to_plain(v) for k, v in tree.items()}
    return tree


def load_torch_file(path: str) -> Any:
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def load_textdet_base_variables(path: str) -> Tuple[Dict, dict]:
    """Load a reference-format combined .pt and return TextDetBase variables."""
    return convert_combined_checkpoint(load_torch_file(path))


def load_from_parts(blk_path: str, seg_path: str, det_path: str) -> Tuple[Dict, dict]:
    """Build TextDetBase variables from the reference's three separate
    training checkpoints (yolov5 blk ckpt + unet_best.ckpt + db_best.ckpt) —
    the torch-side merge the reference does in concate_models
    (utils/export.py:23-28), done at conversion time instead.
    """
    ckpt = {
        "blk_det": load_torch_file(blk_path),
        "text_seg": load_torch_file(seg_path),
        "text_det": load_torch_file(det_path),
    }
    return convert_combined_checkpoint(ckpt)


# --- inverse conversion: variables -> torch checkpoint --------------------------
#
# Lets a checkpoint trained in THIS framework run in the reference (and
# powers same-weights golden-parity tests): the exact inverse of
# convert_state_dict / _translate_tokens.

_SEQ_PARENTS = ("conv", "binarize", "thresh", "shortcut")


def _untranslate_tokens(path: Tuple[str, ...]) -> Tuple[str, ...]:
    """flax module path -> torch module path (inverse of _translate_tokens)."""
    out = []
    for i, t in enumerate(path):
        prev = out[-1] if out else None
        if t.startswith("model_"):
            out += ["model", t[len("model_"):]]
        elif t.startswith("m_"):
            out += ["m", t[len("m_"):]]
        elif t.startswith("tr_"):
            out += ["tr", t[len("tr_"):]]
        elif t.startswith("seq") and t[3:].isdigit() and prev in _SEQ_PARENTS:
            out.append(t[3:])
        elif t == "c3" and prev == "down_conv1":
            out.append("conv")
        elif t == "c3" and prev is not None and prev.startswith("upconv"):
            out += ["conv", "0"]
        elif t == "up" and prev is not None and prev.startswith("upconv"):
            out += ["conv", "1"]
        elif t == "bn" and prev is not None and prev.startswith("upconv"):
            out += ["conv", "2"]
        elif t == "upconv6":
            # UnetHead.upconv6 = Sequential(ConvT, Sigmoid) (basemodel.py:57):
            # the bare flax ConvT maps to torch index 0 — the '.0' also makes
            # the key match _CONVT_RE so the kernel gets the ConvT layout
            out += ["upconv6", "0"]
        else:
            out.append(t)
    return tuple(out)


def _is_convt_path(torch_key: str) -> bool:
    return bool(_CONVT_RE.search(torch_key))


def export_state_dict(params: Mapping[str, Any], stats: Mapping[str, Any]) -> Dict[str, Any]:
    """One subnet's flax trees -> a torch-layout state dict (numpy values,
    incl. num_batches_tracked zeros so strict load_state_dict passes)."""
    import numpy as _np

    sd: Dict[str, Any] = {}

    def walk_params(node, path):
        for k, v in node.items():
            if isinstance(v, Mapping):
                walk_params(v, path + (k,))
                continue
            arr = _np.asarray(v)
            tpath = _untranslate_tokens(path)
            prefix = ".".join(tpath)
            if k == "kernel":
                if arr.ndim == 4:
                    key = prefix + ".weight"
                    if _is_convt_path(key):
                        # flipped HWIO -> torch (I, O, kh, kw)
                        sd[key] = _np.transpose(arr[::-1, ::-1], (2, 3, 0, 1)).copy()
                    else:
                        sd[key] = _np.transpose(arr, (3, 2, 0, 1)).copy()  # HWIO->OIHW
                else:
                    sd[prefix + ".weight"] = arr
            elif k == "scale":
                sd[prefix + ".weight"] = arr
            elif k in ("bias", "in_proj_weight", "in_proj_bias"):
                sd[prefix + ("." + k if k != "bias" else ".bias")] = arr
            else:
                raise ValueError(f"unhandled param leaf {path + (k,)}")

    def walk_stats(node, path):
        for k, v in node.items():
            if isinstance(v, Mapping):
                walk_stats(v, path + (k,))
                continue
            arr = _np.asarray(v)
            prefix = ".".join(_untranslate_tokens(path))
            if k == "mean":
                sd[prefix + ".running_mean"] = arr
            elif k == "var":
                sd[prefix + ".running_var"] = arr
                sd[prefix + ".num_batches_tracked"] = _np.asarray(0, _np.int64)
            else:
                raise ValueError(f"unhandled stats leaf {path + (k,)}")

    walk_params(_to_plain(params), ())
    walk_stats(_to_plain(stats), ())
    return sd


def export_torch_checkpoint(variables: Mapping[str, Any], cfg: dict | None = None) -> Dict[str, Any]:
    """TextDetBase variables -> the reference's combined deploy checkpoint
    (utils/export.py:23-28 layout), as torch tensors.

    The blk_det side carries the cfg yaml + the Detect ``anchors`` buffer.
    ``anchor_grid`` must NOT be emitted: the reference's Detect keeps it as a
    plain list attribute (yolo.py:18), so ``load_yolov5_ckpt``'s fresh
    ``Model(cfg).load_state_dict(weights, strict=True)`` (yolo.py:291-292)
    rejects the key.
    """
    import numpy as _np
    import torch

    from comic_text_detector_tpu.config import YOLOV5S_CFG, parse_graph

    cfg = cfg or YOLOV5S_CFG
    spec = parse_graph(cfg)
    out = {}
    for subnet in ("blk_det", "text_seg", "text_det"):
        sd = export_state_dict(variables["params"][subnet], variables["batch_stats"][subnet])
        out[subnet] = {k: torch.from_numpy(_np.ascontiguousarray(v)) for k, v in sd.items()}

    detect_idx = max(ls.index for ls in spec.layers)
    anchors = _np.asarray(spec.anchors, _np.float32).reshape(len(spec.anchors), -1, 2)
    strides = _np.asarray(spec.strides, _np.float32)
    out["blk_det"][f"model.{detect_idx}.anchors"] = torch.from_numpy(
        anchors / strides[:, None, None]
    )
    return {
        "blk_det": {"cfg": cfg, "weights": out["blk_det"]},
        "text_seg": out["text_seg"],
        "text_det": out["text_det"],
    }
