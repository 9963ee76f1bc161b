"""Torch <-> flax checkpoint interop for the reference model zoo.

Users of the reference (thawro/pytorch-human-pose) have trained ``.pt``
checkpoints whose ``module.model`` payload is a torch ``state_dict`` of
HigherHRNet / ClassificationHRNet / HRNet(SPPE)
(/root/reference/src/base/trainer.py:316-340 save format,
/root/reference/src/utils/model.py:163-171 prefix conventions). This module
converts such state_dicts into this framework's flax variable trees — and
back — so reference checkpoints are drop-in loadable and checkpoints trained
here can be exported for torch tooling.

No torch import is required: a state_dict is consumed as any mapping from
dotted names to numpy-convertible arrays (``torch.load(...,
map_location="cpu")`` tensors qualify via ``np.asarray``).

Layout conventions converted:

* conv weights: torch OIHW -> flax HWIO
* transposed conv (the deconv head): torch (I, O, kH, kW), which torch applies
  as the *gradient* of a conv -> flax ``nn.ConvTranspose`` HWIO with the
  spatial taps flipped (verified equivalent to ConvTranspose2d(k4, s2, p1)
  with flax 'SAME' padding, see tests/test_torch_parity.py)
* linear: torch (O, I) -> flax (I, O)
* BatchNorm: weight/bias -> scale/bias (params); running_mean/running_var ->
  mean/var (batch_stats); num_batches_tracked has no flax counterpart
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

import numpy as np

__all__ = [
    "strip_torch_prefixes",
    "is_torch_checkpoint",
    "load_torch_state_dict",
    "variables_from_torch",
    "variables_to_torch",
    "torch_key_for",
]


def is_torch_checkpoint(path) -> bool:
    """Modern torch.save files are zip archives — cheap content sniff, so
    reference ``.pt`` checkpoints are auto-detected regardless of suffix."""
    import zipfile
    from pathlib import Path

    p = Path(path)
    return p.is_file() and zipfile.is_zipfile(p)


def load_torch_state_dict(path) -> dict[str, np.ndarray]:
    """Load a reference ``.pt`` checkpoint into a normalized numpy state_dict.

    Accepts either a bare ``state_dict`` or the reference trainer-state layout
    ``{"module": {"model": state_dict, ...}, ...}``
    (/root/reference/src/base/trainer.py:316-340); DDP/compile prefixes are
    stripped (utils/model.py:163-171). Requires torch (CPU build suffices).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "module" in ckpt and isinstance(ckpt["module"], dict):
        ckpt = ckpt["module"].get("model", ckpt["module"])
    if not isinstance(ckpt, dict):
        raise ValueError(f"unrecognized torch checkpoint payload in {path}")
    sd = {
        k: v.detach().cpu().numpy()
        for k, v in strip_torch_prefixes(ckpt).items()
        if hasattr(v, "detach")
    }
    if not sd:
        raise ValueError(f"no tensors found in torch checkpoint {path}")
    return sd

# name prefixes the reference strips when loading (utils/model.py:163-171):
# DDP wrap ("module."), torch.compile ("_orig_mod."), model wrapper ("net.")
_PREFIXES = ("module.", "_orig_mod.", "net.")


def strip_torch_prefixes(state_dict: Mapping[str, Any]) -> dict[str, Any]:
    """Remove DDP/compile/wrapper prefixes from state_dict keys (the same
    normalization the reference applies, utils/model.py:163-171)."""
    out = {}
    for key, value in state_dict.items():
        changed = True
        while changed:
            changed = False
            for p in _PREFIXES:
                if key.startswith(p):
                    key = key[len(p):]
                    changed = True
        out[key] = value
    return out


# ---------------------------------------------------------------------------
# flax path -> torch key
# ---------------------------------------------------------------------------

def _unit_child(base: str, rest: tuple[str, ...]) -> tuple[str, str]:
    """Map a residual-unit child path (cb1/cb2/cb3/downsample)/(conv|bn) to
    the torch module prefix + kind."""
    child, sub = rest[0], rest[1]
    if child == "downsample":
        # torch: downsample = Sequential(conv, bn)
        return f"{base}.downsample.{0 if sub == 'conv' else 1}", sub
    idx = {"cb1": 1, "cb2": 2, "cb3": 3}[child]
    return f"{base}.{'conv' if sub == 'conv' else 'bn'}{idx}", sub


def torch_key_for(path: tuple[str, ...]) -> tuple[str, str]:
    """Translate a flax variable path (module names only, no leaf) into the
    torch module prefix and its kind ("conv" | "deconv" | "dense" | "bn").

    The path grammar is this repo's model zoo (models/hrnet.py,
    models/higher_hrnet.py, models/classification.py); the emitted names are
    the reference's (src/keypoints/architectures/hrnet.py:127-385,
    higher_hrnet.py:7-81, src/classification/architectures/hrnet.py:7-74).
    """
    if path[0] == "backbone":
        rest = path[1:]
        if rest[0] in ("stem1", "stem2"):
            n = rest[0][-1]  # "1" | "2"
            return f"backbone.{'conv' if rest[1] == 'conv' else 'bn'}{n}", rest[1]
        if rest[0].startswith("stage"):
            s = int(rest[0][len("stage"):]) - 1  # torch stages are 0-indexed
            inner = rest[1]
            if inner.startswith("block"):
                b = int(inner[len("block"):])
                scale, unit = rest[2].split("_")  # "scale{i}_unit{j}"
                i, j = int(scale[len("scale"):]), int(unit[len("unit"):])
                base = f"backbone.stages.{s}.blocks.{2 * b}.scales_blocks.{i}.{j}"
                return _unit_child(base, rest[3:])
            if inner.startswith("fusion"):
                b = int(inner[len("fusion"):])
                base = f"backbone.stages.{s}.blocks.{2 * b + 1}.scales_fusion_layers"
                name, sub = rest[2], rest[3]
                if name.endswith("_up"):  # out{i}_in{j}_up: Sequential(conv, bn, up)
                    i, j = name[:-3].replace("out", "").split("_in")
                    return f"{base}.{i}.{j}.{0 if sub == 'conv' else 1}", sub
                # out{i}_in{j}_down{k}: Sequential of Sequential(conv, bn[, relu])
                head, k = name.split("_down")
                i, j = head.replace("out", "").split("_in")
                return f"{base}.{i}.{j}.{k}.{0 if sub == 'conv' else 1}", sub
            if inner == "transition":
                name, sub = rest[2], rest[3]
                if name == "new_branch":
                    idx = s + 1  # stage s+1 (1-indexed) has s+1 existing branches
                else:
                    idx = int(name[len("branch"):])
                base = f"backbone.stages.{s}.transition_layer.transition_blocks.{idx}"
                return f"{base}.{0 if sub == 'conv' else 1}", sub
        raise KeyError(f"unmapped backbone path: {path}")
    if path[0] == "init_heatmaps_head":
        return "init_heatmaps_head", "conv"
    if path[0].startswith("deconv"):
        d = int(path[0][len("deconv"):])
        base = f"deconv_layers.{d}"
        inner = path[1]
        if inner == "deconv":
            return f"{base}.deconv.0", "deconv"
        if inner == "deconv_bn":
            return f"{base}.deconv.1", "bn"
        if inner.startswith("resid"):
            i = int(inner[len("resid"):])
            return _unit_child(f"{base}.resid_blocks.{i}", path[2:])
        if inner == "final_conv":
            return f"{base}.final_layer", "conv"
    if path[0] == "head":  # ClassificationHead
        base = "classification_head"
        inner = path[1]
        if inner.startswith("incr"):
            i = int(inner[len("incr"):])
            return _unit_child(f"{base}.chann_incr_blocks.{i}", path[2:])
        if inner.startswith("down"):
            i = int(inner[len("down"):].split("_")[0])
            sub = "conv" if inner.endswith("_conv") else "bn"
            return f"{base}.downsample_blocks.{i}.{0 if sub == 'conv' else 1}", sub
        if inner == "final_conv":
            return f"{base}.final_conv.0", "conv"
        if inner == "final_bn":
            return f"{base}.final_conv.1", "bn"
        if inner == "classifier":
            return f"{base}.classifier", "dense"
    if path[0] == "final_conv":  # HRNetSPPE head
        return "final_conv", "conv"
    raise KeyError(f"unmapped flax path: {path}")


# ---------------------------------------------------------------------------
# leaf value transforms
# ---------------------------------------------------------------------------

def _from_torch_leaf(kind: str, leaf: str, value: np.ndarray) -> np.ndarray:
    value = np.asarray(value)
    if leaf == "kernel":
        if kind == "conv":
            return value.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        if kind == "deconv":
            # (I, O, kH, kW) gradient-of-conv weight -> flipped HWIO
            return value[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
        if kind == "dense":
            return value.transpose(1, 0)  # (O, I) -> (I, O)
    return value  # bias / bn scale / bn stats


def _to_torch_leaf(kind: str, leaf: str, value: np.ndarray) -> np.ndarray:
    value = np.asarray(value)
    if leaf == "kernel":
        if kind == "conv":
            return value.transpose(3, 2, 0, 1)
        if kind == "deconv":
            return value.transpose(2, 3, 0, 1)[:, :, ::-1, ::-1]
        if kind == "dense":
            return value.transpose(1, 0)
    return value


_PARAM_LEAF = {  # flax params leaf -> torch suffix
    "kernel": "weight", "scale": "weight", "bias": "bias",
}
_STATS_LEAF = {  # flax batch_stats leaf -> torch suffix
    "mean": "running_mean", "var": "running_var",
}


def _walk(tree: dict, visit: Callable, path: tuple = ()) -> dict:
    out = {}
    for name, value in tree.items():
        if isinstance(value, dict):
            out[name] = _walk(value, visit, path + (name,))
        else:
            out[name] = visit(path, name, value)
    return out


def variables_from_torch(
    state_dict: Mapping[str, Any], variables: dict, strict: bool = True
) -> dict:
    """Fill a flax ``{"params": ..., "batch_stats": ...}`` template (e.g. from
    ``model.init`` or ``jax.eval_shape`` thereof) with a reference torch
    state_dict's weights. Shapes are validated leaf-by-leaf.

    With ``strict=False``, missing torch keys keep the template value
    (name-intersection partial load, the reference's
    init_pretrained_weights semantics, src/base/model.py:104-129).
    """
    sd = strip_torch_prefixes(state_dict)
    used = set()

    def make_visit(leaf_map):
        def visit(path, leaf, template):
            try:
                prefix, kind = torch_key_for(path)
            except KeyError:
                if strict:
                    raise
                return template  # no torch counterpart for this module
            key = f"{prefix}.{leaf_map[leaf]}"
            if key not in sd:
                if strict:
                    raise KeyError(f"torch state_dict missing {key} (for {path})")
                return template
            value = _from_torch_leaf(kind, leaf, sd[key])
            t_shape = tuple(template.shape)
            if tuple(value.shape) != t_shape:
                if not strict:  # partial load: keep fresh init on mismatch
                    return template
                raise ValueError(
                    f"shape mismatch at {key}: torch {tuple(value.shape)} vs "
                    f"flax {t_shape}"
                )
            used.add(key)
            # template may be a concrete array or a jax.ShapeDtypeStruct
            dtype = np.dtype(getattr(template, "dtype", np.float32))
            return value.astype(dtype)
        return visit

    out = {"params": _walk(variables["params"], make_visit(_PARAM_LEAF))}
    if "batch_stats" in variables:
        out["batch_stats"] = _walk(variables["batch_stats"], make_visit(_STATS_LEAF))
    if strict:
        leftovers = {
            k for k in sd
            if k not in used and not k.endswith("num_batches_tracked")
        }
        if leftovers:
            raise KeyError(f"unconsumed torch keys: {sorted(leftovers)[:8]} ...")
    return out


def variables_to_torch(variables: dict) -> dict[str, np.ndarray]:
    """Export a flax variable tree as a reference-layout torch state_dict
    (plain numpy arrays; pass through ``torch.from_numpy`` for torch use)."""
    out: dict[str, np.ndarray] = {}

    def visit_params(path, leaf, value):
        prefix, kind = torch_key_for(path)
        out[f"{prefix}.{_PARAM_LEAF[leaf]}"] = _to_torch_leaf(kind, leaf, value)
        return value

    def visit_stats(path, leaf, value):
        prefix, kind = torch_key_for(path)
        out[f"{prefix}.{_STATS_LEAF[leaf]}"] = _to_torch_leaf(kind, leaf, value)
        return value

    _walk(variables["params"], visit_params)
    if "batch_stats" in variables:
        _walk(variables["batch_stats"], visit_stats)
    return out


# ---------------------------------------------------------------------------
# torchvision ResNet -> models.resnet.ResNet (SimpleBaseline backbone)
# ---------------------------------------------------------------------------

def resnet_variables_from_torchvision(
    state_dict: Mapping[str, Any],
) -> dict[str, dict]:
    """Convert a torchvision-format ResNet ``state_dict`` (the weights the
    reference's SimpleBaseline pulls via ``torch.hub``,
    /root/reference/src/keypoints/architectures/simple_baseline.py:17) into a
    flax variable tree for ``models.resnet.ResNet``.

    Handles every torchvision ResNet variant (resnet18..152): ``conv1``/
    ``bn1`` stem, ``layer{1-4}.{i}.conv{j}/bn{j}`` residual units,
    ``layer{L}.{i}.downsample.{0,1}`` projection shortcuts, and the ``fc``
    classifier head (mapped for ``num_classes > 0`` models; ignore it by
    loading only the subtree you need). ``num_batches_tracked`` is dropped.
    """
    params: dict = {}
    stats: dict = {}

    def put(tree: dict, path: tuple[str, ...], leaf: str, value: np.ndarray):
        node = tree
        for part in path:
            node = node.setdefault(part, {})
        node[leaf] = value

    def bn(dst_path: tuple[str, ...], src_prefix: str, leaf: str, v: np.ndarray):
        if leaf == "weight":
            put(params, dst_path, "scale", v)
        elif leaf == "bias":
            put(params, dst_path, "bias", v)
        elif leaf == "running_mean":
            put(stats, dst_path, "mean", v)
        elif leaf == "running_var":
            put(stats, dst_path, "var", v)
        elif leaf != "num_batches_tracked":
            raise KeyError(f"unrecognized BN leaf {src_prefix}.{leaf}")

    for key, raw in state_dict.items():
        v = np.asarray(raw)
        parts = key.split(".")
        if parts[0] == "conv1":
            put(params, ("conv1",), "kernel", v.transpose(2, 3, 1, 0))
        elif parts[0] == "bn1":
            bn(("bn1",), "bn1", parts[1], v)
        elif parts[0] == "fc":
            put(params, ("fc",), "kernel" if parts[1] == "weight" else "bias",
                v.T if parts[1] == "weight" else v)
        elif parts[0].startswith("layer"):
            layer, i = parts[0], f"b{parts[1]}"
            child = parts[2]
            if child.startswith("conv"):
                put(params, (layer, i, f"cb{child[4:]}", "conv"), "kernel",
                    v.transpose(2, 3, 1, 0))
            elif child.startswith("bn"):
                bn((layer, i, f"cb{child[2:]}", "bn"), key, parts[3], v)
            elif child == "downsample":  # Sequential(conv, bn) -> .0 / .1
                if parts[3] == "0":
                    put(params, (layer, i, "down", "conv"), "kernel",
                        v.transpose(2, 3, 1, 0))
                else:
                    bn((layer, i, "down", "bn"), key, parts[4], v)
            else:
                raise KeyError(f"unrecognized torchvision key {key}")
        else:
            raise KeyError(f"unrecognized torchvision key {key}")
    return {"params": params, "batch_stats": stats}


def load_torchvision_backbone(variables: dict, state_dict: Mapping[str, Any],
                              module: str = "backbone") -> dict:
    """Return a copy of SimpleBaseline ``variables`` with the ResNet
    ``module`` subtree replaced by converted torchvision weights (shape-checked
    against the initialized tree; the ``fc`` head, absent from the pose
    backbone, is ignored). Counterpart of the reference's pretrained-backbone
    construction (simple_baseline.py:17 ``resnet(..., pretrained=True)``)."""
    import jax

    conv = resnet_variables_from_torchvision(state_dict)
    out = jax.tree_util.tree_map(lambda x: x, variables)  # shallow-ish copy
    for col in ("params", "batch_stats"):
        src = dict(conv[col])
        src.pop("fc", None)
        dst = out[col][module]
        src_leaves = jax.tree_util.tree_leaves_with_path(src)
        dst_paths = {
            jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_leaves_with_path(dst)
        }
        for p, leaf in src_leaves:
            if jax.tree_util.keystr(p) not in dst_paths:
                raise KeyError(f"torchvision leaf {jax.tree_util.keystr(p)} "
                               f"not in {module} {col} tree")
        missing = dst_paths - {jax.tree_util.keystr(p) for p, _ in src_leaves}
        if missing:
            raise KeyError(f"{module} {col} leaves missing from torchvision "
                           f"state_dict: {sorted(missing)[:8]}")

        def merge(d, s):
            for k, sv in s.items():
                dv = d[k]
                if isinstance(sv, dict):
                    merge(dv, sv)
                else:
                    if tuple(dv.shape) != tuple(sv.shape):
                        raise ValueError(
                            f"shape mismatch at {k}: {dv.shape} vs {sv.shape}"
                        )
                    d[k] = np.asarray(sv, dtype=np.asarray(dv).dtype)

        dst = {k: v for k, v in dst.items()}
        merge(dst, src)
        out[col] = dict(out[col])
        out[col][module] = dst
    return out
