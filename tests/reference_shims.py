"""Import shims that let the reference's inference stack run on this box.

The reference (/root/reference, read-only test oracle) imports four packages
absent from this image. Only two are ever *executed* on the parity paths —
``munkres`` (replaced by scipy's independent optimal-assignment solver) and
``torchvision.transforms`` ToTensor/Normalize/Compose (re-implemented
faithfully below; any infidelity would FAIL the parity comparisons, not mask
them). ``pycocotools`` and ``albumentations`` are import-only on these paths
(used inside dataset functions the tests never call) and get raising stubs.
"""

from __future__ import annotations

import sys
import types

import numpy as np


def install_reference_shims() -> None:
    if "munkres" not in sys.modules:
        from scipy.optimize import linear_sum_assignment

        class Munkres:
            def compute(self, cost):
                rows, cols = linear_sum_assignment(np.asarray(cost))
                return list(zip(rows.tolist(), cols.tolist()))

        munkres = types.ModuleType("munkres")
        munkres.Munkres = Munkres
        sys.modules["munkres"] = munkres

    if "torchvision" not in sys.modules:
        import torch

        class ToTensor:
            def __call__(self, pic):
                arr = np.ascontiguousarray(np.asarray(pic).transpose(2, 0, 1))
                t = torch.from_numpy(arr)
                if t.dtype == torch.uint8:
                    return t.float().div_(255.0)
                return t.float()

        class Normalize:
            def __init__(self, mean, std):
                self.mean = torch.tensor(mean).view(-1, 1, 1)
                self.std = torch.tensor(std).view(-1, 1, 1)

            def __call__(self, t):
                return (t - self.mean) / self.std

        class Compose:
            def __init__(self, transforms):
                self.transforms = list(transforms)

            def __call__(self, x):
                for t in self.transforms:
                    x = t(x)
                return x

        def _stub(name):
            def fail(*a, **k):
                raise NotImplementedError(f"torchvision shim: {name} not implemented")

            return fail

        transforms = types.ModuleType("torchvision.transforms")
        transforms.ToTensor = ToTensor
        transforms.Normalize = Normalize
        transforms.Compose = Compose
        for name in ("Resize", "CenterCrop", "RandomResizedCrop", "RandomHorizontalFlip"):
            setattr(transforms, name, _stub(name))
        functional = types.ModuleType("torchvision.transforms.functional")
        transforms.functional = functional
        torchvision = types.ModuleType("torchvision")
        torchvision.transforms = transforms
        sys.modules["torchvision"] = torchvision
        sys.modules["torchvision.transforms"] = transforms
        sys.modules["torchvision.transforms.functional"] = functional

    if "natsort" not in sys.modules:
        natsort = types.ModuleType("natsort")
        natsort.natsorted = sorted
        sys.modules["natsort"] = natsort

    if "colorlog" not in sys.modules:
        import collections

        colorlog = types.ModuleType("colorlog")
        escape_mod = types.ModuleType("colorlog.escape_codes")
        # any %(name)s key resolves to an empty escape string
        escape_mod.escape_codes = collections.defaultdict(str)
        colorlog.escape_codes = escape_mod
        sys.modules["colorlog"] = colorlog
        sys.modules["colorlog.escape_codes"] = escape_mod

    if "mlflow" not in sys.modules:
        mlflow = types.ModuleType("mlflow")
        client = types.ModuleType("mlflow.client")
        entities = types.ModuleType("mlflow.entities")

        class _MlflowStub:
            def __init__(self, *a, **k):
                raise NotImplementedError("mlflow stub: not available on this box")

        client.MlflowClient = _MlflowStub
        entities.Run = _MlflowStub
        entities.Experiment = _MlflowStub
        mlflow.client = client
        mlflow.entities = entities
        mlflow.enable_system_metrics_logging = lambda *a, **k: None
        sys.modules["mlflow"] = mlflow
        sys.modules["mlflow.client"] = client
        sys.modules["mlflow.entities"] = entities

    if "torchinfo" not in sys.modules:
        torchinfo = types.ModuleType("torchinfo")
        torchinfo.summary = lambda *a, **k: "torchinfo shim"
        sys.modules["torchinfo"] = torchinfo

    for name in ("pycocotools", "pycocotools.coco", "pycocotools.mask", "albumentations"):
        if name in sys.modules:
            continue
        mod = types.ModuleType(name)

        class _Raises:
            def __init__(self, *a, **k):
                raise NotImplementedError(f"{name} stub: not available on this box")

        if name == "pycocotools.coco":
            mod.COCO = _Raises
        if name == "pycocotools":
            pass  # .mask attribute attached below
        if name == "albumentations":
            mod.Compose = _Raises
            mod.LongestMaxSize = _Raises
            mod.PadIfNeeded = _Raises
        sys.modules[name] = mod
    sys.modules["pycocotools"].coco = sys.modules["pycocotools.coco"]
    sys.modules["pycocotools"].mask = sys.modules["pycocotools.mask"]

    ref = "/root/reference"
    if ref not in sys.path:
        sys.path.insert(0, ref)
