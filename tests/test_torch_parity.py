"""Cross-framework forward parity against the ACTUAL reference implementation.

The strongest AP-parity evidence available without COCO data on this box: the
reference's torch models (instantiated read-only from /root/reference, CPU
torch) are given random weights, those exact weights are converted into this
framework's flax trees (utils/torch_interop.py), and the forward passes are
compared numerically. This pins every conv/BN/fusion/transition/deconv wiring
decision to the reference, not just param counts.

Reference modules exercised:
  /root/reference/src/keypoints/architectures/hrnet.py (backbone, SPPE head)
  /root/reference/src/keypoints/architectures/higher_hrnet.py
  /root/reference/src/classification/architectures/hrnet.py

The reference code is imported as a test oracle only — nothing from it ships.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not (REFERENCE / "src").exists(), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def ref():
    """Import the reference architectures (read-only oracle)."""
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    import src.classification.architectures.hrnet as cls_hrnet
    import src.keypoints.architectures.higher_hrnet as higher_hrnet
    import src.keypoints.architectures.hrnet as kpts_hrnet

    class NS:
        HigherHRNet = higher_hrnet.HigherHRNet
        HRNet = kpts_hrnet.HRNet
        ClassificationHRNet = cls_hrnet.ClassificationHRNet

    return NS


def randomize_(net: "torch.nn.Module", seed: int) -> None:
    """Random weights everywhere — incl. BN scale/bias and running stats —
    so a swapped mapping (e.g. mean<->var, scale<->bias) cannot hide behind
    torch's (1, 0) BN defaults."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        sd = net.state_dict()
        for key, value in sd.items():
            if value.dtype.is_floating_point:
                value.copy_(0.3 * torch.randn(value.shape, generator=g))
            if key.endswith("running_var"):
                value.copy_(0.5 + torch.rand(value.shape, generator=g))
        net.load_state_dict(sd)


def to_flax(net, model, x_nchw: np.ndarray):
    """Convert the torch net's weights into `model`'s variable tree and run
    the flax forward on the same input (NHWC)."""
    import jax

    from human_pose_tpu.utils.torch_interop import variables_from_torch

    x = np.transpose(x_nchw, (0, 2, 3, 1))
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), np.zeros_like(x), train=False)
    )
    variables = variables_from_torch(
        {k: v.numpy() for k, v in net.state_dict().items()}, dict(template)
    )
    return model.apply(variables, x, train=False)


def max_rel_err(a: np.ndarray, b: np.ndarray) -> float:
    scale = max(np.abs(b).max(), 1e-3)
    return float(np.abs(a - b).max() / scale)


def test_higher_hrnet_forward_parity(ref):
    """Full-depth HigherHRNet-W32: flax forward == reference torch forward on
    identical random weights (reference higher_hrnet.py:47-81)."""
    from human_pose_tpu.models import HigherHRNet

    net = ref.HigherHRNet(num_kpts=17, C=32).eval()
    randomize_(net, seed=1)
    x_t = torch.randn(1, 3, 64, 64, generator=torch.Generator().manual_seed(2))
    with torch.no_grad():
        hms_t, tags_t = net(x_t)

    model = HigherHRNet(num_kpts=17, C=32, s2d=False)
    hms_j, tags_j = to_flax(net, model, x_t.numpy())

    assert len(hms_j) == len(hms_t) == 2
    for stage, (hj, ht) in enumerate(zip(hms_j, hms_t)):
        ht = ht.numpy().transpose(0, 2, 3, 1)
        assert hj.shape == ht.shape
        assert max_rel_err(np.asarray(hj), ht) < 2e-4, f"stage {stage}"
    tt = tags_t.numpy().transpose(0, 2, 3, 1)
    assert max_rel_err(np.asarray(tags_j), tt) < 2e-4


def test_higher_hrnet_parity_s2d_layout(ref):
    """The space-to-depth compute layout consumes the SAME converted torch
    weights and still matches the reference (checkpoint interchange claim)."""
    from human_pose_tpu.models import HigherHRNet

    net = ref.HigherHRNet(num_kpts=17, C=32).eval()
    randomize_(net, seed=5)
    x_t = torch.randn(1, 3, 64, 64, generator=torch.Generator().manual_seed(6))
    with torch.no_grad():
        hms_t, _ = net(x_t)

    model = HigherHRNet(num_kpts=17, C=32, s2d=True)
    hms_j, _ = to_flax(net, model, x_t.numpy())
    for hj, ht in zip(hms_j, hms_t):
        assert max_rel_err(np.asarray(hj), ht.numpy().transpose(0, 2, 3, 1)) < 2e-4


def test_classification_hrnet_forward_parity(ref):
    """ClassificationHRNet-W32 logits parity (reference
    src/classification/architectures/hrnet.py:7-74)."""
    from human_pose_tpu.models import ClassificationHRNet

    net = ref.ClassificationHRNet(C=32, num_classes=1000).eval()
    randomize_(net, seed=3)
    x_t = torch.randn(1, 3, 64, 64, generator=torch.Generator().manual_seed(4))
    with torch.no_grad():
        logits_t = net(x_t).numpy()

    model = ClassificationHRNet(C=32, num_classes=1000)
    logits_j = np.asarray(to_flax(net, model, x_t.numpy()))
    assert logits_j.shape == logits_t.shape
    assert max_rel_err(logits_j, logits_t) < 2e-4


def test_sppe_hrnet_forward_parity(ref):
    """HRNet SPPE head parity (reference hrnet.py:388-400): single-scale
    backbone + 1x1 conv + channel softmax."""
    from human_pose_tpu.models import HRNetSPPE

    net = ref.HRNet(num_keypoints=17, C=32).eval()
    randomize_(net, seed=7)
    x_t = torch.randn(1, 3, 64, 64, generator=torch.Generator().manual_seed(8))
    with torch.no_grad():
        (hms_t,) = net(x_t)

    model = HRNetSPPE(num_keypoints=17, C=32)
    (hms_j,) = to_flax(net, model, x_t.numpy())
    ht = hms_t.numpy().transpose(0, 2, 3, 1)
    assert hms_j.shape == ht.shape
    assert max_rel_err(np.asarray(hms_j), ht) < 2e-4


def test_roundtrip_export(ref):
    """variables_to_torch inverts variables_from_torch exactly (so checkpoints
    trained here can go back to torch tooling)."""
    import jax

    from human_pose_tpu.models import HigherHRNet
    from human_pose_tpu.utils.torch_interop import (
        variables_from_torch,
        variables_to_torch,
    )

    net = ref.HigherHRNet(num_kpts=17, C=32)
    randomize_(net, seed=9)
    sd = {k: v.numpy() for k, v in net.state_dict().items()}

    model = HigherHRNet(num_kpts=17, C=32)
    template = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32), train=False
        )
    )
    variables = variables_from_torch(sd, dict(template))
    back = variables_to_torch(variables)
    for key, value in sd.items():
        if key.endswith("num_batches_tracked"):
            assert key not in back  # no flax counterpart
            continue
        np.testing.assert_array_equal(back[key], value, err_msg=key)


def test_ddp_prefix_stripping(ref):
    """Reference checkpoints may carry module./_orig_mod./net. prefixes
    (utils/model.py:163-171) — conversion must accept them unchanged."""
    import jax

    from human_pose_tpu.models import ClassificationHRNet
    from human_pose_tpu.utils.torch_interop import variables_from_torch

    net = ref.ClassificationHRNet(C=32, num_classes=10)
    sd = {f"module.net.{k}": v.numpy() for k, v in net.state_dict().items()}
    model = ClassificationHRNet(C=32, num_classes=10)
    template = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32), train=False
        )
    )
    variables = variables_from_torch(sd, dict(template))
    kernel = variables["params"]["backbone"]["stem1"]["conv"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(kernel),
        net.state_dict()["backbone.conv1.weight"].numpy().transpose(2, 3, 1, 0),
    )


def test_load_reference_pt_checkpoint_end_to_end(ref, tmp_path):
    """A reference trainer-format .pt file (torch.save of
    {"module": {"model": state_dict}}, src/base/trainer.py:316-340) loads
    through BOTH product paths: the inference loader (full weights + BN
    stats) and the pretrained partial loader."""
    import jax
    import numpy as np

    from human_pose_tpu.inference.models import load_variables_from_ckpt
    from human_pose_tpu.models import ClassificationHRNet
    from human_pose_tpu.train.checkpoint import load_params_partial

    net = ref.ClassificationHRNet(C=32, num_classes=10).eval()
    randomize_(net, seed=11)
    pt = tmp_path / "last.pt"
    torch.save({"module": {"model": net.state_dict()}, "epoch": 3}, pt)

    model = ClassificationHRNet(C=32, num_classes=10)
    variables = load_variables_from_ckpt(model, str(pt), input_shape=(64, 64, 3))
    x_t = torch.randn(1, 3, 64, 64, generator=torch.Generator().manual_seed(12))
    with torch.no_grad():
        logits_t = net(x_t).numpy()
    logits_j = np.asarray(
        model.apply(variables, x_t.numpy().transpose(0, 2, 3, 1), train=False)
    )
    assert max_rel_err(logits_j, logits_t) < 2e-4

    # partial path: backbone weights land, the head keeps its fresh init when
    # shapes differ (here: same model, so everything matches)
    fresh = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32), train=False
        )
    )
    params = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), fresh["params"]
    )
    loaded = load_params_partial(params, str(pt))
    got = np.asarray(loaded["backbone"]["stem1"]["conv"]["kernel"])
    want = net.state_dict()["backbone.conv1.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want)


# ---------------------------------------------------------------------------
# torchvision ResNet backbone weights -> SimpleBaseline (VERDICT r3 #6)
# ---------------------------------------------------------------------------

def _ref_resnet(variant: str):
    """Instantiate the reference's torchvision-style ResNet (the same
    architecture torch.hub serves to the reference's SimpleBaseline,
    src/keypoints/architectures/simple_baseline.py:17); its state_dict keys
    match torchvision's exactly (conv1/bn1/layer{1-4}.{i}.conv{j}/downsample/fc)."""
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    import src.base.architectures.backbones.resnet as rn

    block, layers = {
        "resnet18": (rn.BasicBlock, [2, 2, 2, 2]),
        "resnet50": (rn.Bottleneck, [3, 4, 6, 3]),
    }[variant]
    return rn.ResNet(block, layers, num_classes=1000)


@pytest.mark.parametrize("variant", ["resnet18", "resnet50"])
def test_torchvision_resnet_backbone_forward_parity(variant):
    """Converted torchvision-format weights reproduce the torch backbone's
    feature map (stem + layer1..4, the part SimpleBaseline consumes)."""
    from human_pose_tpu.models.resnet import ResNet
    from human_pose_tpu.utils.torch_interop import (
        resnet_variables_from_torchvision,
    )

    net = _ref_resnet(variant).eval()
    randomize_(net, seed=11)
    x_t = torch.randn(1, 3, 32, 32, generator=torch.Generator().manual_seed(3))
    with torch.no_grad():
        f = net.maxpool(net.relu(net.bn1(net.conv1(x_t))))
        for layer in (net.layer1, net.layer2, net.layer3, net.layer4):
            f = layer(f)

    conv = resnet_variables_from_torchvision(
        {k: v.numpy() for k, v in net.state_dict().items()}
    )
    conv["params"].pop("fc")
    model = ResNet(variant)
    out = model.apply(conv, np.transpose(x_t.numpy(), (0, 2, 3, 1)), train=False)
    ft = f.numpy().transpose(0, 2, 3, 1)
    assert out.shape == ft.shape
    assert max_rel_err(np.asarray(out), ft) < 2e-4


def test_simple_baseline_loads_torchvision_backbone():
    """End-to-end closure of the reference's pretrained-backbone path: a
    torchvision-format resnet50 state_dict loads into SimpleBaseline's
    backbone subtree (shape-checked, fc ignored) and changes the forward."""
    import jax

    from human_pose_tpu.models.simple_baseline import SimpleBaseline
    from human_pose_tpu.utils.torch_interop import load_torchvision_backbone

    net = _ref_resnet("resnet50").eval()
    randomize_(net, seed=12)
    sd = {k: v.numpy() for k, v in net.state_dict().items()}

    model = SimpleBaseline(num_kpts=17, backbone="resnet50")
    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    loaded = load_torchvision_backbone(variables, sd)

    # backbone leaves actually replaced; head leaves untouched
    before = jax.tree_util.tree_leaves(variables["params"]["backbone"])
    after = jax.tree_util.tree_leaves(loaded["params"]["backbone"])
    assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-3
               for a, b in zip(after, before))
    np.testing.assert_array_equal(
        np.asarray(loaded["params"]["final"]["kernel"]),
        np.asarray(variables["params"]["final"]["kernel"]),
    )
    # converted backbone reproduces the torch features through SimpleBaseline
    with torch.no_grad():
        x_t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        f = net.maxpool(net.relu(net.bn1(net.conv1(x_t))))
        for layer in (net.layer1, net.layer2, net.layer3, net.layer4):
            f = layer(f)
    hms = model.apply(loaded, x, train=False)[0]
    assert hms.shape == (1, 16, 16, 17)
    # and the backbone subtree alone matches torch numerically
    from human_pose_tpu.models.resnet import ResNet

    bb = {
        "params": loaded["params"]["backbone"],
        "batch_stats": loaded["batch_stats"]["backbone"],
    }
    out_bb = ResNet("resnet50").apply(bb, x, train=False)
    assert max_rel_err(np.asarray(out_bb), f.numpy().transpose(0, 2, 3, 1)) < 2e-4
