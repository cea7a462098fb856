"""Numerical tests for the torch→flax pretrained-weight converters.

VERDICT item 2: the FID InceptionV3 converter
(``multivae_tpu/metrics/fids/inception_networks.py``) and the PolyMNIST
classifier converter (``multivae_tpu/metrics/classifiers/mmnist.py``) must be
proven numerically against real torch modules, not just shape-checked.

torchvision is not installed in this image, so the FID-variant InceptionV3
is re-built here in plain ``torch.nn`` with the exact torchvision module /
parameter naming (state_dict keys like ``Mixed_5b.branch1x1.conv.weight``)
and the pytorch-fid pool-branch patches the reference applies
(``/root/reference/src/multivae/metrics/fids/inception_networks.py:167-357``:
``count_include_pad=False`` average pooling in the A/C/E1 blocks, MAX pooling
in the second E block). Every parameter and BN running statistic is
randomized, the state_dict is converted, and the torch and flax embeddings
must agree.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
from torch import nn  # noqa: E402
from torch.nn import functional as F  # noqa: E402


# --------------------------------------------------------------------- torch
class _ConvBN(nn.Module):
    """torchvision BasicConv2d: bias-free conv + BN(eps=1e-3) + relu."""

    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = nn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avg33(x):
    return F.avg_pool2d(x, kernel_size=3, stride=1, padding=1,
                        count_include_pad=False)


class _BlockA(nn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = _ConvBN(cin, 64, kernel_size=1)
        self.branch5x5_1 = _ConvBN(cin, 48, kernel_size=1)
        self.branch5x5_2 = _ConvBN(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = _ConvBN(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = _ConvBN(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _ConvBN(96, 96, kernel_size=3, padding=1)
        self.branch_pool = _ConvBN(cin, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(_avg33(x))
        return torch.cat([b1, b5, bd, bp], 1)


class _BlockB(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = _ConvBN(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = _ConvBN(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = _ConvBN(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _ConvBN(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = F.max_pool2d(x, kernel_size=3, stride=2)
        return torch.cat([b3, bd, bp], 1)


class _BlockC(nn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = _ConvBN(cin, 192, kernel_size=1)
        self.branch7x7_1 = _ConvBN(cin, c7, kernel_size=1)
        self.branch7x7_2 = _ConvBN(c7, c7, kernel_size=(1, 7),
                                   padding=(0, 3))
        self.branch7x7_3 = _ConvBN(c7, 192, kernel_size=(7, 1),
                                   padding=(3, 0))
        self.branch7x7dbl_1 = _ConvBN(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = _ConvBN(c7, c7, kernel_size=(7, 1),
                                      padding=(3, 0))
        self.branch7x7dbl_3 = _ConvBN(c7, c7, kernel_size=(1, 7),
                                      padding=(0, 3))
        self.branch7x7dbl_4 = _ConvBN(c7, c7, kernel_size=(7, 1),
                                      padding=(3, 0))
        self.branch7x7dbl_5 = _ConvBN(c7, 192, kernel_size=(1, 7),
                                      padding=(0, 3))
        self.branch_pool = _ConvBN(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_1(x)
        bd = self.branch7x7dbl_3(self.branch7x7dbl_2(bd))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(bd))
        bp = self.branch_pool(_avg33(x))
        return torch.cat([b1, b7, bd, bp], 1)


class _BlockD(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = _ConvBN(cin, 192, kernel_size=1)
        self.branch3x3_2 = _ConvBN(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = _ConvBN(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = _ConvBN(192, 192, kernel_size=(1, 7),
                                     padding=(0, 3))
        self.branch7x7x3_3 = _ConvBN(192, 192, kernel_size=(7, 1),
                                     padding=(3, 0))
        self.branch7x7x3_4 = _ConvBN(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(
            self.branch7x7x3_2(self.branch7x7x3_1(x))))
        bp = F.max_pool2d(x, kernel_size=3, stride=2)
        return torch.cat([b3, b7, bp], 1)


class _BlockE(nn.Module):
    def __init__(self, cin, pool: str):
        super().__init__()
        self.pool = pool
        self.branch1x1 = _ConvBN(cin, 320, kernel_size=1)
        self.branch3x3_1 = _ConvBN(cin, 384, kernel_size=1)
        self.branch3x3_2a = _ConvBN(384, 384, kernel_size=(1, 3),
                                    padding=(0, 1))
        self.branch3x3_2b = _ConvBN(384, 384, kernel_size=(3, 1),
                                    padding=(1, 0))
        self.branch3x3dbl_1 = _ConvBN(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = _ConvBN(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = _ConvBN(384, 384, kernel_size=(1, 3),
                                       padding=(0, 1))
        self.branch3x3dbl_3b = _ConvBN(384, 384, kernel_size=(3, 1),
                                       padding=(1, 0))
        self.branch_pool = _ConvBN(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        if self.pool == "max":  # FIDInceptionE_2 (reference :294-322)
            bp = F.max_pool2d(x, kernel_size=3, stride=1, padding=1)
        else:  # FIDInceptionE_1 (reference :259-292)
            bp = _avg33(x)
        bp = self.branch_pool(bp)
        return torch.cat([b1, b3, bd, bp], 1)


class _TorchFIDInception(nn.Module):
    """FID InceptionV3 feature extractor, torchvision naming, random init."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = _ConvBN(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = _ConvBN(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = _ConvBN(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = _ConvBN(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = _ConvBN(80, 192, kernel_size=3)
        self.Mixed_5b = _BlockA(192, 32)
        self.Mixed_5c = _BlockA(256, 64)
        self.Mixed_5d = _BlockA(288, 64)
        self.Mixed_6a = _BlockB(288)
        self.Mixed_6b = _BlockC(768, 128)
        self.Mixed_6c = _BlockC(768, 160)
        self.Mixed_6d = _BlockC(768, 160)
        self.Mixed_6e = _BlockC(768, 192)
        self.Mixed_7a = _BlockD(768)
        self.Mixed_7b = _BlockE(1280, pool="avg")
        self.Mixed_7c = _BlockE(2048, pool="max")
        # The classifier head exists in the real checkpoint but is unused by
        # FID; keep one so the converter's fc-skipping path is exercised.
        self.fc = nn.Linear(2048, 1008)

    def forward(self, x):
        """Reference wrapper forward (``inception_networks.py:110-165``):
        block0..3 up to the 2048-d pooled features, with the wrapper's
        [0,1]→[-1,1] normalization."""
        h = 2.0 * x - 1.0
        h = self.Conv2d_1a_3x3(h)
        h = self.Conv2d_2a_3x3(h)
        h = self.Conv2d_2b_3x3(h)
        h = F.max_pool2d(h, kernel_size=3, stride=2)
        h = self.Conv2d_3b_1x1(h)
        h = self.Conv2d_4a_3x3(h)
        h = F.max_pool2d(h, kernel_size=3, stride=2)
        for block in (self.Mixed_5b, self.Mixed_5c, self.Mixed_5d,
                      self.Mixed_6a, self.Mixed_6b, self.Mixed_6c,
                      self.Mixed_6d, self.Mixed_6e, self.Mixed_7a,
                      self.Mixed_7b, self.Mixed_7c):
            h = block(h)
        h = F.adaptive_avg_pool2d(h, (1, 1))
        return h.flatten(1)


def _build_torch_fid_inception(seed: int = 0):
    """Random-weights FID inception with randomized BN statistics/affines so
    the conversion of every tensor kind is exercised (conv kernels keep
    torch's default per-layer kaiming init)."""
    torch.manual_seed(seed)
    net = _TorchFIDInception()
    g = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for name, buf in net.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(0.1 * torch.randn(buf.shape, generator=g))
            elif name.endswith("running_var"):
                buf.copy_(0.5 + torch.rand(buf.shape, generator=g))
        for name, p in net.named_parameters():
            if ".bn.weight" in name:
                p.copy_(0.5 + torch.rand(p.shape, generator=g))
            elif ".bn.bias" in name:
                p.copy_(0.1 * torch.randn(p.shape, generator=g))
    return net.eval()


@pytest.mark.slow
def test_fid_inception_converter_matches_torch():
    """convert_torch_state_dict: flax embeddings == torch embeddings.

    Uses a reduced input size (inception is fully convolutional above the
    minimum) to keep the test fast; the architecture/conversion agreement it
    proves is size-independent.
    """
    from multivae_tpu.metrics.fids.inception_networks import (
        InceptionV3FID, convert_torch_state_dict)

    net = _build_torch_fid_inception(seed=0)
    rng = np.random.default_rng(1)
    x = rng.uniform(size=(2, 3, 128, 128)).astype(np.float32)

    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()

    state_dict = {k: v.numpy() for k, v in net.state_dict().items()}
    variables = convert_torch_state_dict(state_dict)
    got = np.asarray(
        InceptionV3FID().apply(variables, jnp.asarray(x))["embedding"])

    assert got.shape == want.shape == (2, 2048)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_fid_wrapper_roundtrip_msgpack(tmp_path):
    """wrapper_inception loads msgpack'd converted weights and matches."""
    from flax import serialization

    from multivae_tpu.metrics.fids.inception_networks import (
        convert_torch_state_dict, wrapper_inception)

    net = _build_torch_fid_inception(seed=2)
    state_dict = {k: v.numpy() for k, v in net.state_dict().items()}
    variables = convert_torch_state_dict(state_dict)
    path = tmp_path / "fid_weights.msgpack"
    path.write_bytes(serialization.msgpack_serialize(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}))

    embed = wrapper_inception(path_weights=str(path))
    rng = np.random.default_rng(3)
    x = rng.uniform(size=(1, 3, 128, 128)).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()
    got = np.asarray(embed(x)["embedding"])
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------- classifier
def _build_torch_polymnist_classifier(seed: int = 0):
    """Torch replica of the reference PolyMNIST classifier
    (``/root/reference/src/multivae/metrics/classifiers/mmnist.py:14-45``):
    Sequential(Conv2d, Dropout2d, ReLU, Conv2d, Dropout2d, ReLU, Flatten,
    Linear(980,128), Dropout, ReLU, Linear(128,10)) under the name
    ``encoder`` — so the state_dict keys are encoder.{0,3,7,10}.*."""
    torch.manual_seed(seed)

    class Replica(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = nn.Sequential(
                nn.Conv2d(3, 10, kernel_size=4, stride=2, padding=1),
                nn.Dropout2d(0.5),
                nn.ReLU(),
                nn.Conv2d(10, 20, kernel_size=4, stride=2, padding=1),
                nn.Dropout2d(0.5),
                nn.ReLU(),
                nn.Flatten(),
                nn.Linear(980, 128),
                nn.Dropout(0.5),
                nn.ReLU(),
                nn.Linear(128, 10),
            )

        def forward(self, x):
            return self.encoder(x)

    return Replica().eval()


def test_polymnist_classifier_converter_matches_torch():
    from multivae_tpu.metrics.classifiers import ClassifierPolyMNIST
    from multivae_tpu.metrics.classifiers.mmnist import (
        convert_torch_classifier_state_dict)

    net = _build_torch_polymnist_classifier(seed=4)
    rng = np.random.default_rng(5)
    x = rng.uniform(size=(8, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()

    params = convert_torch_classifier_state_dict(
        {k: v.numpy() for k, v in net.state_dict().items()})
    got = np.asarray(
        ClassifierPolyMNIST().apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_convert_weights_cli_selftest_golden_pins():
    """The checked-in pipeline goldens (scripts/goldens/*.npz) must stay
    reproducible: seeded torch replicas -> converter -> probe outputs.
    This is the offline pass/fail a user runs after converting the real
    checkpoints (reference pipeline
    ``inception_networks.py:14-15,329-357``)."""
    import os
    import runpy
    import sys

    script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                          "convert_fid_weights.py")
    argv_saved = sys.argv
    sys.argv = ["convert_fid_weights.py", "selftest"]
    try:
        runpy.run_path(script, run_name="__main__")
    except SystemExit as e:  # selftest exits 1 on golden mismatch
        assert not e.code, "converter selftest failed vs checked-in goldens"
    finally:
        sys.argv = argv_saved


def test_convert_weights_cli_classifiers(tmp_path):
    """scripts/convert_fid_weights.py classifiers: torch → msgpack, and the
    msgpack load path of load_mmnist_classifiers matches the torch logits."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "convert_fid_weights",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "convert_fid_weights.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    src = tmp_path / "torch_ckpts"
    dest = tmp_path / "msgpack_ckpts"
    src.mkdir()
    nets = {}
    for i in range(5):
        net = _build_torch_polymnist_classifier(seed=20 + i)
        torch.save(net.state_dict(),
                   src / f"pretrained_img_to_digit_clf_m{i}")
        nets[f"m{i}"] = net

    mod.main(["classifiers", str(src), str(dest)])

    from multivae_tpu.metrics.classifiers import load_mmnist_classifiers

    clfs = load_mmnist_classifiers(str(dest))  # msgpack-only dir, no torch
    rng = np.random.default_rng(7)
    x = rng.uniform(size=(4, 3, 28, 28)).astype(np.float32)
    for key, clf in clfs.items():
        with torch.no_grad():
            want = nets[key](torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(np.asarray(clf(x)), want,
                                   rtol=1e-5, atol=1e-5)


def test_load_mmnist_classifiers_from_torch_checkpoints(tmp_path):
    """load_mmnist_classifiers converts on-disk torch checkpoints on the fly
    and the resulting callables match the torch logits."""
    from multivae_tpu.metrics.classifiers import load_mmnist_classifiers

    nets = {}
    for i in range(5):
        net = _build_torch_polymnist_classifier(seed=10 + i)
        torch.save(net.state_dict(),
                   tmp_path / f"pretrained_img_to_digit_clf_m{i}")
        nets[f"m{i}"] = net

    clfs = load_mmnist_classifiers(str(tmp_path))
    rng = np.random.default_rng(6)
    x = rng.uniform(size=(4, 3, 28, 28)).astype(np.float32)
    for key, clf in clfs.items():
        with torch.no_grad():
            want = nets[key](torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(np.asarray(clf(x)), want,
                                   rtol=1e-5, atol=1e-5)
