"""Load the READ-ONLY reference torch models at runtime for baselines/parity.

The reference package (/root/reference/mono/model) is plain torch plus a
local Registry (registry.py:1-42) — no mmcv needed — but a few modules
import torchvision (diffnet_encoder.py:6, net.py:12) which is absent here.
We install a minimal functional stub (Grayscale / RandomCrop / TF.crop /
load_state_dict_from_url) before loading, then mount the model directory as
a synthetic package so the relative imports resolve.

This module never copies reference code; it imports the reference at
runtime to (a) measure a real torch baseline for bench.py and (b) drive
torch-vs-jax parity comparisons (metric trajectories, golden tests).
"""

from __future__ import annotations

import importlib
import importlib.util
import sys
import types

REF_MODEL_DIR = "/root/reference/mono/model"
_PKG = "refmono"

# net modules whose import registers every MONO model variant
_NET_MODULES = (
    "mono_baseline.net",
    "mono_autoencoder.net",
    "mono_fm.net",
    "mono_fm_joint.net",
    "mono_fm_joint_im_rot.net",
    "mono_fm_joint_inpaint.net",
    "mono_inpainter.net",
    "mono_rotnet.net",
)


def _install_torchvision_stub():
    if "torchvision" in sys.modules:
        return
    try:
        import torchvision  # noqa: F401

        return
    except ImportError:
        pass

    import torch

    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")
    tf_functional = types.ModuleType("torchvision.transforms.functional")
    models = types.ModuleType("torchvision.models")
    models_utils = types.ModuleType("torchvision.models.utils")

    class Grayscale:
        """ITU-R 601-2 luma transform, matching torchvision's
        rgb_to_grayscale weights (0.2989, 0.587, 0.114) on NCHW tensors."""

        def __init__(self, num_output_channels=1):
            self.num_output_channels = num_output_channels

        def __call__(self, img):
            w = torch.tensor(
                [0.2989, 0.587, 0.114], dtype=img.dtype, device=img.device
            )
            gray = (img * w.view(1, 3, 1, 1)).sum(1, keepdim=True)
            if self.num_output_channels == 3:
                gray = gray.repeat(1, 3, 1, 1)
            return gray

    def crop(img, top, left, height, width):
        return img[..., top : top + height, left : left + width]

    class RandomCrop:
        def __init__(self, size):
            self.size = (size, size) if isinstance(size, int) else tuple(size)

        @staticmethod
        def get_params(img, output_size):
            th, tw = output_size
            h, w = img.shape[-2:]
            i = int(torch.randint(0, max(h - th, 0) + 1, (1,)))
            j = int(torch.randint(0, max(w - tw, 0) + 1, (1,)))
            return i, j, th, tw

        def __call__(self, img):
            i, j, th, tw = self.get_params(img, self.size)
            return crop(img, i, j, th, tw)

    def load_state_dict_from_url(url, progress=True, **kw):
        raise RuntimeError(
            f"no network egress in this environment; cannot fetch {url}"
        )

    def resize(img, size, interpolation=None):
        # torchvision F.resize on a PIL image: size is (h, w)
        from PIL import Image as PILImage

        interp = PILImage.BILINEAR if interpolation is None else interpolation
        return img.resize((int(size[1]), int(size[0])), interp)

    transforms.Grayscale = Grayscale
    transforms.RandomCrop = RandomCrop
    transforms.functional = tf_functional
    tf_functional.crop = crop
    tf_functional.resize = resize
    models_utils.load_state_dict_from_url = load_state_dict_from_url
    models.utils = models_utils
    tv.transforms = transforms
    tv.models = models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = tf_functional
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.models.utils"] = models_utils


def _install_cv2_stub():
    """mytransforms.py imports cv2 but only its BGR↔RGB conversion is needed
    for the transform paths we golden-test."""
    if "cv2" in sys.modules:
        return
    try:
        import cv2  # noqa: F401

        return
    except ImportError:
        pass
    import numpy as np

    cv2 = types.ModuleType("cv2")
    cv2.COLOR_BGR2RGB = 4
    cv2.COLOR_RGB2BGR = 4

    def cvtColor(img, code):
        if code == 4:
            return np.ascontiguousarray(np.asarray(img)[:, :, ::-1])
        raise NotImplementedError(code)

    cv2.cvtColor = cvtColor
    sys.modules["cv2"] = cv2


def load_ref_mytransforms():
    """Load /root/reference/mono/datasets/mytransforms.py for golden tests
    (needs the torchvision + cv2 stubs)."""
    _install_torchvision_stub()
    _install_cv2_stub()
    import numpy as np

    # the reference uses the np.float/np.int aliases removed in numpy 2
    if not hasattr(np, "float"):
        np.float = float
    if not hasattr(np, "int"):
        np.int = int
    spec = importlib.util.spec_from_file_location(
        "ref_mytransforms", "/root/reference/mono/datasets/mytransforms.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _install_yacs_stub():
    """`diffnet_config.py` builds its MODEL_CONFIGS from yacs CfgNode, which
    is absent here; a dict with attribute access and __getitem__ is all the
    reference uses (cfg['STAGE1']['NUM_CHANNELS'] etc.)."""
    if "yacs" in sys.modules or "yacs.config" in sys.modules:
        return
    try:
        import yacs  # noqa: F401

        return
    except ImportError:
        pass

    class CfgNode(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    yacs = types.ModuleType("yacs")
    config = types.ModuleType("yacs.config")
    config.CfgNode = CfgNode
    yacs.config = config
    sys.modules["yacs"] = yacs
    sys.modules["yacs.config"] = config


def enable_cpu_cuda_shim():
    """The reference hard-codes `.cuda()` (e.g. mono_fm/net.py:242
    `torch.zeros(...).cuda()`); on the CPU-only torch in this image, make
    `.cuda()` a no-op so the reference runs for baseline/parity purposes."""
    import torch

    if torch.cuda.is_available():
        return
    if getattr(torch.Tensor.cuda, "_tripled_shim", False):
        return

    def _tensor_cuda(self, *a, **k):
        return self

    def _module_cuda(self, *a, **k):
        return self

    _tensor_cuda._tripled_shim = True
    torch.Tensor.cuda = _tensor_cuda
    torch.nn.Module.cuda = _module_cuda


def load_ref_registry():
    """Mount /root/reference/mono/model as package `refmono`, import every
    net module, and return the populated MONO registry module."""
    _install_torchvision_stub()
    _install_yacs_stub()
    if _PKG not in sys.modules:
        pkg = types.ModuleType(_PKG)
        pkg.__path__ = [REF_MODEL_DIR]
        sys.modules[_PKG] = pkg
    for name in _NET_MODULES:
        importlib.import_module(f"{_PKG}.{name}")
    return importlib.import_module(f"{_PKG}.registry")


def load_ref_module(dotted: str):
    """Import a single reference model module, e.g. 'mono_fm_joint.layers'."""
    _install_torchvision_stub()
    _install_yacs_stub()
    if _PKG not in sys.modules:
        pkg = types.ModuleType(_PKG)
        pkg.__path__ = [REF_MODEL_DIR]
        sys.modules[_PKG] = pkg
    return importlib.import_module(f"{_PKG}.{dotted}")


class Opts(dict):
    """Attribute-access dict mimicking the mmcv Config object the reference
    nets receive as `options` (attribute reads + .get fallbacks)."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v


def default_opts(
    name: str,
    *,
    height: int,
    width: int,
    imgs_per_gpu: int,
    depth_num_layers: int = 50,
    pose_num_layers: int = 18,
    extractor_num_layers: int = 50,
    frame_ids=(0, -1, 1),
    **extra,
) -> Opts:
    """Model opts mirroring /root/reference/config/cfg_kitti_fm.py:21-39 and
    cfg_kitti_tripleD.py:23-53 with pretrained paths disabled (no files in
    this environment)."""
    stereo = "s" in frame_ids
    opts = Opts(
        name=name,
        depth_num_layers=depth_num_layers,
        pose_num_layers=pose_num_layers,
        extractor_num_layers=extractor_num_layers,
        frame_ids=list(frame_ids),
        imgs_per_gpu=imgs_per_gpu,
        height=height,
        width=width,
        scales=[0, 1, 2, 3],
        min_depth=0.1,
        max_depth=100.0,
        depth_pretrained_path=None,
        pose_pretrained_path=None,
        extractor_pretrained_path=None,
        automask=not stereo,
        disp_norm=not stereo,
        perception_weight=1e-3,
        smoothness_weight=1e-3,
        # mono_baseline names its smoothness weight differently
        # (mono_baseline/net.py:98); same 1e-3 value
        disparity_smoothness=1e-3,
    )
    opts.update(extra)
    return opts


def build_ref_model(opts: Opts):
    """Instantiate a reference model by registry name (train.py pattern:
    apis/trainer uses MONO.module_dict[cfg.model.name](cfg.model))."""
    enable_cpu_cuda_shim()
    reg = load_ref_registry()
    cls = reg.MONO.module_dict[opts["name"]]
    return cls(opts)
