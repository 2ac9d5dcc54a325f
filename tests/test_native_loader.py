"""Native C++ loader: builds, matches PIL, threads, handles failures."""

import numpy as np
import pytest
from PIL import Image

from tripled_tpu.data import native_loader as nl


@pytest.fixture(scope="module")
def png_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("imgs") / "frame.png"
    rng = np.random.RandomState(0)
    y, x = np.mgrid[0:96, 0:320]
    img = np.stack([(x + y) % 255, x % 255, y % 255], -1).astype(np.uint8)
    img = (0.7 * img + 0.3 * rng.rand(96, 320, 3) * 255).astype(np.uint8)
    Image.fromarray(img).save(p)
    return str(p)


pytestmark = pytest.mark.skipif(
    not nl.available(), reason="native loader toolchain unavailable"
)


def test_matches_pil(png_path):
    """Byte-exact vs PIL (fixed-point two-pass resampler, VERDICT r1 #9)."""
    nat = nl.load_image(png_path, 64, 192)
    pil = np.asarray(
        Image.open(png_path).convert("RGB").resize((192, 64), Image.LANCZOS)
    )
    np.testing.assert_array_equal(
        np.round(nat * 255).astype(np.uint8), pil
    )
    assert nat.shape == (64, 192, 3)
    assert nat.min() >= 0 and nat.max() <= 1


def test_matches_pil_many_shapes(png_path):
    """Down/up/identity scales all byte-exact, flip included."""
    src = Image.open(png_path).convert("RGB")
    for oh, ow in [(32, 96), (96, 320), (128, 480), (50, 128)]:
        nat = nl.load_image(png_path, oh, ow)
        pil = np.asarray(src.resize((ow, oh), Image.LANCZOS))
        np.testing.assert_array_equal(
            np.round(nat * 255).astype(np.uint8), pil, err_msg=f"{oh}x{ow}"
        )
        natf = nl.load_image(png_path, oh, ow, flip=True)
        pilf = np.asarray(
            src.transpose(Image.FLIP_LEFT_RIGHT).resize((ow, oh), Image.LANCZOS)
        )
        np.testing.assert_array_equal(
            np.round(natf * 255).astype(np.uint8), pilf, err_msg=f"flip {oh}x{ow}"
        )


def test_flip(png_path):
    a = nl.load_image(png_path, 64, 192)
    b = nl.load_image(png_path, 64, 192, flip=True)
    np.testing.assert_allclose(b, a[:, ::-1], atol=1e-6)


def test_jpeg_roundtrip(tmp_path, png_path):
    jp = tmp_path / "frame.jpg"
    Image.open(png_path).save(jp, quality=95)
    nat = nl.load_image(str(jp), 64, 192)
    pil = np.asarray(
        Image.open(jp).convert("RGB").resize((192, 64), Image.LANCZOS),
        np.float32,
    ) / 255.0
    assert np.abs(nat - pil).mean() < 2e-2  # jpeg decoders differ slightly


def test_batch_threads(png_path):
    out = nl.load_batch([png_path] * 6, 64, 192, flips=[False, True] * 3,
                        num_threads=3)
    assert out.shape == (6, 64, 192, 3)
    np.testing.assert_allclose(out[1], out[0][:, ::-1], atol=1e-6)
    np.testing.assert_array_equal(out[0], out[2])


def test_missing_file_raises():
    with pytest.raises(IOError):
        nl.load_image("/nonexistent/file.png", 32, 32)
