"""Golden-value tests: tripled_tpu.ops vs torch (CPU) reference semantics.

Each test re-states the reference formula (file:line cited in the op's
docstring) with torch ops and checks our jnp implementation against it.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from tripled_tpu import ops


def to_nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def from_nchw(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


# ---------------------------------------------------------------- geometry


def torch_backproject(depth, inv_K, h, w):
    b = depth.shape[0]
    meshgrid = np.meshgrid(range(w), range(h), indexing="xy")
    id_coords = torch.from_numpy(np.stack(meshgrid, 0).astype(np.float32))
    ones = torch.ones(b, 1, h * w)
    pix = torch.unsqueeze(
        torch.stack([id_coords[0].view(-1), id_coords[1].view(-1)], 0), 0
    ).repeat(b, 1, 1)
    pix = torch.cat([pix, ones], 1)
    cam = torch.matmul(inv_K[:, :3, :3], pix)
    cam = depth.view(b, 1, -1) * cam
    return torch.cat([cam, ones], 1)


def torch_project(points, K, T, h, w, eps=1e-7):
    b = points.shape[0]
    P = torch.matmul(K, T)[:, :3, :]
    cam = torch.matmul(P, points)
    pix = cam[:, :2, :] / (cam[:, 2, :].unsqueeze(1) + eps)
    pix = pix.view(b, 2, h, w).permute(0, 2, 3, 1)
    pix[..., 0] /= w - 1
    pix[..., 1] /= h - 1
    return (pix - 0.5) * 2


def make_cam(rng, b):
    K = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    K[:, 0, 0] = 100 + rng.rand(b) * 50
    K[:, 1, 1] = 120 + rng.rand(b) * 50
    K[:, 0, 2] = 16 + rng.rand(b)
    K[:, 1, 2] = 12 + rng.rand(b)
    return K


def test_backproject_project(rng_np):
    b, h, w = 2, 24, 32
    depth = (rng_np.rand(b, h, w).astype(np.float32) * 10 + 1).astype(np.float32)
    K = make_cam(rng_np, b)
    inv_K = np.linalg.inv(K).astype(np.float32)
    T = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    T[:, :3, 3] = rng_np.randn(b, 3).astype(np.float32) * 0.1

    ref_pts = torch_backproject(torch.from_numpy(depth), torch.from_numpy(inv_K), h, w)
    got_pts = ops.backproject(jnp.asarray(depth), jnp.asarray(inv_K))
    np.testing.assert_allclose(np.asarray(got_pts), ref_pts.numpy(), rtol=1e-5, atol=1e-4)

    ref_pix = torch_project(ref_pts, torch.from_numpy(K), torch.from_numpy(T), h, w)
    got_pix = ops.project(got_pts, jnp.asarray(K), jnp.asarray(T), h, w, normalized=True)
    np.testing.assert_allclose(np.asarray(got_pix), ref_pix.numpy(), rtol=1e-4, atol=1e-4)

    # fused warp_coords == unnormalized project(backproject)
    got_fused = ops.warp_coords(
        jnp.asarray(depth), jnp.asarray(inv_K), jnp.asarray(K), jnp.asarray(T)
    )
    unnorm = (np.asarray(got_pix) / 2 + 0.5) * np.array([w - 1, h - 1], np.float32)
    np.testing.assert_allclose(np.asarray(got_fused), unnorm, rtol=1e-3, atol=1e-2)


def test_invert_intrinsics(rng_np):
    K = make_cam(rng_np, 4)
    got = np.asarray(ops.invert_intrinsics(jnp.asarray(K)))
    np.testing.assert_allclose(got, np.linalg.inv(K), rtol=1e-5, atol=1e-6)


def test_disp_to_depth():
    disp = jnp.linspace(0, 1, 11)
    sd, depth = ops.disp_to_depth(disp, 0.1, 100.0)
    np.testing.assert_allclose(np.asarray(depth)[0], 100.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(depth)[-1], 0.1, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sd), 0.01 + 9.99 * np.asarray(disp), rtol=1e-6)


def test_axisangle_to_matrix(rng_np):
    b = 8
    vec = rng_np.randn(b, 1, 3).astype(np.float32) * 0.3
    trans = rng_np.randn(b, 1, 3).astype(np.float32) * 0.1

    for invert in (False, True):
        got = np.asarray(
            ops.transformation_from_parameters(
                jnp.asarray(vec), jnp.asarray(trans), invert=invert
            )
        )
        # torch reference (net.py:225-277), rewritten without .cuda()
        angle = torch.norm(torch.from_numpy(vec), 2, 2, True)
        axis = torch.from_numpy(vec) / (angle + 1e-7)
        ca, sa = torch.cos(angle), torch.sin(angle)
        C = 1 - ca
        x, y, z = (axis[..., i].unsqueeze(1) for i in range(3))
        xs, ys, zs = x * sa, y * sa, z * sa
        xC, yC, zC = x * C, y * C, z * C
        xyC, yzC, zxC = x * yC, y * zC, z * xC
        rot = torch.zeros((b, 4, 4))
        rot[:, 0, 0] = torch.squeeze(x * xC + ca)
        rot[:, 0, 1] = torch.squeeze(xyC - zs)
        rot[:, 0, 2] = torch.squeeze(zxC + ys)
        rot[:, 1, 0] = torch.squeeze(xyC + zs)
        rot[:, 1, 1] = torch.squeeze(y * yC + ca)
        rot[:, 1, 2] = torch.squeeze(yzC - xs)
        rot[:, 2, 0] = torch.squeeze(zxC - ys)
        rot[:, 2, 1] = torch.squeeze(yzC + xs)
        rot[:, 2, 2] = torch.squeeze(z * zC + ca)
        rot[:, 3, 3] = 1
        t = torch.from_numpy(trans).clone()
        R = rot
        if invert:
            R = R.transpose(1, 2)
            t = t * -1
        T = torch.zeros(b, 4, 4)
        T[:, 0, 0] = T[:, 1, 1] = T[:, 2, 2] = T[:, 3, 3] = 1
        T[:, :3, 3] = t.view(-1, 3)
        ref = torch.matmul(R, T) if invert else torch.matmul(T, R)
        np.testing.assert_allclose(got, ref.numpy(), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- warping


@pytest.mark.parametrize("method", ["bilinear", "nearest"])
def test_grid_sample_vs_torch(rng_np, method):
    b, h, w, c = 2, 16, 20, 3
    img = rng_np.rand(b, h, w, c).astype(np.float32)
    # coords beyond borders to exercise border padding; avoid exact .5 ties
    grid = (rng_np.rand(b, h, w, 2).astype(np.float32) * 2.6 - 1.3) + 1e-4

    ref = F.grid_sample(
        to_nchw(img),
        torch.from_numpy(grid),
        mode=method,
        padding_mode="border",
        align_corners=True,
    )
    got = ops.warp_pixel_coords(
        jnp.asarray(img), jnp.asarray(grid), align_corners=True, method=method
    )
    np.testing.assert_allclose(np.asarray(got), from_nchw(ref), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("c", [3, 64])
def test_grid_sample_channel_paths_vs_torch(rng_np, c):
    """Both gather strategies (<=32ch: one 4-corner patch gather; wide:
    two row-pair gathers — ops/warp.py round-3 redesign) must match torch
    exactly, forward and backward."""
    import jax

    b, h, w = 2, 12, 18
    img = rng_np.rand(b, h, w, c).astype(np.float32)
    grid = (rng_np.rand(b, 9, 11, 2).astype(np.float32) * 2.6 - 1.3) + 1e-4

    timg = to_nchw(img).requires_grad_(True)
    ref = F.grid_sample(
        timg, torch.from_numpy(grid), mode="bilinear",
        padding_mode="border", align_corners=True,
    )
    ref.sum().backward()

    def f(x):
        return ops.warp_pixel_coords(
            x, jnp.asarray(grid), align_corners=True
        ).sum()

    got = ops.warp_pixel_coords(
        jnp.asarray(img), jnp.asarray(grid), align_corners=True
    )
    np.testing.assert_allclose(
        np.asarray(got), from_nchw(ref.detach()), rtol=1e-4, atol=1e-5
    )
    gimg = jax.grad(f)(jnp.asarray(img))
    np.testing.assert_allclose(
        np.asarray(gimg), from_nchw(timg.grad), rtol=1e-4, atol=1e-5
    )


def test_grid_sample_bf16_gather_close(rng_np):
    """Opt-in bf16 gather texels (ModelConfig.warp_gather_dtype) stay
    within bf16 quantization of the exact f32 sampling."""
    from tripled_tpu.ops.warp import grid_sample

    img = rng_np.rand(2, 12, 18, 3).astype(np.float32)
    coords = np.stack(
        [rng_np.rand(2, 9, 11) * 17, rng_np.rand(2, 9, 11) * 11], axis=-1
    ).astype(np.float32)
    exact = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(coords)))
    approx = np.asarray(
        grid_sample(
            jnp.asarray(img), jnp.asarray(coords), gather_dtype=jnp.bfloat16
        )
    )
    # bf16 has 8 mantissa bits: relative step 2^-8 on [0.5, 1)
    np.testing.assert_allclose(approx, exact, atol=2 ** -8)


def test_grid_sample_align_corners_false(rng_np):
    b, h, w, c = 2, 10, 12, 2
    img = rng_np.rand(b, h, w, c).astype(np.float32)
    grid = rng_np.rand(b, 6, 7, 2).astype(np.float32) * 2.4 - 1.2
    ref = F.grid_sample(
        to_nchw(img), torch.from_numpy(grid),
        mode="bilinear", padding_mode="border", align_corners=False,
    )
    got = ops.warp_pixel_coords(
        jnp.asarray(img), jnp.asarray(grid), align_corners=False
    )
    np.testing.assert_allclose(np.asarray(got), from_nchw(ref), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- ssim / losses


def torch_ssim(x, y):
    pool = torch.nn.AvgPool2d(3, 1)
    refl = torch.nn.ReflectionPad2d(1)
    x, y = refl(x), refl(y)
    mu_x, mu_y = pool(x), pool(y)
    sx = pool(x**2) - mu_x**2
    sy = pool(y**2) - mu_y**2
    sxy = pool(x * y) - mu_x * mu_y
    n = (2 * mu_x * mu_y + 0.01**2) * (2 * sxy + 0.03**2)
    d = (mu_x**2 + mu_y**2 + 0.01**2) * (sx + sy + 0.03**2)
    return torch.clamp((1 - n / d) / 2, 0, 1)


def test_ssim_vs_torch(rng_np):
    x = rng_np.rand(2, 12, 14, 3).astype(np.float32)
    y = np.clip(x + rng_np.randn(2, 12, 14, 3).astype(np.float32) * 0.05, 0, 1)
    ref = torch_ssim(to_nchw(x), to_nchw(y))
    got = ops.ssim(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(got), from_nchw(ref), rtol=1e-4, atol=1e-5)


def test_reprojection_loss_formula(rng_np):
    x = rng_np.rand(1, 8, 8, 3).astype(np.float32)
    y = rng_np.rand(1, 8, 8, 3).astype(np.float32)
    got = np.asarray(ops.reprojection_loss(jnp.asarray(x), jnp.asarray(y)))
    ssim_t = torch_ssim(to_nchw(x), to_nchw(y)).mean(1, True)
    l1_t = torch.sqrt((to_nchw(y) - to_nchw(x)) ** 2 + 1e-6).mean(1, True)
    ref = 0.85 * ssim_t + 0.15 * l1_t
    np.testing.assert_allclose(got, from_nchw(ref), rtol=1e-4, atol=1e-5)


def torch_smooth_loss(disp, img, a1=0.5, a2=0.5):
    h, w = disp.shape[2], disp.shape[3]
    img = F.interpolate(img, (h, w), mode="area")

    def grad(D):
        dy = D[:, :, 1:] - D[:, :, :-1]
        dx = D[:, :, :, 1:] - D[:, :, :, :-1]
        return dx, dy

    disp_dx, disp_dy = grad(disp)
    img_dx, img_dy = grad(img)
    disp_dxx, disp_dxy = grad(disp_dx)
    disp_dyx, disp_dyy = grad(disp_dy)
    img_dxx, img_dxy = grad(img_dx)
    img_dyx, img_dyy = grad(img_dy)
    s1 = (disp_dx.abs() * torch.exp(-a1 * img_dx.abs().mean(1, True))).mean() + (
        disp_dy.abs() * torch.exp(-a1 * img_dy.abs().mean(1, True))
    ).mean()
    s2 = (
        (disp_dxx.abs() * torch.exp(-a2 * img_dxx.abs().mean(1, True))).mean()
        + (disp_dxy.abs() * torch.exp(-a2 * img_dxy.abs().mean(1, True))).mean()
        + (disp_dyx.abs() * torch.exp(-a2 * img_dyx.abs().mean(1, True))).mean()
        + (disp_dyy.abs() * torch.exp(-a2 * img_dyy.abs().mean(1, True))).mean()
    )
    return (s1 + s2).item()


def test_smooth_loss(rng_np):
    disp = rng_np.rand(2, 12, 16, 1).astype(np.float32)
    img = rng_np.rand(2, 24, 32, 3).astype(np.float32)
    got = float(ops.smooth_loss(jnp.asarray(disp), jnp.asarray(img)))
    ref = torch_smooth_loss(to_nchw(disp), to_nchw(img))
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_feature_regularization_loss(rng_np):
    feat = rng_np.randn(2, 12, 16, 8).astype(np.float32)
    img = rng_np.rand(2, 24, 32, 3).astype(np.float32)
    dis, cvt = 1e-3, 1e-3
    got = float(
        ops.feature_regularization_loss(jnp.asarray(feat), jnp.asarray(img), dis, cvt)
    )
    # reference formula with a=1 weights
    f, i = to_nchw(feat), to_nchw(img)
    i = F.interpolate(i, (12, 16), mode="area")

    def grad(D):
        dy = D[:, :, 1:] - D[:, :, :-1]
        dx = D[:, :, :, 1:] - D[:, :, :, :-1]
        return dx, dy

    fdx, fdy = grad(f)
    idx, idy = grad(i)
    fdxx, fdxy = grad(fdx)
    fdyx, fdyy = grad(fdy)
    idxx, idxy = grad(idx)
    idyx, idyy = grad(idy)
    s1 = (fdx.abs() * torch.exp(-idx.abs().mean(1, True))).mean() + (
        fdy.abs() * torch.exp(-idy.abs().mean(1, True))
    ).mean()
    s2 = (
        (fdxx.abs() * torch.exp(-idxx.abs().mean(1, True))).mean()
        + (fdxy.abs() * torch.exp(-idxy.abs().mean(1, True))).mean()
        + (fdyx.abs() * torch.exp(-idyx.abs().mean(1, True))).mean()
        + (fdyy.abs() * torch.exp(-idyy.abs().mean(1, True))).mean()
    )
    ref = (-dis * s1 + cvt * s2).item()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-7)


def test_min_reprojection_automask(rng_np):
    preds = [jnp.asarray(rng_np.rand(2, 8, 8, 1).astype(np.float32)) for _ in range(2)]
    idents = [jnp.asarray(rng_np.rand(2, 8, 8, 1).astype(np.float32)) for _ in range(2)]
    got = ops.min_reprojection_with_automask(preds, idents, rng=None)
    stacked = np.concatenate([np.asarray(t) for t in idents + preds], axis=-1)
    np.testing.assert_allclose(
        np.asarray(got)[..., 0], stacked.min(-1), rtol=1e-6
    )


# ---------------------------------------------------------------- color


def test_rgb2lab_vs_torch(rng_np):
    import argparse
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_color_conversions",
        "/root/reference/mono/model/mono_fm_joint_inpaint/color_conversions.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    t_rgb2lab = mod.rgb2lab

    rgb = rng_np.rand(2, 8, 10, 3).astype(np.float32)
    ref = t_rgb2lab(
        to_nchw(rgb), argparse.Namespace(l_cent=50.0, l_norm=50.0, ab_norm=110.0)
    )
    got = ops.rgb2lab(jnp.asarray(rgb))
    np.testing.assert_allclose(np.asarray(got), from_nchw(ref), rtol=1e-3, atol=1e-4)

    # round trip
    back = ops.lab2rgb(got)
    np.testing.assert_allclose(np.asarray(back), rgb, rtol=1e-2, atol=1e-3)


def test_rgb_to_l(rng_np):
    rgb = rng_np.rand(2, 8, 10, 3).astype(np.float32)
    t = to_nchw(rgb)
    mask = (t > 0.04045).float()
    tl = (((t + 0.055) / 1.055) ** 2.4) * mask + t / 12.92 * (1 - mask)
    y = 0.212671 * tl[:, 0] + 0.715160 * tl[:, 1] + 0.072169 * tl[:, 2]
    m2 = (y > 0.008856).float()
    yint = y ** (1 / 3.0) * m2 + (7.787 * y + 16.0 / 116.0) * (1 - m2)
    ref = (116.0 * yint - 16.0).unsqueeze(1) / 100
    got = ops.rgb_to_l(jnp.asarray(rgb))
    np.testing.assert_allclose(np.asarray(got), from_nchw(ref), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- resize


def test_resize_bilinear_matches_torch(rng_np):
    x = rng_np.rand(2, 12, 16, 3).astype(np.float32)
    ref = F.interpolate(to_nchw(x), (24, 32), mode="bilinear", align_corners=False)
    got = ops.resize_bilinear(jnp.asarray(x), 24, 32)
    np.testing.assert_allclose(np.asarray(got), from_nchw(ref), rtol=1e-4, atol=1e-5)


def test_resize_area_matches_torch(rng_np):
    x = rng_np.rand(2, 24, 32, 3).astype(np.float32)
    ref = F.interpolate(to_nchw(x), (6, 8), mode="area")
    got = ops.resize_area(jnp.asarray(x), 6, 8)
    np.testing.assert_allclose(np.asarray(got), from_nchw(ref), rtol=1e-5, atol=1e-6)


def test_upsample2x_nearest(rng_np):
    x = rng_np.rand(1, 5, 6, 2).astype(np.float32)
    ref = F.interpolate(to_nchw(x), scale_factor=2, mode="nearest")
    got = ops.upsample2x_nearest(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), from_nchw(ref), rtol=1e-6)


def test_grid_sample_gradients_vs_torch(rng_np):
    """Backward-warp gradients (both image and coords) match torch's
    grid_sample autograd — training parity for the view-synthesis loss."""
    b, h, w, c = 1, 10, 12, 2
    img = rng_np.rand(b, h, w, c).astype(np.float32)
    grid = (rng_np.rand(b, 6, 7, 2).astype(np.float32) * 1.6 - 0.8)

    t_img = to_nchw(img).requires_grad_(True)
    t_grid = torch.from_numpy(grid).requires_grad_(True)
    t_out = F.grid_sample(t_img, t_grid, mode="bilinear",
                          padding_mode="border", align_corners=True)
    t_out.sum().backward()

    import jax

    def f(im, g):
        return ops.warp_pixel_coords(im, g, align_corners=True).sum()

    gi, gg = jax.grad(f, argnums=(0, 1))(jnp.asarray(img), jnp.asarray(grid))
    np.testing.assert_allclose(
        np.asarray(gi), from_nchw(t_img.grad), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(gg), t_grid.grad.numpy(), rtol=1e-3, atol=1e-4
    )


def test_ssim_gradients_vs_torch(rng_np):
    x = rng_np.rand(1, 8, 9, 3).astype(np.float32)
    y = rng_np.rand(1, 8, 9, 3).astype(np.float32)

    tx = to_nchw(x).requires_grad_(True)
    ty = to_nchw(y).requires_grad_(True)
    torch_ssim(tx, ty).sum().backward()

    import jax

    gx, gy = jax.grad(lambda a, b: ops.ssim(a, b).sum(), argnums=(0, 1))(
        jnp.asarray(x), jnp.asarray(y)
    )
    np.testing.assert_allclose(np.asarray(gx), from_nchw(tx.grad), rtol=1e-3,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy), from_nchw(ty.grad), rtol=1e-3,
                               atol=1e-5)


def test_reference_warp_convention_composition(rng_np):
    """cfg.warp_align_corners=False reproduces the reference's actual
    sampling: (W-1, H-1) normalization (mono_fm_joint/net.py:189-192)
    composed with F.grid_sample's torch>=1.3 DEFAULT align_corners=False.
    The composition samples at x*W/(W-1) - 0.5."""
    import torch
    import torch.nn.functional as F

    from tripled_tpu.ops.warp import grid_sample as our_grid_sample

    b, h, w, c = 2, 12, 20, 3
    img = rng_np.rand(b, h, w, c).astype(np.float32)
    # raw pixel coords a model would produce (inside + slightly outside)
    px = rng_np.uniform(-1.5, w + 0.5, (b, h, w)).astype(np.float32)
    py = rng_np.uniform(-1.5, h + 0.5, (b, h, w)).astype(np.float32)

    # reference path: normalize by (W-1, H-1), grid_sample default
    gx = (px / (w - 1) - 0.5) * 2
    gy = (py / (h - 1) - 0.5) * 2
    grid = torch.from_numpy(np.stack([gx, gy], -1))
    timg = torch.from_numpy(np.transpose(img, (0, 3, 1, 2)))
    ref = F.grid_sample(timg, grid, padding_mode="border")  # default a_c=False
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))

    # our path: the warp_align_corners=False correction in
    # TripleDNet._grid_sample (models/net.py)
    sx = w / (w - 1.0)
    sy = h / (h - 1.0)
    coords = np.stack([px * sx - 0.5, py * sy - 0.5], -1)
    got = np.asarray(our_grid_sample(jnp.asarray(img), jnp.asarray(coords)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
