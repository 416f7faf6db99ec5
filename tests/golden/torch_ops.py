"""Golden torch implementations of the published keypoint equations.

Independent CPU-torch implementations of the Jakab-2018 / Kulkarni-2019 math
(SURVEY.md §4.1): the JAX framework must match these to fp32 tolerance.
``grid_sample`` / ``affine_grid`` parity is tested directly against
``torch.nn.functional`` (the functions the original reference called), so those
need no golden re-implementation here. Written in torch idiom, from the papers
— NOT translated from the JAX code, so a shared bug is unlikely.
"""

import torch
import torch.nn.functional as F


def axis_coords(n: int, align_corners: bool = True) -> torch.Tensor:
    if align_corners:
        return torch.linspace(-1.0, 1.0, n)
    return (2.0 * torch.arange(n, dtype=torch.float32) + 1.0) / n - 1.0


def spatial_softmax2d(heatmaps: torch.Tensor, temperature: float = 1.0,
                      align_corners: bool = True) -> torch.Tensor:
    b, k, h, w = heatmaps.shape
    probs = torch.softmax(heatmaps.reshape(b, k, h * w) / temperature, dim=-1)
    probs = probs.reshape(b, k, h, w)
    xs = axis_coords(w, align_corners)
    ys = axis_coords(h, align_corners)
    ex = (probs.sum(dim=2) * xs).sum(dim=-1)
    ey = (probs.sum(dim=3) * ys).sum(dim=-1)
    return torch.stack([ex, ey], dim=-1)


def marginal_softmax(heatmaps: torch.Tensor, temperature: float = 1.0,
                     align_corners: bool = True) -> torch.Tensor:
    hx = heatmaps.sum(dim=2)
    hy = heatmaps.sum(dim=3)
    px = torch.softmax(hx / temperature, dim=-1)
    py = torch.softmax(hy / temperature, dim=-1)
    ex = (px * axis_coords(heatmaps.shape[3], align_corners)).sum(-1)
    ey = (py * axis_coords(heatmaps.shape[2], align_corners)).sum(-1)
    return torch.stack([ex, ey], dim=-1)


def gaussian_maps(keypoints: torch.Tensor, height: int, width: int,
                  sigma: float = 0.1, align_corners: bool = True) -> torch.Tensor:
    # Direct 2-D evaluation (the jax version factorizes — different algorithm,
    # same function, which is exactly what a golden test wants).
    xs = axis_coords(width, align_corners)
    ys = axis_coords(height, align_corners)
    gy, gx = torch.meshgrid(ys, xs, indexing="ij")
    dx = gx[None, None] - keypoints[..., 0, None, None]
    dy = gy[None, None] - keypoints[..., 1, None, None]
    return torch.exp(-(dx ** 2 + dy ** 2) / (2.0 * sigma * sigma))


def tps_warp_grid(control_points: torch.Tensor, control_targets: torch.Tensor,
                  height: int, width: int, reg: float = 0.0,
                  align_corners: bool = True) -> torch.Tensor:
    """Classic TPS solve + dense evaluation, batched, in torch."""
    b, n, _ = control_points.shape
    def u(r2):
        out = r2 * torch.log(r2.clamp_min(1e-30))
        return torch.where(r2 == 0, torch.zeros_like(out), out)

    d2 = ((control_points[:, :, None] - control_points[:, None]) ** 2).sum(-1)
    k = u(d2) + reg * torch.eye(n)
    p = torch.cat([torch.ones(b, n, 1), control_points], dim=-1)
    lhs = torch.cat([torch.cat([k, p], dim=-1),
                     torch.cat([p.transpose(1, 2), torch.zeros(b, 3, 3)],
                               dim=-1)], dim=1)
    rhs = torch.cat([control_targets, torch.zeros(b, 3, 2)], dim=1)
    sol = torch.linalg.solve(lhs, rhs)
    w_, a_ = sol[:, :n], sol[:, n:]

    xs = axis_coords(width, align_corners)
    ys = axis_coords(height, align_corners)
    gy, gx = torch.meshgrid(ys, xs, indexing="ij")
    pts = torch.stack([gx, gy], dim=-1).reshape(1, -1, 2).expand(b, -1, -1)
    d2p = ((pts[:, :, None] - control_points[:, None]) ** 2).sum(-1)
    vals = u(d2p) @ w_ + torch.cat([torch.ones(b, pts.shape[1], 1), pts],
                                   dim=-1) @ a_
    return vals.reshape(b, height, width, 2)


def torch_grid_sample(image: torch.Tensor, grid: torch.Tensor,
                      padding_mode: str = "zeros",
                      align_corners: bool = True) -> torch.Tensor:
    return F.grid_sample(image, grid, mode="bilinear",
                         padding_mode=padding_mode,
                         align_corners=align_corners)


def torch_affine_grid(theta: torch.Tensor, size, align_corners: bool = True):
    return F.affine_grid(theta, size, align_corners=align_corners)
