"""Fuzz parity for the FULL model families vs the golden torch models.

The fixed-config parity tests (tests/test_model_parity.py) pin one
architecture per family; this sweep draws random architectures — encoder
widths/strides, decoder depth/upsample placement, K, σ, τ, softmax variant,
channels, image size — and demands the same bars on every draw: keypoints
< 1e-3 L2, recon to fp32 tolerance, and parameter-GRADIENT agreement
(SURVEY.md §4.1 / BASELINE.json:5). A padding/GroupNorm/VJP bug that only
bites at unusual widths or odd stride placements dies here, not in a user's
config override. Each draw also round-trips the weights through the
flax→torch exporter (exact inverse at every architecture, not just the
shipped presets).
"""

import pytest

import copy

import numpy as np
import torch

import jax
import jax.numpy as jnp

from keypoints_tpu.checkpoint import (convert_torch_state_dict,
                                      export_torch_state_dict)
from keypoints_tpu.configs import get_config
from keypoints_tpu.training import build_model
from tests.golden.torch_model import (TorchKeypointAutoencoder,
                                      TorchTransporter, rename_map_for_flax)


def _draw_arch(rs: np.random.RandomState) -> dict:
    """One random architecture, honoring the structural invariants:
    decoder 2×-upsample count == log2(encoder stride product), filter
    widths divisible by the GroupNorm group count, image size divisible by
    the stride product."""
    groups = int(rs.choice([1, 2, 4]))
    n_enc = int(rs.choice([2, 3]))
    while True:                            # product ∈ {2, 4} keeps maps ≥ 4²
        strides = tuple(int(s) for s in rs.choice([1, 2], size=n_enc))
        prod = int(np.prod(strides))
        if prod in (2, 4):
            break
    enc_filters = tuple(groups * int(rs.randint(1, 5)) for _ in range(n_enc))
    n_up = int(np.log2(prod))
    n_dec = int(rs.choice([2, 3]))
    n_dec = max(n_dec, n_up)
    ups = [True] * n_up + [False] * (n_dec - n_up)
    rs.shuffle(ups)
    dec_filters = tuple(groups * int(rs.randint(1, 5)) for _ in range(n_dec))
    return dict(
        groups=groups,
        encoder_filters=enc_filters,
        encoder_strides=strides,
        decoder_filters=dec_filters,
        decoder_upsample=tuple(bool(u) for u in ups),
        num_keypoints=int(rs.randint(1, 7)),
        sigma=float(rs.uniform(0.05, 0.2)),
        temperature=float(rs.uniform(0.5, 1.5)),
        variant=str(rs.choice(["marginal", "joint"])),
        channels=int(rs.choice([1, 3])),
        image_size=int(rs.choice([16, 24])),
    )


def _build_pair(arch: dict, family: str, seed: int):
    torch.manual_seed(seed)
    cls = (TorchKeypointAutoencoder if family == "autoencoder"
           else TorchTransporter)
    tnet = cls(num_keypoints=arch["num_keypoints"],
               in_channels=arch["channels"], out_channels=arch["channels"],
               sigma=arch["sigma"], temperature=arch["temperature"],
               variant=arch["variant"],
               encoder_filters=arch["encoder_filters"],
               encoder_strides=arch["encoder_strides"],
               decoder_filters=arch["decoder_filters"],
               decoder_upsample=arch["decoder_upsample"],
               groups=arch["groups"])
    preset = "pong64" if family == "autoencoder" else "transporter_atari"
    cfg = get_config(preset).override(**{
        "model.encoder_filters": arch["encoder_filters"],
        "model.encoder_strides": arch["encoder_strides"],
        "model.decoder_filters": arch["decoder_filters"],
        "model.decoder_upsample": arch["decoder_upsample"],
        "model.groups": arch["groups"],
        "model.num_keypoints": arch["num_keypoints"],
        "model.out_channels": arch["channels"],
        "model.sigma": arch["sigma"],
        "model.temperature": arch["temperature"],
        "model.softmax_variant": arch["variant"],
        "data.image_size": arch["image_size"],
        "data.channels": arch["channels"],
        "train.compute_dtype": "float32"})
    return tnet, build_model(cfg)


def _flat(tree) -> dict:
    return {"/".join(str(k.key) for k in path): np.asarray(v) for path, v
            in jax.tree_util.tree_flatten_with_path(tree)[0]}


@pytest.mark.slow
def test_model_fuzz_forward_grad_and_roundtrip():
    rs = np.random.RandomState(20260818)
    for trial in range(10):
        arch = _draw_arch(rs)
        family = "autoencoder" if trial % 2 == 0 else "transporter"
        tnet, model = _build_pair(arch, family, seed=trial)
        msg = f"trial {trial} {family} {arch}"

        sd = tnet.state_dict()
        params = convert_torch_state_dict(sd, rename=rename_map_for_flax())

        # exporter round-trip: flax → torch layout must reproduce the
        # original state dict bit-for-bit at this architecture
        inv = {v: k for k, v in rename_map_for_flax().items()}
        back = export_torch_state_dict(params, rename=inv)
        assert set(back) == set(sd), msg
        for name in sd:
            np.testing.assert_array_equal(back[name], sd[name].numpy(),
                                          err_msg=f"{msg}: {name}")

        s = arch["image_size"]
        src = rs.rand(2, arch["channels"], s, s).astype(np.float32)
        tgt = rs.rand(2, arch["channels"], s, s).astype(np.float32)
        ts, tt = torch.tensor(src), torch.tensor(tgt)

        tnet64 = copy.deepcopy(tnet).double()

        recon_t, kp_t = tnet(ts, tt)
        loss_t = ((recon_t - tt) ** 2).mean()
        loss_t.backward()
        tgrads = {n: p.grad if p.grad is not None else torch.zeros_like(p)
                  for n, p in tnet.named_parameters()}
        g_torch = convert_torch_state_dict(tgrads,
                                           rename=rename_map_for_flax())

        # float64 golden gradients: random draws can be ill-conditioned
        # (small-σ softmax backward), where float32 torch itself drifts
        # ~1e-3 from the true gradient — the f64 run is the arbiter, and
        # the realized f32 drift sets each draw's tolerance floor.
        recon_64, _ = tnet64(ts.double(), tt.double())
        ((recon_64 - tt.double()) ** 2).mean().backward()
        tg64 = {n: (p.grad if p.grad is not None
                    else torch.zeros_like(p)).float()
                for n, p in tnet64.named_parameters()}
        g_torch64 = convert_torch_state_dict(tg64,
                                             rename=rename_map_for_flax())

        def loss_fn(p):
            r, kp = model.apply({"params": p}, jnp.asarray(src),
                                jnp.asarray(tgt))
            return jnp.mean((r - jnp.asarray(tgt)) ** 2), (r, kp)

        (loss_j, (recon_j, kp_j)), g_jax = jax.value_and_grad(
            loss_fn, has_aux=True)(params)

        l2 = np.linalg.norm(np.asarray(kp_j) - kp_t.detach().numpy(),
                            axis=-1)
        assert l2.max() < 1e-3, f"{msg}: kp L2 {l2.max()}"
        np.testing.assert_allclose(np.asarray(recon_j),
                                   recon_t.detach().numpy(), atol=5e-5,
                                   err_msg=msg)
        assert abs(float(loss_t) - float(loss_j)) < 1e-6, msg

        flat_t, flat_j = _flat(g_torch), _flat(g_jax)
        flat_64 = _flat(g_torch64)
        assert set(flat_t) == set(flat_j), msg
        for name in flat_j:
            f32_drift = float(np.abs(flat_t[name] - flat_64[name]).max())
            tol = max(3e-5, 3.0 * f32_drift)
            err = float(np.abs(flat_j[name] - flat_64[name]).max())
            assert err <= tol, (f"{msg}: grad {name} err {err:.3e} > tol "
                                f"{tol:.3e} (torch-f32 drift {f32_drift:.3e})")
