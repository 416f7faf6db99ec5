"""Golden torch KeypointAutoencoder — the full-model parity reference.

A torch implementation of the same architecture as
``keypoints_tpu.models.KeypointAutoencoder`` (same conv/GroupNorm/ReLU
stacks, same marginal soft-argmax, same Gaussian bottleneck), written in
torch idiom from the published equations. Its state_dict converts into the
flax model via ``checkpoint.convert_torch_state_dict`` and forward outputs
must agree to fp32 tolerance — this is the "<1e-3 keypoint L2 / fp32 loss
parity" bar from BASELINE.json:5.
"""

from __future__ import annotations

import torch
import torch.nn as nn

from tests.golden.torch_ops import (axis_coords, gaussian_maps,
                                    marginal_softmax, spatial_softmax2d)


def conv_block(cin, cout, stride, groups):
    return nn.Sequential(
        nn.Conv2d(cin, cout, 3, stride=stride, padding=1),
        nn.GroupNorm(min(groups, cout), cout),
        nn.ReLU(),
    )


class TorchEncoder(nn.Module):
    def __init__(self, cin, filters, strides, groups):
        super().__init__()
        blocks = []
        for f, s in zip(filters, strides):
            blocks.append(conv_block(cin, f, s, groups))
            cin = f
        self.blocks = nn.Sequential(*blocks)

    def forward(self, x):
        return self.blocks(x)


class TorchKeyNet(nn.Module):
    def __init__(self, cin, num_keypoints, filters, strides, groups):
        super().__init__()
        self.trunk = TorchEncoder(cin, filters, strides, groups)
        self.head = nn.Conv2d(filters[-1], num_keypoints, 1)

    def forward(self, x):
        return self.head(self.trunk(x))


class TorchDecoder(nn.Module):
    def __init__(self, cin, cout, filters, upsample, groups):
        super().__init__()
        self.upsample = upsample
        blocks = []
        for f in filters:
            blocks.append(conv_block(cin, f, 1, groups))
            cin = f
        self.blocks = nn.ModuleList(blocks)
        self.head = nn.Conv2d(cin, cout, 3, padding=1)

    def forward(self, x):
        for up, block in zip(self.upsample, self.blocks):
            if up:
                x = torch.repeat_interleave(
                    torch.repeat_interleave(x, 2, dim=2), 2, dim=3)
            x = block(x)
        return self.head(x)


class TorchKeypointAutoencoder(nn.Module):
    def __init__(self, num_keypoints=4, in_channels=1, out_channels=1,
                 sigma=0.1, temperature=1.0, variant="marginal",
                 encoder_filters=(32, 32, 64, 64, 128),
                 encoder_strides=(1, 2, 1, 2, 1),
                 decoder_filters=(128, 64, 32),
                 decoder_upsample=(True, True, False), groups=8):
        super().__init__()
        self.sigma = sigma
        self.temperature = temperature
        self.variant = variant
        self.encoder = TorchEncoder(in_channels, encoder_filters,
                                    encoder_strides, groups)
        self.keynet = TorchKeyNet(in_channels, num_keypoints, encoder_filters,
                                  encoder_strides, groups)
        self.decoder = TorchDecoder(encoder_filters[-1] + num_keypoints,
                                    out_channels, decoder_filters,
                                    decoder_upsample, groups)

    def extract_keypoints(self, x):
        hm = self.keynet(x)
        fn = marginal_softmax if self.variant == "marginal" else spatial_softmax2d
        return fn(hm, self.temperature)

    def forward(self, x_src, x_tgt):
        fmap = self.encoder(x_src)
        kp = self.extract_keypoints(x_tgt)
        g = gaussian_maps(kp, fmap.shape[2], fmap.shape[3], self.sigma)
        recon = self.decoder(torch.cat([fmap, g], dim=1))
        return recon, kp


class TorchTransporter(nn.Module):
    """Golden Kulkarni-2019 Transporter: transport equation + stop-grads.

    Written in torch idiom from the published equations (feature transport
    with detached source branch, keypoint-max attention masks) — the parity
    reference for ``keypoints_tpu.models.Transporter``, including the
    GRADIENT structure: ``.detach()`` here must behave exactly like
    ``jax.lax.stop_gradient`` there (tested via parameter-grad agreement).
    """

    def __init__(self, num_keypoints=4, in_channels=1, out_channels=1,
                 sigma=0.1, temperature=1.0, variant="marginal",
                 encoder_filters=(32, 32, 64, 64, 128),
                 encoder_strides=(1, 2, 1, 2, 1),
                 decoder_filters=(128, 64, 32),
                 decoder_upsample=(True, True, False), groups=8):
        super().__init__()
        self.sigma = sigma
        self.temperature = temperature
        self.variant = variant
        self.encoder = TorchEncoder(in_channels, encoder_filters,
                                    encoder_strides, groups)
        self.keynet = TorchKeyNet(in_channels, num_keypoints, encoder_filters,
                                  encoder_strides, groups)
        self.decoder = TorchDecoder(encoder_filters[-1], out_channels,
                                    decoder_filters, decoder_upsample, groups)

    def _heat(self, x):
        hm = self.keynet(x)
        fn = marginal_softmax if self.variant == "marginal" else spatial_softmax2d
        kp = fn(hm, self.temperature)
        g = gaussian_maps(kp, hm.shape[2], hm.shape[3], self.sigma)
        return kp, g.max(dim=1, keepdim=True).values     # (B, 1, h, w)

    def extract_keypoints(self, x):
        hm = self.keynet(x)
        fn = marginal_softmax if self.variant == "marginal" else spatial_softmax2d
        return fn(hm, self.temperature)

    def forward(self, x_src, x_tgt):
        phi_s = self.encoder(x_src).detach()
        phi_t = self.encoder(x_tgt)
        _, g_s = self._heat(x_src)
        g_s = g_s.detach()
        kp_t, g_t = self._heat(x_tgt)
        transported = (1.0 - g_s) * (1.0 - g_t) * phi_s + g_t * phi_t
        return self.decoder(transported), kp_t


def rename_map_for_flax() -> dict[str, str]:
    """torch module paths → flax param paths for the converter.

    flax (setup-based) names: encoder/Conv_i, encoder/GroupNorm_i,
    keynet/trunk/Conv_i, keynet/head, decoder/Conv_i, decoder/GroupNorm_i,
    decoder/head.
    """
    m = {}
    for i in range(16):
        m[f"encoder.blocks.{i}.0"] = f"encoder.Conv_{i}"
        m[f"encoder.blocks.{i}.1"] = f"encoder.GroupNorm_{i}"
        m[f"keynet.trunk.blocks.{i}.0"] = f"keynet.trunk.Conv_{i}"
        m[f"keynet.trunk.blocks.{i}.1"] = f"keynet.trunk.GroupNorm_{i}"
        m[f"decoder.blocks.{i}.0"] = f"decoder.Conv_{i}"
        m[f"decoder.blocks.{i}.1"] = f"decoder.GroupNorm_{i}"
    m["keynet.head"] = "keynet.head"
    m["decoder.head"] = "decoder.head"
    return m
