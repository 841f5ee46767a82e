"""Composite-field head networks (Flax).

``CompositeField4`` mirrors the reference head (``network/heads.py:272-417``):
a single 1x1 convolution producing ``n_fields * n_components * u^2`` channels
with component layout [logb, confidences, vector pairs, scales], optional
PixelShuffle upsampling with symmetric crop, and in-graph inference
postprocessing (sigmoid on confidences, coordinate-index add on regressions,
softplus on scales) so that decoding consumes calibrated fields directly.
"""

import math

import flax.linen as nn
import jax.numpy as jnp

from .. import headmeta


def pixel_shuffle(x, upscale: int):
    """NHWC PixelShuffle matching torch semantics on the channel ordering:
    in-channel index = c * u^2 + i * u + j -> out (h*u + i, w*u + j, c)."""
    b, h, w, c = x.shape
    u = upscale
    x = x.reshape(b, h, w, c // (u * u), u, u)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, i, w, j, c
    return x.reshape(b, h * u, w * u, c // (u * u))


def index_field(shape):
    """(2, H, W) coordinate grid: channel 0 = x (column), 1 = y (row)."""
    h, w = shape
    xs = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, :], (h, w))
    ys = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32)[:, None], (h, w))
    return jnp.stack([xs, ys])


class CompositeField4(nn.Module):
    meta: headmeta.Base
    kernel_size: int = 1
    dilation: int = 1
    dropout_p: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        meta = self.meta
        n_components = meta.n_components
        upsample = meta.upsample_stride

        if self.dropout_p > 0.0:
            x = nn.Dropout(rate=self.dropout_p, deterministic=not train)(x)

        pad = (self.kernel_size - 1) // 2 * self.dilation
        x = nn.Conv(
            meta.n_fields * n_components * upsample ** 2,
            (self.kernel_size, self.kernel_size),
            padding=[(pad, pad), (pad, pad)],
            kernel_dilation=(self.dilation, self.dilation),
        )(x)

        if upsample > 1:
            x = pixel_shuffle(x, upsample)
            low_cut = (upsample - 1) // 2
            high_cut = math.ceil((upsample - 1) / 2.0)
            x = x[:, low_cut:x.shape[1] - high_cut,
                  low_cut:x.shape[2] - high_cut]

        batch, height, width, _ = x.shape
        x = x.reshape(batch, height, width, meta.n_fields, n_components)
        # reference layout: (B, F, C, H, W)
        x = x.transpose(0, 3, 4, 1, 2)

        if train:
            return x

        # in-graph postprocessing (heads.py:360-378)
        nc = meta.n_confidences
        nv = meta.n_vectors
        ns = meta.n_scales

        logb = x[:, :, 0:1]
        confidences = nn.sigmoid(x[:, :, 1:1 + nc])

        regs = x[:, :, 1 + nc:1 + nc + 2 * nv]
        if nv > 0:
            idx = index_field((height, width))[None, None]  # (1,1,2,H,W)
            offsets = []
            for i, do_offset in enumerate(meta.vector_offsets):
                reg = regs[:, :, 2 * i:2 * i + 2]
                if do_offset:
                    reg = reg + idx
                offsets.append(reg)
            regs = jnp.concatenate(offsets, axis=2)

        parts = [logb, confidences, regs]
        if ns > 0:
            scales = nn.softplus(x[:, :, 1 + nc + 2 * nv:1 + nc + 2 * nv + ns])
            parts.append(scales)
        return jnp.concatenate(parts, axis=2)


def pif_hflip(fields, keypoints, hflip):
    """Horizontal test-time flip of decoded CIF fields
    (reference ``network/heads.py:31-52``).

    fields: (B, F, C, H, W) with channel layout [logb, conf, x, y, scale].
    Returns fields of the mirrored image mapped back: left/right keypoint
    fields swapped, W axis reversed, x regression negated.
    """
    flip_indices = jnp.asarray([
        keypoints.index(hflip[kp]) if kp in hflip else i
        for i, kp in enumerate(keypoints)])
    out = fields[:, flip_indices, :, :, ::-1]
    return out.at[:, :, 2].multiply(-1.0)


def paf_hflip(fields, keypoints, skeleton, hflip):
    """Horizontal test-time flip of decoded CAF fields
    (reference ``network/heads.py:55-101``).

    fields: (B, F, C, H, W) with layout [logb, conf, x1, y1, x2, y2, s1, s2].
    """
    names = [(keypoints[a - 1], keypoints[b - 1]) for a, b in skeleton]
    flipped = [(hflip.get(a, a), hflip.get(b, b)) for a, b in names]
    flip_indices = list(range(len(skeleton)))
    reverse = []
    for i, (a, b) in enumerate(names):
        if (a, b) in flipped:
            flip_indices[i] = flipped.index((a, b))
        if (b, a) in flipped:
            flip_indices[i] = flipped.index((b, a))
            reverse.append(i)
    out = fields[:, jnp.asarray(flip_indices), :, :, ::-1]
    out = out.at[:, :, 2].multiply(-1.0)
    out = out.at[:, :, 4].multiply(-1.0)
    if reverse:
        rev = jnp.asarray(reverse)
        v1 = out[:, rev, 2:4]
        v2 = out[:, rev, 4:6]
        s1 = out[:, rev, 6:7]
        s2 = out[:, rev, 7:8]
        out = out.at[:, rev, 2:4].set(v2).at[:, rev, 4:6].set(v1)
        out = out.at[:, rev, 6:7].set(s2).at[:, rev, 7:8].set(s1)
    return out
