"""Tracking model components.

Reference: ``network/tracking_base.py``, ``network/tracking_heads.py``.
The reference wraps the backbone with a stateful feature cache; here the
model is purely functional — the video pipeline threads the previous
frame's feature map explicitly:

  training: images are interleaved pairs (2B, H, W, 3); single-image heads
  see frames [::2], the Tcaf head sees both frames of each pair.
  eval: ``backbone`` is applied per frame, the caller stacks
  [feat_t, feat_{t-1}] into an interleaved pair batch and calls ``heads``.
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .. import headmeta
from .heads import CompositeField4


class TBaseSingleImage(nn.Module):
    """Apply a CompositeField4 to the primary frame of each pair
    (``tracking_heads.py:6-37``)."""
    meta: headmeta.Base
    tracking_pose_length: int = 2

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = x[::self.tracking_pose_length]
        return CompositeField4(meta=self.meta)(x, train=train)


class Tcaf(nn.Module):
    """Temporal CAF head (``tracking_heads.py:40-103``): shared 1x1 feature
    reduction to 512, frame-pair concatenation, 1x1 compute, CF4."""
    meta: headmeta.Tcaf
    tracking_pose_length: int = 2
    reduced_features: int = 512

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if x.shape[0] % 2 == 1:
            return None

        x = nn.Conv(self.reduced_features, (1, 1), use_bias=True,
                    name='feature_reduction')(x)
        x = nn.relu(x)

        primary = x[::self.tracking_pose_length]
        other = x[1::self.tracking_pose_length]
        x = jnp.concatenate([primary, other], axis=-1)

        x = nn.Conv(self.reduced_features * 2, (1, 1), use_bias=True,
                    name='feature_compute')(x)
        x = nn.relu(x)
        return CompositeField4(meta=self.meta)(x, train=train)


class TrackingShell(nn.Module):
    """Shell over interleaved frame-pair batches.

    head_nets: TBaseSingleImage / Tcaf modules.
    """
    base_net: nn.Module
    head_nets: Sequence[nn.Module]

    @property
    def head_metas(self):
        return [hn.meta for hn in self.head_nets]

    def backbone(self, image_batch, *, train: bool = False):
        return self.base_net(image_batch, train=train)

    def heads(self, feats, *, train: bool = False, head_mask=None):
        if head_mask is not None:
            return tuple(
                hn(feats, train=train) if m else None
                for hn, m in zip(self.head_nets, head_mask))
        return tuple(hn(feats, train=train) for hn in self.head_nets)

    @nn.compact
    def __call__(self, image_batch, *, train: bool = False, head_mask=None,
                 bn_train=None):
        feats = self.backbone(
            image_batch, train=train if bn_train is None else bn_train)
        return self.heads(feats, train=train, head_mask=head_mask)
