"""Shell: base network + head networks (reference ``network/nets.py:7-89``)."""

from typing import Any, Sequence

import flax.linen as nn


class Shell(nn.Module):
    base_net: nn.Module
    head_nets: Sequence[nn.Module]

    @property
    def head_metas(self):
        return [hn.meta for hn in self.head_nets]

    @nn.compact
    def __call__(self, image_batch, *, train: bool = False, head_mask=None,
                 bn_train=None):
        # bn_train overrides the batch-norm mode of the base net only
        # (reference --fix-batch-norm puts BN modules in eval mode while
        # the rest of the model stays in train mode, trainer.py:273-279)
        x = self.base_net(
            image_batch, train=train if bn_train is None else bn_train)
        if head_mask is not None:
            return tuple(
                hn(x, train=train) if m else None
                for hn, m in zip(self.head_nets, head_mask))
        return tuple(hn(x, train=train) for hn in self.head_nets)


def assign_strides(head_metas, base_stride: int):
    """Set head_index and base_stride on metas (nets.py:25-33)."""
    for i, meta in enumerate(head_metas):
        meta.head_index = i
        meta.base_stride = base_stride
    return head_metas
