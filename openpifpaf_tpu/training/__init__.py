"""Training: losses, optimizer schedules, trainer, checkpointing."""

from . import losses
from .losses import (LOSSES, CompositeLoss, MultiHeadLoss,
                     MultiHeadLossAutoTuneKendall,
                     MultiHeadLossAutoTuneVariance)
