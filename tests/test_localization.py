"""Pixel-to-field alignment (reference tests/test_localization.py:6-42).

A single bright pixel at image column x must perturb exactly the CIF cells
whose receptive field covers x: stride-16 resnet18, 321 px -> 21 cells.
The active-cell windows below are the reference's recorded expectations;
matching them proves the conv padding/stride chain is aligned with the
reference (and hence with its encoder/decoder coordinate convention).
"""

import jax
import jax.numpy as jnp
import numpy as np

import openpifpaf_tpu
from openpifpaf_tpu.models import factory as models_factory

_CACHE = {}


def _model():
    if 'model' not in _CACHE:
        datamodule = openpifpaf_tpu.datasets.factory('cocokp')
        net_factory = models_factory.Factory(base_name='resnet18')
        model, init_fn = net_factory.from_scratch(datamodule.head_metas)
        variables = init_fn(jax.random.PRNGKey(0), (1, 97, 129, 3))
        forward = jax.jit(lambda im: model.apply(variables, im, train=False))
        black = jnp.zeros((1, 321, 321, 3))
        _CACHE['model'] = (forward, np.asarray(forward(black)[0]))
    return _CACHE['model']


def localize(x):
    forward, cif_ref = _model()

    im = np.zeros((1, 321, 321, 3), dtype=np.float32)
    im[0, 0, x, :] = 1000.0
    cif = np.asarray(forward(jnp.asarray(im))[0])

    # intensity only, first field, first row
    ref_row = cif_ref[0, 0, 0, 0]
    row = cif[0, 0, 0, 0]
    assert len(ref_row) == 21  # (321 - 1) / 16 + 1

    active = np.nonzero(ref_row - row)
    return active[0].tolist()


def test_pixel_to_field_left():
    assert localize(0) == [0, 1, 2, 3, 4, 5, 6]


def test_pixel_to_field_center():
    assert localize(160) == [4, 5, 6, 7, 8, 9, 10,
                             11, 12, 13, 14, 15, 16]


def test_pixel_to_field_right():
    assert localize(320) == [14, 15, 16, 17, 18, 19, 20]
