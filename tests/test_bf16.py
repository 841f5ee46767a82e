"""bf16 backbone inference: numerically close to f32, same field layout."""

import jax
import numpy as np

import openpifpaf_tpu
from openpifpaf_tpu.models import factory as models_factory
from openpifpaf_tpu.predictor import Predictor


def test_bf16_forward_close_to_f32():
    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    f = models_factory.Factory(base_name='resnet18')
    model, init_fn = f.from_scratch(datamodule.head_metas)
    variables = init_fn(jax.random.PRNGKey(0), (1, 65, 65, 3))

    rng = np.random.RandomState(0)
    image = rng.randn(1, 97, 129, 3).astype(np.float32)

    p32 = Predictor(model=model, variables=variables)
    p32.size_bucket = 0
    cif32, caf32 = (np.asarray(x) for x in p32.forward_fn(variables, image))

    p16 = Predictor(model=model, variables=variables)
    p16.bf16 = True
    p16.size_bucket = 0
    cif16, caf16 = (np.asarray(x) for x in p16.forward_fn(variables, image))

    assert cif16.shape == cif32.shape
    assert caf16.shape == caf32.shape
    assert cif16.dtype == np.float32

    # confidences (channel 1) stay close in [0, 1]
    np.testing.assert_allclose(cif16[:, :, 1], cif32[:, :, 1], atol=0.05)
    # regression coordinates (channels 2:4) within a fraction of a cell
    np.testing.assert_allclose(cif16[:, :, 2:4], cif32[:, :, 2:4], atol=0.5)
