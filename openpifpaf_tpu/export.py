"""Model export CLI.

TPU-native replacement for the reference's ONNX/TorchScript/CoreML exports
(``export_onnx.py``, ``export_torchscript.py``, ``export_coreml.py``):
exports the jitted forward (and optionally forward+decode) as StableHLO —
the portable XLA program format that any PJRT runtime (TPU/GPU/CPU, IREE,
etc.) can consume — plus the orbax weight arrays.

Example:
    python -m openpifpaf_tpu.export --checkpoint model --outfile model.stablehlo
"""

import argparse
import logging
import os

import jax
import jax.numpy as jnp

from . import datasets
from .models import factory as models_factory

LOG = logging.getLogger(__name__)


def export_stablehlo(model, variables, *, input_shape=(1, 481, 641, 3),
                     with_decoder=False, head_metas=None):
    """Returns StableHLO MLIR text of the inference function."""

    if with_decoder:
        from .ops import build_cifcaf_decoder
        cif_meta, caf_meta = head_metas[:2]
        decoder = build_cifcaf_decoder(
            stride=cif_meta.stride, skeleton=caf_meta.skeleton,
            n_keypoints=len(cif_meta.keypoints))

        def forward(variables, image):
            cif, caf = model.apply(variables, image, train=False)
            return decoder(cif, caf)
    else:
        def forward(variables, image):
            return model.apply(variables, image, train=False)

    dummy = jnp.zeros(input_shape, dtype=jnp.float32)
    lowered = jax.jit(forward).lower(variables, dummy)
    return lowered.as_text()


def _build_forward(model, variables, *, with_decoder, head_metas):
    if with_decoder:
        from .ops import build_cifcaf_decoder
        cif_meta, caf_meta = head_metas[:2]
        decoder = build_cifcaf_decoder(
            stride=cif_meta.stride, skeleton=caf_meta.skeleton,
            n_keypoints=len(cif_meta.keypoints))

        def forward(image):
            cif, caf = model.apply(variables, image, train=False)
            poses, keep, _ = decoder(cif, caf)
            return poses, keep
        return forward

    def forward(image):
        return model.apply(variables, image, train=False)
    return forward


def export_savedmodel(model, variables, outdir, *,
                      input_shape=(1, 481, 641, 3),
                      with_decoder=False, head_metas=None,
                      platforms=('cpu', 'tpu')):
    """Export as a TF SavedModel via jax2tf (native StableHLO serialization).

    The deployment counterpart of the reference's scripted EncoderDecoder
    TorchScript export (``export_torchscript.py:15-66``): with
    ``with_decoder=True`` the serving signature maps a preprocessed image
    batch directly to pose tensors ``(poses (B,P,K,4), keep (B,P))`` so the
    standalone C++ runner (``cpp/``) needs no Python at all.
    """
    import tensorflow as tf
    from jax.experimental import jax2tf

    forward = _build_forward(model, variables, with_decoder=with_decoder,
                             head_metas=head_metas)
    tf_forward = jax2tf.convert(
        forward, native_serialization_platforms=tuple(platforms),
        with_gradient=False)

    module = tf.Module()
    module.f = tf.function(
        tf_forward,
        input_signature=[tf.TensorSpec(input_shape, tf.float32, name='image')],
        jit_compile=True)
    concrete = module.f.get_concrete_function()
    tf.saved_model.save(
        module, outdir, signatures={'serving_default': concrete},
        options=tf.saved_model.SaveOptions(experimental_custom_gradients=False))
    return outdir


def export_tflite(model, variables, outfile, *,
                  input_shape=(1, 481, 641, 3)):
    """Export the field head network as a .tflite flatbuffer.

    Mobile-deployment counterpart of the reference's CoreML export
    (``export_coreml.py``). Fields only (the device decoder's while-loops
    aren't TFLite ops); decode runs with the host decoder or the C++
    runner. Uses jax2tf graph serialization so the TFLite converter sees
    plain TF ops; SELECT_TF_OPS covers anything without a builtin kernel.
    """
    import tensorflow as tf
    from jax.experimental import jax2tf

    def forward(image):
        return model.apply(variables, image, train=False)

    tf_forward = jax2tf.convert(forward, native_serialization=False,
                                with_gradient=False)
    f = tf.function(
        tf_forward,
        input_signature=[tf.TensorSpec(input_shape, tf.float32,
                                       name='image')])
    converter = tf.lite.TFLiteConverter.from_concrete_functions(
        [f.get_concrete_function()])
    converter.target_spec.supported_ops = [
        tf.lite.OpsSet.TFLITE_BUILTINS, tf.lite.OpsSet.SELECT_TF_OPS]
    blob = converter.convert()
    with open(outfile, 'wb') as out:
        out.write(blob)
    return outfile


def main():
    # the environment may force a platform through sitecustomize-level
    # jax.config (which beats the env var); re-apply the env var so
    # `JAX_PLATFORMS=cpu python -m openpifpaf_tpu.export` does what it says
    if os.environ.get('JAX_PLATFORMS'):
        jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])

    parser = argparse.ArgumentParser(prog='python3 -m openpifpaf_tpu.export')
    parser.add_argument('--checkpoint', default=None)
    parser.add_argument('--basenet', default='shufflenetv2k16')
    parser.add_argument('--dataset', default='cocokp')
    parser.add_argument('--outfile', default='openpifpaf_tpu.stablehlo')
    parser.add_argument('--input-height', type=int, default=481)
    parser.add_argument('--input-width', type=int, default=641)
    parser.add_argument('--with-decoder', default=False, action='store_true',
                        help='include the CifCaf decode pipeline in the '
                             'exported program')
    parser.add_argument('--format', default='stablehlo',
                        choices=('stablehlo', 'savedmodel', 'tflite'),
                        help='stablehlo: portable MLIR text; savedmodel: '
                             'TF SavedModel directory for the C++ runner; '
                             'tflite: mobile flatbuffer (fields only)')
    args = parser.parse_args()

    if args.checkpoint:
        from .training import checkpoint as ckpt_mod
        model, variables = ckpt_mod.load_shell(args.checkpoint)
        head_metas = model.head_metas
    else:
        datamodule = datasets.factory(args.dataset)
        net_factory = models_factory.Factory(base_name=args.basenet)
        model, init_fn = net_factory.from_scratch(datamodule.head_metas)
        variables = init_fn(jax.random.PRNGKey(0))
        head_metas = datamodule.head_metas

    input_shape = (1, args.input_height, args.input_width, 3)
    if args.format == 'tflite':
        if args.with_decoder:
            parser.error('--with-decoder is not supported for tflite '
                         '(decoder while-loops are not TFLite ops)')
        export_tflite(model, variables, args.outfile,
                      input_shape=input_shape)
        LOG.info('wrote %s (%d bytes)', args.outfile,
                 os.path.getsize(args.outfile))
        print(f'wrote TFLite model {args.outfile}')
        return
    if args.format == 'savedmodel':
        export_savedmodel(
            model, variables, args.outfile, input_shape=input_shape,
            with_decoder=args.with_decoder, head_metas=head_metas)
        print(f'wrote SavedModel {args.outfile}')
        return

    text = export_stablehlo(
        model, variables,
        input_shape=input_shape,
        with_decoder=args.with_decoder,
        head_metas=head_metas)

    with open(args.outfile, 'w') as f:
        f.write(text)
    LOG.info('wrote %s (%d bytes)', args.outfile, os.path.getsize(args.outfile))
    print(f'wrote {args.outfile}')


if __name__ == '__main__':
    main()
