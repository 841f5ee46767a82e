"""CLI flag parity against the reference, mechanized.

Statically parses every literal ``add_argument('--flag', ...)`` from the
reference sources (AST walk; no torch import needed) and harvests this
repo's flags at runtime by building every CLI's parser (our datamodule
flags are f-string generated, so a static scan can't see them). Any
reference flag without an equivalent here must be on the documented
exception list below (mirrored in COVERAGE.md's "CLI flag parity"
section) — anything else is a regression.
"""

import argparse
import ast
import glob
import importlib
import os

import pytest

REFERENCE_ROOT = '/root/reference/src/openpifpaf'

# Reference flags intentionally without an equivalent, with the reason.
# Keep in sync with COVERAGE.md "CLI flag parity".
DOCUMENTED_EXCEPTIONS = {
    # torch/CUDA-specific distribution machinery: DP here is the jax mesh
    # (training/trainer.py); SyncBN holds by construction (BN stats over
    # the globally sharded batch)
    '--ddp': 'torch DDP launch flag; mesh data-parallelism replaces it',
    '--local_rank': 'torch.distributed rank plumbing',
    '--no-sync-batchnorm': 'SyncBN holds by construction on the mesh',
    '--disable-cuda': 'device selection is JAX_PLATFORMS',
    # CompositeField3 is supported as checkpoint conversion, not as a
    # runtime head (models/convert_torch.py channel-permutes CF3 convs
    # into CF4 layout; tests/test_convert_torch.py::test_cf3_head_conversion)
    '--cf3-dropout': 'CF3 runs only via conversion to CF4',
    '--cf3-no-inplace-ops': 'no inplace-op distinction under XLA',
    '--cf4-no-inplace-ops': 'no inplace-op distinction under XLA',
    # exporter-specific options of exporters we replace (ONNX/CoreML ->
    # StableHLO/SavedModel/TFLite, export.py)
    '--simplify': 'onnx-simplifier option of the ONNX exporter',
    '--check': 'onnxruntime check of the ONNX exporter',
    '--minimum-deployment-target': 'CoreML exporter option',
}

# (module, parser-building callable) pairs covering every CLI surface
CLI_ENTRYPOINTS = [
    ('openpifpaf_tpu.train', 'cli'),
    ('openpifpaf_tpu.predict', 'cli'),
    ('openpifpaf_tpu.eval_cli', 'cli'),
    ('openpifpaf_tpu.video', 'cli'),
    ('openpifpaf_tpu.benchmark', 'main'),
    ('openpifpaf_tpu.logs', 'main'),
    ('openpifpaf_tpu.export', 'main'),
    ('openpifpaf_tpu.count_ops', 'main'),
    ('openpifpaf_tpu.migrate', 'main'),
    ('openpifpaf_tpu.plugins.posetrack.benchmark', 'cli'),
    ('openpifpaf_tpu.plugins.apollocar3d.apollo_to_coco', 'cli'),
    ('openpifpaf_tpu.plugins.animalpose.voc_to_coco', 'cli'),
]


def reference_flags():
    out = {}
    for path in glob.glob(os.path.join(REFERENCE_ROOT, '**', '*.py'),
                          recursive=True):
        with open(path, encoding='utf8') as f:
            try:
                tree = ast.parse(f.read())
            except SyntaxError:
                continue
        for node in ast.walk(tree):
            if (isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr == 'add_argument'
                    and node.args
                    and isinstance(node.args[0], ast.Constant)
                    and isinstance(node.args[0].value, str)
                    and node.args[0].value.startswith('--')):
                out.setdefault(node.args[0].value, set()).add(
                    os.path.relpath(path, REFERENCE_ROOT))
    return out


class _Bail(Exception):
    pass


def our_flags():
    """Build every CLI parser; intercept parse to harvest option strings."""
    collected = set()

    def harvest(self, *args, **kwargs):
        collected.update(self._option_string_actions)
        raise _Bail()

    real_parse = argparse.ArgumentParser.parse_args
    real_known = argparse.ArgumentParser.parse_known_args
    argparse.ArgumentParser.parse_args = harvest
    argparse.ArgumentParser.parse_known_args = harvest
    try:
        for mod_name, fn_name in CLI_ENTRYPOINTS:
            mod = importlib.import_module(mod_name)
            try:
                getattr(mod, fn_name)()
            except _Bail:
                pass
    finally:
        argparse.ArgumentParser.parse_args = real_parse
        argparse.ArgumentParser.parse_known_args = real_known
    return collected


@pytest.mark.skipif(not os.path.isdir(REFERENCE_ROOT),
                    reason='reference mount not available')
def test_flag_parity():
    ref = reference_flags()
    ours = our_flags()
    assert len(ours) > 250  # the harvest actually ran

    missing = {
        flag: sorted(files)
        for flag, files in ref.items()
        if flag not in ours and flag not in DOCUMENTED_EXCEPTIONS
    }
    assert not missing, (
        f'{len(missing)} reference flags have no equivalent and are not '
        f'on the documented exception list: {missing}')

    # the exception list must not rot: every entry still exists in the
    # reference and is still actually absent here
    for flag in DOCUMENTED_EXCEPTIONS:
        assert flag in ref, f'stale exception (gone from reference): {flag}'
        assert flag not in ours, f'stale exception (now implemented): {flag}'
