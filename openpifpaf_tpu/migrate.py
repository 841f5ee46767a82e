"""Migrate CLI (reference ``migrate.py:11-46``): re-save a checkpoint into
the current layout.

Two inputs are supported:
  - a checkpoint of this framework (``<path>.arrays`` + ``<path>.json``) —
    re-serialized through the current headmeta dataclasses;
  - a *reference* (PyTorch OpenPifPaf) checkpoint file — converted to flax
    params/batch_stats via :mod:`openpifpaf_tpu.models.convert_torch`.
"""

import argparse
import os

from .training import checkpoint as ckpt_mod


def main():
    parser = argparse.ArgumentParser(prog='python3 -m openpifpaf_tpu.migrate')
    parser.add_argument('--checkpoint', required=True,
                        help='checkpoint of this framework, or a reference '
                             'PyTorch checkpoint file to convert')
    parser.add_argument('--output', default=None)
    parser.add_argument('--base-name', default=None,
                        help='override backbone detection for torch inputs')
    args = parser.parse_args()

    if args.output is None:
        args.output = args.checkpoint + '.migrated'

    if os.path.isfile(args.checkpoint) \
            and not os.path.exists(args.checkpoint + '.json'):
        from .models import convert_torch
        base_name, head_metas, variables, epoch = \
            convert_torch.convert_checkpoint(
                args.checkpoint, base_name=args.base_name)
        ckpt_mod.save_shell(
            args.output, base_name=base_name, head_metas=head_metas,
            params=variables['params'],
            batch_stats=variables['batch_stats'], epoch=epoch,
            extra_meta={'converted_from': os.path.abspath(args.checkpoint)})
        print(f'converted torch checkpoint ({base_name}) -> {args.output}')
        return

    arrays, meta = ckpt_mod.load(args.checkpoint)
    # re-serialize head metas through the current dataclasses
    metas = [ckpt_mod.headmeta_from_dict(d) for d in meta['head_metas']]
    meta['head_metas'] = [ckpt_mod.headmeta_to_dict(m) for m in metas]

    ckpt_mod.save(args.output, params=arrays['params'],
                  batch_stats=arrays['batch_stats'], meta=meta)
    print(f'wrote {args.output}')


if __name__ == '__main__':
    main()
