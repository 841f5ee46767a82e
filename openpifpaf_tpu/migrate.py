"""Migrate CLI (reference ``migrate.py:11-46``): re-save a checkpoint into
the current class/metadata layout."""

import argparse

from .training import checkpoint as ckpt_mod


def main():
    parser = argparse.ArgumentParser(prog='python3 -m openpifpaf_tpu.migrate')
    parser.add_argument('--checkpoint', required=True)
    parser.add_argument('--output', default=None)
    args = parser.parse_args()

    if args.output is None:
        args.output = args.checkpoint + '.migrated'

    arrays, meta = ckpt_mod.load(args.checkpoint)
    # re-serialize head metas through the current dataclasses
    metas = [ckpt_mod.headmeta_from_dict(d) for d in meta['head_metas']]
    meta['head_metas'] = [ckpt_mod.headmeta_to_dict(m) for m in metas]

    ckpt_mod.save(args.output, params=arrays['params'],
                  batch_stats=arrays['batch_stats'], meta=meta)
    print(f'wrote {args.output}')


if __name__ == '__main__':
    main()
