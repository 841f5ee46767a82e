"""Smoke test for the logs CLI: every panel renders to a file.

Builds a synthetic training log (the trainer's JSON-lines schema:
config/train/train-epoch/val-epoch rows) plus watch-style eval stats
files, runs ``python -m openpifpaf_tpu.logs``, and asserts all panel PNGs
exist (reference surface: logs.py Plots + EvalPlots)."""

import json
import os
import subprocess
import sys

PYTHON = sys.executable


def write_synthetic_log(path):
    field_names = ['cocokp.cif.c', 'cocokp.cif.vec', 'cocokp.cif.scales',
                   'cocokp.caf.c', 'cocokp.caf.vec', 'cocokp.caf.scales']
    rows = [{'type': 'config', 'field_names': field_names,
             'argv': ['train.py', '--dataset=cocokp']}]
    t0 = 0
    for epoch in range(3):
        for batch in range(5):
            t0 += 30
            rows.append({
                'type': 'train', 'epoch': epoch, 'batch': batch,
                'n_batches': 5, 'time': 0.5, 'data_time': 0.1,
                'lr': 1e-4 * (1 + epoch),
                'loss': 100.0 / (1 + epoch + batch / 5.0),
                'head_losses': [10.0 / (1 + epoch)] * 6,
                'mtl_sigmas': [0.1 * (1 + epoch)] * 6,
                'asctime': f'2026-08-17 08:{t0 // 60:02d}:{t0 % 60:02d},000',
            })
        rows.append({'type': 'train-epoch', 'epoch': epoch + 1,
                     'loss': 100.0 / (1 + epoch), 'time': 150.0,
                     'n_batches': 5,
                     'head_losses': [10.0 / (1 + epoch)] * 6})
        rows.append({'type': 'val-epoch', 'epoch': epoch + 1,
                     'loss': 110.0 / (1 + epoch), 'time': 20.0,
                     'n_batches': 2,
                     'head_losses': [11.0 / (1 + epoch)] * 6})
    with open(path, 'w') as f:
        for row in rows:
            f.write(json.dumps(row) + '\n')


def write_eval_stats(base):
    for epoch in (1, 2, 3):
        stats = {
            'stats': [0.1 * epoch, 0.2 * epoch, 0.1 * epoch, 0.1, 0.2,
                      0.15 * epoch, 0.25 * epoch, 0.12, 0.1, 0.2],
            'text_labels': ['AP', 'AP0.5', 'AP0.75', 'APM', 'APL',
                            'AR', 'AR0.5', 'AR0.75', 'ARM', 'ARL'],
            'dataset': 'cocokp',
            'count_ops': [12.3e9, 17.2e6],
        }
        with open(f'{base}.epoch{epoch:03d}.eval-cocokp.stats.json',
                  'w') as f:
            json.dump(stats, f)


def test_logs_cli_writes_all_panels(tmp_path):
    log_file = str(tmp_path / 'model.log')
    write_synthetic_log(log_file)
    write_eval_stats(str(tmp_path / 'model'))

    prefix = str(tmp_path / 'plots.')
    env = dict(os.environ, JAX_PLATFORMS='cpu', PYTHONPATH=os.getcwd(),
               MPLBACKEND='Agg')
    result = subprocess.run(
        [PYTHON, '-m', 'openpifpaf_tpu.logs', log_file,
         '-o', prefix, '--show-mtl-sigmas'],
        env=env, capture_output=True, timeout=300)
    assert result.returncode == 0, result.stderr.decode()[-2000:]

    for panel in ('time', 'epoch-time', 'lr', 'epoch-loss',
                  'preprocess-time', 'train', 'epoch-head', 'train-head',
                  'mtl-sigmas', 'eval', 'frame-ops'):
        path = prefix + panel + '.png'
        assert os.path.exists(path), f'missing panel: {panel}'
        assert os.path.getsize(path) > 1000
    # the plotting CLI must not create a log file of its own
    assert not os.path.exists(prefix + '.log')
    assert not os.path.exists(prefix + 'log')


def test_logs_print_last(tmp_path):
    log_file = str(tmp_path / 'model.log')
    write_synthetic_log(log_file)
    env = dict(os.environ, JAX_PLATFORMS='cpu', PYTHONPATH=os.getcwd())
    result = subprocess.run(
        [PYTHON, '-m', 'openpifpaf_tpu.logs', log_file, '--print-last'],
        env=env, capture_output=True, timeout=120)
    assert result.returncode == 0, result.stderr.decode()[-2000:]
    assert b"'type': 'train'" in result.stdout
