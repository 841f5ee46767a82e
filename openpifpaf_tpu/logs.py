"""Logs CLI (reference ``logs.py``): plot training log JSON-lines files
(loss curves, learning rate, epoch summaries)."""

import argparse
import json
from pprint import pprint


def read_log(path):
    entries = []
    with open(path, 'r') as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                data = json.loads(line)
            except json.JSONDecodeError:
                continue
            entries.append(data)
    return entries


def read_eval_stats(log_file, eval_suffix):
    """Collect <checkpoint>.epochNNN<eval_suffix> stats (AP over epochs,
    reference logs.py eval plots)."""
    import glob
    import re

    base = log_file[:-len('.log')] if log_file.endswith('.log') else log_file
    points = []
    for path in sorted(glob.glob(base + '.epoch*' + eval_suffix)):
        m = re.search(r'\.epoch(\d+)', path)
        if not m:
            continue
        try:
            with open(path) as f:
                stats = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        values = stats.get('stats')
        if values:
            points.append((int(m.group(1)), values[0]))
    return sorted(points)


def plot_logs(log_files, *, output_prefix=None, show=False,
              first_epoch=1e-6, share_y=True, show_mtl_sigmas=False,
              labels=None, eval_suffix='.eval-*.stats.json'):
    import matplotlib
    if not show:
        matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    n_rows = 3 if show_mtl_sigmas else 2
    fig, axs = plt.subplots(n_rows, 2, figsize=(12, 4 * n_rows),
                            sharey='row' if share_y else False)

    if labels is not None:
        assert len(labels) == len(log_files)
    else:
        labels = log_files

    for path, label in zip(log_files, labels):
        entries = read_log(path)
        train = [e for e in entries if e.get('type') == 'train']
        epochs_train = [e for e in entries if e.get('type') == 'train-epoch']
        epochs_val = [e for e in entries if e.get('type') == 'val-epoch']

        x = [e['epoch'] + e['batch'] / max(1, e.get('n_batches', 1))
             for e in train]
        # --first-epoch: clip the x axis start (reference logs.py:584)
        train = [e for e, xi in zip(train, x) if xi >= first_epoch]
        x = [xi for xi in x if xi >= first_epoch]
        epochs_train = [e for e in epochs_train
                        if e['epoch'] >= first_epoch]
        epochs_val = [e for e in epochs_val if e['epoch'] >= first_epoch]
        axs[0][0].plot(x, [e['loss'] for e in train], label=label)
        axs[0][0].set_title('train loss')
        axs[0][0].set_yscale('symlog')

        axs[0][1].plot(x, [e['lr'] for e in train], label=label)
        axs[0][1].set_title('learning rate')
        axs[0][1].set_yscale('log')

        axs[1][0].plot([e['epoch'] for e in epochs_train],
                       [e['loss'] for e in epochs_train],
                       'o-', label=label + ' (train)')
        axs[1][0].plot([e['epoch'] for e in epochs_val],
                       [e['loss'] for e in epochs_val],
                       'x-', label=label + ' (val)')
        axs[1][0].set_title('epoch loss')

        axs[1][1].plot(x, [e.get('time', 0) for e in train], label=label)
        axs[1][1].set_title('batch time [s]')

        eval_points = read_eval_stats(path, eval_suffix)
        if eval_points:
            ax_ap = axs[1][0].twinx()
            ax_ap.plot([e for e, _ in eval_points],
                       [v for _, v in eval_points],
                       's--', color='tab:green', label=label + ' (AP)')
            ax_ap.set_ylabel('AP')

        if show_mtl_sigmas:
            sigma_entries = [(xi, e['mtl_sigmas'])
                             for xi, e in zip(x, train)
                             if e.get('mtl_sigmas')]
            if sigma_entries:
                xs = [xi for xi, _ in sigma_entries]
                n_sigmas = len(sigma_entries[0][1])
                for si in range(n_sigmas):
                    axs[2][0].plot(
                        xs, [s[si] for _, s in sigma_entries],
                        label=f'{label} sigma{si}')
            axs[2][0].set_title('mtl log-sigmas')
            axs[2][1].set_axis_off()

    for ax in axs.flat:
        ax.legend(fontsize=6)
        ax.set_xlabel('epoch')

    fig.tight_layout()
    if output_prefix:
        out = output_prefix if output_prefix.endswith('.png') \
            else output_prefix + '.png'
        fig.savefig(out, dpi=150)
        print(f'wrote {out}')
    if show:
        plt.show()
    plt.close(fig)


def main():
    parser = argparse.ArgumentParser(prog='python3 -m openpifpaf_tpu.logs')
    parser.add_argument('log_file', nargs='+')
    parser.add_argument('-o', '--output', default=None,
                        help='output prefix for plots')
    parser.add_argument('--show', default=False, action='store_true')
    parser.add_argument('--print-last', default=False, action='store_true',
                        help='print the last entries instead of plotting')
    parser.add_argument('--first-epoch', default=1e-6, type=float,
                        help='epoch to start plotting from')
    parser.add_argument('--no-share-y', dest='share_y',
                        default=True, action='store_false',
                        help='do not share y-axes within plot rows')
    parser.add_argument('--show-mtl-sigmas', default=False,
                        action='store_true',
                        help='plot the auto-tuned multi-task log-sigmas')
    parser.add_argument('--label', nargs='+', default=None,
                        help='legend labels, one per log file')
    parser.add_argument('--eval-suffix', default='.eval-*.stats.json',
                        help='glob suffix of eval stats files to plot '
                             'AP over epochs')
    args = parser.parse_args()

    if args.print_last:
        for path in args.log_file:
            entries = read_log(path)
            pprint(entries[-5:])
        return

    output = args.output or args.log_file[0]
    plot_logs(args.log_file, output_prefix=output, show=args.show,
              first_epoch=args.first_epoch, share_y=args.share_y,
              show_mtl_sigmas=args.show_mtl_sigmas,
              labels=args.label, eval_suffix=args.eval_suffix)


if __name__ == '__main__':
    main()
