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


def plot_logs(log_files, *, output_prefix=None, show=False,
              first_epoch=1e-6, share_y=True, show_mtl_sigmas=False):
    import matplotlib
    if not show:
        matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    n_rows = 3 if show_mtl_sigmas else 2
    fig, axs = plt.subplots(n_rows, 2, figsize=(12, 4 * n_rows),
                            sharey='row' if share_y else False)

    for path in log_files:
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
        axs[0][0].plot(x, [e['loss'] for e in train], label=path)
        axs[0][0].set_title('train loss')
        axs[0][0].set_yscale('symlog')

        axs[0][1].plot(x, [e['lr'] for e in train], label=path)
        axs[0][1].set_title('learning rate')
        axs[0][1].set_yscale('log')

        axs[1][0].plot([e['epoch'] for e in epochs_train],
                       [e['loss'] for e in epochs_train],
                       'o-', label=path + ' (train)')
        axs[1][0].plot([e['epoch'] for e in epochs_val],
                       [e['loss'] for e in epochs_val],
                       'x-', label=path + ' (val)')
        axs[1][0].set_title('epoch loss')

        axs[1][1].plot(x, [e.get('time', 0) for e in train], label=path)
        axs[1][1].set_title('batch time [s]')

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
                        label=f'{path} sigma{si}')
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
    args = parser.parse_args()

    if args.print_last:
        for path in args.log_file:
            entries = read_log(path)
            pprint(entries[-5:])
        return

    output = args.output or args.log_file[0]
    plot_logs(args.log_file, output_prefix=output, show=args.show,
              first_epoch=args.first_epoch, share_y=args.share_y,
              show_mtl_sigmas=args.show_mtl_sigmas)


if __name__ == '__main__':
    main()
