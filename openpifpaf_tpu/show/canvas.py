"""Canvas helpers (reference ``show/canvas.py``). Matplotlib is optional."""

from contextlib import contextmanager

import numpy as np

try:
    import matplotlib
    import matplotlib.pyplot as plt
except ImportError:
    matplotlib = None
    plt = None


#: when set (--save-all), every canvas without an explicit fig_file is
#: saved here with a running index (reference show/canvas.py all_images)
save_all_dir = None
_save_counter = [0]


def _auto_fig_file():
    if save_all_dir is None:
        return None
    import os
    os.makedirs(save_all_dir, exist_ok=True)
    _save_counter[0] += 1
    return os.path.join(save_all_dir, f'{_save_counter[0]:04d}.jpeg')


@contextmanager
def canvas(fig_file=None, show=True, dpi=100, nomargin=False, **kwargs):
    if plt is None:
        raise ImportError('matplotlib is not installed')
    if fig_file is None:
        fig_file = _auto_fig_file()
    if nomargin:
        fig = plt.figure(**kwargs)
        ax = plt.Axes(fig, [0.0, 0.0, 1.0, 1.0])
        ax.set_axis_off()
        fig.add_axes(ax)
    else:
        fig, ax = plt.subplots(**kwargs)
    yield ax
    fig.set_tight_layout(not nomargin)
    if fig_file:
        fig.savefig(fig_file, dpi=dpi)
    if show:
        plt.show()
    plt.close(fig)


@contextmanager
def image_canvas(image, fig_file=None, show=True, dpi_factor=1.0,
                 fig_width=10.0, **kwargs):
    if plt is None:
        raise ImportError('matplotlib is not installed')
    if fig_file is None:
        fig_file = _auto_fig_file()
    image = np.asarray(image)
    if 'figsize' not in kwargs:
        kwargs['figsize'] = (fig_width,
                             fig_width * image.shape[0] / image.shape[1])
    fig = plt.figure(**kwargs)
    ax = plt.Axes(fig, [0.0, 0.0, 1.0, 1.0])
    ax.set_axis_off()
    ax.set_xlim(0, image.shape[1])
    ax.set_ylim(image.shape[0], 0)
    fig.add_axes(ax)
    ax.imshow(image)
    yield ax
    if fig_file:
        fig.savefig(fig_file, dpi=image.shape[1] / kwargs['figsize'][0] * dpi_factor)
    if show:
        plt.show()
    plt.close(fig)


Canvas = canvas
