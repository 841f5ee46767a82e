"""Annotation painters (reference ``show/painters.py``).

Draw keypoint skeletons, detection boxes and crowd regions on a matplotlib
axis. Matplotlib is optional — painters raise only when actually used.
"""

import numpy as np

try:
    import matplotlib
    import matplotlib.animation
    import matplotlib.collections
    import matplotlib.patches
except ImportError:
    matplotlib = None

CMAP_ORANGES_NAN = None
if matplotlib is not None:
    CMAP_ORANGES_NAN = matplotlib.colormaps['Oranges']


class KeypointPainter:
    show_box = False
    show_joint_confidences = False
    show_joint_scales = False
    show_decoding_order = False
    show_frontier_order = False
    show_only_decoded_connections = False
    textbox_alpha = 0.5
    text_color = 'white'
    monocolor_connections = False
    line_width = None
    marker_size = 1
    solid_threshold = 0.5
    font_size = 8

    def __init__(self, *, xy_scale=1.0, highlight=None, highlight_invisible=False):
        self.xy_scale = xy_scale
        self.highlight = highlight
        self.highlight_invisible = highlight_invisible

        if self.line_width is None:
            self.line_width = 6

    def _draw_skeleton(self, ax, x, y, v, *, skeleton, color=None, alpha=1.0, **kwargs):
        if not np.any(v > 0):
            return

        for ci, (j1i, j2i) in enumerate(np.array(skeleton) - 1):
            if v[j1i] > 0 and v[j2i] > 0:
                c = color
                if not self.monocolor_connections:
                    c = matplotlib.colormaps['tab20'](ci % 20)
                ax.plot([x[j1i], x[j2i]], [y[j1i], y[j2i]],
                        linewidth=self.line_width, color=c,
                        linestyle='solid' if (v[j1i] > self.solid_threshold
                                              and v[j2i] > self.solid_threshold)
                        else 'dashed',
                        alpha=alpha, **kwargs)

        ax.plot(x[v > 0], y[v > 0], 'o', markersize=self.marker_size * 3,
                markerfacecolor=color or 'white', markeredgewidth=0, alpha=alpha)

    def annotation(self, ax, ann, *, color=None, text=None, subtext=None):
        if matplotlib is None:
            raise ImportError('matplotlib is not installed')
        if color is None:
            color = 'blue'

        x = ann.data[:, 0] * self.xy_scale
        y = ann.data[:, 1] * self.xy_scale
        v = ann.data[:, 2]

        self._draw_skeleton(ax, x, y, v, skeleton=ann.skeleton, color=color)

        if text is None and ann.score:
            # GT annotations carry fixed_score = '' -> no score text
            # (reference painters.py:33-34)
            text = f'{ann.score:.0%}'
        if text and np.any(v > 0):
            ax.text(np.min(x[v > 0]), np.min(y[v > 0]) - 2, text,
                    fontsize=self.font_size, color=self.text_color,
                    bbox={'facecolor': color, 'alpha': self.textbox_alpha,
                          'linewidth': 0})

    def annotations(self, ax, anns, *, colors=None, texts=None, subtexts=None):
        for i, ann in enumerate(anns):
            color = colors[i] if colors is not None else i
            if isinstance(color, (int, np.integer)):
                color = matplotlib.colormaps['tab20']((color % 20 + 0.05) / 20)
            text = texts[i] if texts is not None else None
            self.annotation(ax, ann, color=color, text=text)


class DetectionPainter:
    def __init__(self, *, xy_scale=1.0):
        self.xy_scale = xy_scale

    def annotation(self, ax, ann, *, color=None, text=None, subtext=None):
        if matplotlib is None:
            raise ImportError('matplotlib is not installed')
        if color is None:
            color = 'blue'

        x, y, w, h = ann.bbox * self.xy_scale
        if w < 5.0:
            x -= 2.0
            w += 4.0
        if h < 5.0:
            y -= 2.0
            h += 4.0

        ax.add_patch(matplotlib.patches.Rectangle(
            (x, y), w, h, fill=False, color=color, linewidth=1.0))

        if text is None:
            text = ann.category
        ax.text(x, y - 2, text, fontsize=8, color='white',
                bbox={'facecolor': color, 'alpha': 0.5, 'linewidth': 0})

    def annotations(self, ax, anns, *, colors=None, texts=None, subtexts=None):
        for i, ann in enumerate(anns):
            color = colors[i] if colors is not None else i
            if isinstance(color, (int, np.integer)):
                color = matplotlib.colormaps['tab20']((color % 20 + 0.05) / 20)
            text = texts[i] if texts is not None else None
            self.annotation(ax, ann, color=color, text=text)


class CrowdPainter:
    def __init__(self, *, alpha=0.5, color='orange'):
        self.alpha = alpha
        self.color = color

    def annotations(self, ax, anns, *, colors=None, texts=None, subtexts=None):
        if matplotlib is None:
            raise ImportError('matplotlib is not installed')
        for ann in anns:
            x, y, w, h = ann.bbox
            ax.add_patch(matplotlib.patches.Rectangle(
                (x, y), w, h, fill=True, color=self.color, alpha=self.alpha))


class AnnotationPainter:
    def __init__(self, *, xy_scale=1.0, painters=None):
        from . import PAINTERS  # late import: registry may be extended
        self.painters = {
            name: painter(xy_scale=xy_scale) if painter is not CrowdPainter
            else painter()
            for name, painter in PAINTERS.items()
        }
        if painters:
            self.painters.update(painters)

    def annotations(self, ax, annotations, *, colors=None, color=None,
                    texts=None, subtexts=None):
        by_classname = {}
        for ann_i, ann in enumerate(annotations):
            by_classname.setdefault(ann.__class__.__name__, []).append((ann_i, ann))

        for classname, anns in by_classname.items():
            if classname not in self.painters:
                continue
            indices = [i for i, _ in anns]
            this_colors = [colors[i] for i in indices] if colors is not None \
                else ([color] * len(anns) if color is not None else indices)
            this_texts = [texts[i] for i in indices] if texts is not None else None
            self.painters[classname].annotations(
                ax, [a for _, a in anns], colors=this_colors, texts=this_texts)
