"""Visualizer CLI (reference ``visualizer/cli.py``)."""

from .base import Base


def cli(parser):
    group = parser.add_argument_group('visualizer')
    group.add_argument('--debug-indices', default=[], nargs='+',
                       help='Indices of fields to create debug plots for '
                            'of the form headname:fieldindex, e.g. cif:5. '
                            'Optionally specify the visualization type, '
                            'e.g. cif:5:confidence.')


def configure(args):
    Base.set_all_indices(args.debug_indices)
