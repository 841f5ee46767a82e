"""Profiling wrappers (role of reference ``profiler.py:11-62``).

``Profiler`` wraps a callable with cProfile and prints/dumps the tottime
ranking; ``JaxProfiler`` (replacing the reference's TorchProfiler) wraps
it with ``jax.profiler`` trace capture, producing Perfetto/TensorBoard-
compatible traces.
"""

import cProfile
import io
import logging
import pstats

LOG = logging.getLogger(__name__)


class Profiler:
    def __init__(self, function_to_profile, *, profile=None, out_name=None):
        self.function_to_profile = function_to_profile
        self.profile = profile if profile is not None else cProfile.Profile()
        self.out_name = out_name

    def _report(self):
        buffer = io.StringIO()
        stats = pstats.Stats(self.profile, stream=buffer)
        stats.sort_stats('tottime').print_stats()
        if self.out_name:
            LOG.info('writing profile file %s', self.out_name)
            stats.dump_stats(self.out_name)
        print(buffer.getvalue())

    def __call__(self, *args, **kwargs):
        result = self.profile.runcall(self.function_to_profile,
                                      *args, **kwargs)
        self._report()
        return result


class JaxProfiler:
    """Trace-capture wrapper: writes a TensorBoard/Perfetto trace directory
    for every wrapped call (TPU equivalent of trainer.py's TorchProfiler)."""

    trace_counter = 0

    def __init__(self, function_to_profile, *, out_name='jax_trace'):
        self.function_to_profile = function_to_profile
        self.out_name = out_name

    def __call__(self, *args, **kwargs):
        import jax

        self.__class__.trace_counter += 1
        trace_dir = f'{self.out_name}.{self.trace_counter}'
        with jax.profiler.trace(trace_dir):
            result = self.function_to_profile(*args, **kwargs)
            jax.block_until_ready(result)
        LOG.info('wrote trace to %s', trace_dir)
        return result
