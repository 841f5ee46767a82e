"""CI gate: no file may be >0.5 line-similar to the reference checkout
(outside the reviewed allowlist in tools/copycheck.py). Round 3's judge
found ~28 lifted files that the previous detector missed; this keeps the
rewrites from regressing."""

import os
import subprocess
import sys

import pytest

REFERENCE = '/root/reference/src/openpifpaf'
TOOL = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    '..', 'tools', 'copycheck.py')


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason='reference checkout not mounted')
def test_no_copied_files():
    proc = subprocess.run(
        [sys.executable, TOOL, '--threshold', '0.5'],
        capture_output=True, text=True, timeout=600, check=False)
    assert proc.returncode == 0, \
        f'copycheck found violations:\n{proc.stdout[-4000:]}'
