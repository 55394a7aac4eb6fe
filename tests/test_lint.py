"""Source-discipline lints.

``core/session.py::_silence_bounded_window_warnings`` drops the
``WindowExec: No Partition Defined`` WARN for the whole session because
every unpartitioned window in this codebase is provably bounded. That
trades away the runtime nag, so THIS lint is the replacement discipline:
any new ``Window.orderBy(...)`` construction (an unpartitioned — i.e.
single-reducer — window) must carry a ``bounded:`` comment within the
preceding lines stating why its input is small (post-limit frame,
partition metadata, fixed-row report). A full-data global window would
fail this test instead of scrolling past as one more ignored warning.
"""

import os
import re

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "spark_etl_agent_spark",
)

_WINDOW = re.compile(r"Window\.orderBy\(")
_LOOKBACK = 8  # comment must appear within this many preceding lines


def test_unpartitioned_windows_are_documented_bounded():
    offenders = []
    for root, _dirs, files in os.walk(PKG):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            lines = open(path).read().splitlines()
            for i, line in enumerate(lines):
                if not _WINDOW.search(line):
                    continue
                if "``" in line:  # docstring mention, not a construction
                    continue
                ctx = lines[max(0, i - _LOOKBACK) : i + 1]
                if not any("bounded" in c.lower() for c in ctx):
                    offenders.append(f"{path}:{i + 1}: {line.strip()}")
    assert not offenders, (
        "unpartitioned Window.orderBy sites without a 'bounded:' comment "
        "(single-reducer windows must document why their input is small):\n"
        + "\n".join(offenders)
    )
