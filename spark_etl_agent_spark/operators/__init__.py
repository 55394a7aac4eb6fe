"""Custom relational operators beyond the built-in surface.

The reference exercises only scans/filters/left-joins/DISTINCT
(SURVEY.md §2); everything here is an *extension operator* the task
checklist names, each built as a composition of DataFrame primitives
(never a row-at-a-time UDF) so Catalyst/AQE still optimize it:

- :mod:`.asof`   — as-of (most-recent-at-or-before) joins
- :mod:`.ranges` — range/banded joins
- :mod:`.skew`   — salted aggregation & skew-safe join helpers
- :mod:`.sketches` — approximate/exact distributional summaries
"""

from .asof import asof_join
from .ranges import band_join
from .skew import salted_aggregate, salted_join, salted_topk
from .sketches import column_profile

__all__ = [
    "asof_join",
    "band_join",
    "salted_aggregate",
    "salted_join",
    "salted_topk",
    "column_profile",
]
