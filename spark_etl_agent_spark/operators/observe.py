"""Single-pass pipeline metrics via ``DataFrame.observe``.

An ETL job that re-counts its inputs and intermediates pays one full
scan per audit number — at 100 TB each ``df.count()`` is a complete
pass over the corpus. ``observe`` attaches accumulator-style aggregate
metrics to a plan node: they are computed AS A SIDE EFFECT of whatever
action executes the plan (the write, the contract-gate collect), so the
audit trail costs zero extra scans.

Contrast with the reference's count discipline (A2,
``services/jcap_pa_etl_service.py`` — count once, reuse the number):
that avoids *re*-counting but still pays one dedicated count action;
observed metrics piggyback on an action the job already runs.

Caveats encoded here: metrics fire when the FIRST action executes the
observed node; ``Observation.get`` blocks until then. One Observation
binds to one DataFrame. Metrics must be aggregate expressions without
distinct (Spark restriction).
"""

from __future__ import annotations

from typing import Dict, Tuple

from pyspark.sql import Column, DataFrame, Observation


def with_metrics(
    df: DataFrame, **metrics: Column
) -> Tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to this plan node. Returns the
    frame to keep building on plus the ``Observation`` whose ``.get``
    yields ``{name: value}`` after the first downstream action."""
    if not metrics:
        raise ValueError("at least one metric is required")
    obs = Observation()
    observed = df.observe(
        obs, *[m.alias(name) for name, m in metrics.items()]
    )
    return observed, obs


def metrics_of(obs: Observation) -> Dict[str, object]:
    """Collected metric values (blocks until an action has executed the
    observed plan)."""
    return dict(obs.get)
