"""Job 4: ``incremental_sync_etl`` — the scale-right alternative to the
reference's truncate-and-reload workflow
(``services/jcap_pa_etl_service.py:40-120`` reloads the whole
destination every run).

Stages:

1. **diff** — ``operators/cdc.py::snapshot_diff`` between the current
   target state and the new source snapshot: one full-outer join on the
   keys, emitting only inserted/updated/deleted keys.
2. **gate** — ``operators/quality.py::referential_audit`` on the
   source's FKs (orphans or NULL FKs above the threshold abort the run
   before anything is written — the load gate the reference lacks).
3. **apply** — ``Catalog.apply_cdc``: target minus changed keys, union
   the insert/update rows, promoted by rename-with-backup. Cost is the
   delta plus one key anti-join, never a source re-derivation.
4. **validate** — row-count invariant
   ``after == before + inserts - deletes`` (a violated invariant means
   duplicate keys or a concurrent writer — fail the envelope).

Envelope keys follow the reference's job-result model.
"""

from __future__ import annotations

from datetime import datetime
from typing import Any, Dict, List, Optional, Tuple

from pyspark.sql import DataFrame

from ..operators.cdc import snapshot_diff
from ..operators.quality import referential_audit
from ..sources.catalog import Catalog


class IncrementalSyncService:
    def __init__(
        self,
        catalog: Catalog,
        source_table: str = "staging.orders_snapshot",
        target_table: str = "warehouse.orders",
        keys: Optional[List[str]] = None,
        fk_relations: Optional[
            List[Tuple[str, str, str, str]]
        ] = None,  # (name, child_key, parent_table, parent_key)
        max_orphans: int = 0,
    ) -> None:
        self.catalog = catalog
        self.source_table = source_table
        self.target_table = target_table
        self.keys = keys or ["o_orderkey"]
        self.fk_relations = fk_relations or []
        self.max_orphans = max_orphans

    def _gate(self, source: DataFrame) -> Optional[Dict[str, Any]]:
        if not self.fk_relations:
            return None
        relations = [
            (rel_name, source, child_key, self.catalog.read_table(parent), pk)
            for rel_name, child_key, parent, pk in self.fk_relations
        ]
        # one row per relation — a scalar envelope read, not a data collect
        rows = referential_audit(relations).collect()
        return {
            r.relation: {
                "n_child_rows": r.n_child_rows,
                "n_null_fk": r.n_null_fk,
                "n_orphans": r.n_orphans,
            }
            for r in rows
        }

    def run_incremental_sync(self, load_date: Optional[str] = None) -> Dict[str, Any]:
        start_time = datetime.now()
        if not load_date:
            load_date = datetime.now().strftime("%Y-%m-%d")

        source = self.catalog.read_table(self.source_table)
        rows_before = self.catalog.get_table_count(self.target_table)

        audit = self._gate(source)
        if audit is not None:
            bad = {
                rel: counts
                for rel, counts in audit.items()
                if counts["n_orphans"] + counts["n_null_fk"] > self.max_orphans
            }
            if bad:
                return {
                    "status": "Failed",
                    "error": f"referential gate: {bad}",
                    "audit": audit,
                    "source_table": self.source_table,
                    "destination_table": self.target_table,
                    "load_date": load_date,
                    "start_time": start_time,
                    "end_time": datetime.now(),
                }

        target = self.catalog.read_table(self.target_table)
        diff = snapshot_diff(target, source, keys=self.keys)
        # 0-3 rows — change-type counts are envelope scalars
        counts = {
            r.change_type: r.n
            for r in diff.groupBy("change_type").count().withColumnRenamed("count", "n").collect()
        }
        n_ins = counts.get("insert", 0)
        n_upd = counts.get("update", 0)
        n_del = counts.get("delete", 0)

        if n_ins + n_upd + n_del == 0:
            rows_after = rows_before
        else:
            changes = diff.join(source, self.keys, "left")
            rows_after = self.catalog.apply_cdc(
                changes, self.target_table, keys=self.keys
            )

        expected = rows_before + n_ins - n_del
        status = "Success" if rows_after == expected else "Failed"
        end_time = datetime.now()
        result: Dict[str, Any] = {
            "status": status,
            "rows_before": rows_before,
            "rows_after": rows_after,
            "inserts": n_ins,
            "updates": n_upd,
            "deletes": n_del,
            "audit": audit,
            "source_table": self.source_table,
            "destination_table": self.target_table,
            "load_date": load_date,
            "start_time": start_time,
            "end_time": end_time,
            "duration_seconds": (end_time - start_time).total_seconds(),
        }
        if status == "Failed":
            result["error"] = (
                f"row-count invariant violated: after={rows_after} "
                f"expected={expected} (before={rows_before} +{n_ins} -{n_del})"
            )
        return result
