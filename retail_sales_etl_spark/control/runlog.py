"""Control plane: run/stage logging + pipeline metadata registry.

Spark-first re-expression of the reference control DB
(/root/reference/sql/create_control_tables.sql and
utils/log_table_helpers.py): ``etl_run_log`` (one row per run),
``etl_stage_log`` (one row per stage: status, rows in/out, timings),
plus pipeline/table metadata.

The reference uses SQLite tables; here the logs are append-only
newline-JSON under a control directory — the write pattern (append one
tiny record per stage) is driver-side metadata, not data-plane work, so
it must NOT spin up Spark jobs. Logs are trivially queryable back
through Spark (``spark.read.json(control_dir)``) for observability
dashboards, which is exactly what the reference's control DB is for.
"""

from __future__ import annotations

import json
import os
import uuid
from datetime import datetime, timezone
from typing import Any

RUN_LOG = "etl_run_log"
STAGE_LOG = "etl_stage_log"
PIPELINE_MD = "pipeline_md"
TABLE_MD = "table_md"
PIPELINE_TABLE_MAP = "pipeline_table_map"


def _utc_now() -> str:
    return datetime.now(timezone.utc).isoformat()


def new_run_id() -> str:
    return str(uuid.uuid4())


class ControlLog:
    """Append-only run/stage log + metadata registry on a directory."""

    def __init__(self, control_dir: str):
        self.control_dir = control_dir
        os.makedirs(control_dir, exist_ok=True)

    def _append(self, table: str, record: dict[str, Any]) -> None:
        path = os.path.join(self.control_dir, f"{table}.jsonl")
        with open(path, "a", encoding="utf-8") as f:
            f.write(json.dumps(record, default=str) + "\n")

    def _read(self, table: str) -> list[dict[str, Any]]:
        path = os.path.join(self.control_dir, f"{table}.jsonl")
        if not os.path.exists(path):
            return []
        with open(path, encoding="utf-8") as f:
            return [json.loads(line) for line in f if line.strip()]

    # -- run log (reference log_table_helpers.insert_run/update_run_status)
    def insert_run(self, run_id: str, pipeline_name: str, status: str) -> dict:
        record = {
            "run_id": run_id,
            "pipeline_name": pipeline_name,
            "source_name": pipeline_name,
            "status": status,
            "start_time": _utc_now(),
            "end_time": None,
            "error_message": None,
            "created_at": _utc_now(),
        }
        self._append(RUN_LOG, record)
        return record

    def update_run(self, run: dict, status: str, error_message: str | None) -> dict:
        record = {
            **run,
            "status": status,
            "end_time": _utc_now(),
            "error_message": error_message,
            "updated_at": _utc_now(),
        }
        self._append(RUN_LOG, record)
        return record

    # -- stage log (reference log_table_helpers.insert_stage/update_stage)
    def insert_stage(
        self, run_id: str, stage_name: str, status: str, rows_in: int | None
    ) -> dict:
        record = {
            "run_id": run_id,
            "stage_name": stage_name,
            "status": status,
            "rows_in": rows_in,
            "rows_out": None,
            "start_time": _utc_now(),
            "end_time": None,
            "error_message": None,
        }
        self._append(STAGE_LOG, record)
        return record

    def update_stage(
        self,
        stage: dict,
        status: str,
        rows_in: int | None,
        rows_out: int | None,
        error_message: str | None,
    ) -> dict:
        record = {
            **stage,
            "status": status,
            "rows_in": rows_in,
            "rows_out": rows_out,
            "end_time": _utc_now(),
            "error_message": error_message,
        }
        self._append(STAGE_LOG, record)
        return record

    # -- metadata registry (reference metadata_table_helpers / bootstrap)
    def register_pipeline(
        self,
        pipeline_name: str,
        source_name: str,
        load_strategy: str = "full",
        schedule: str = "manual",
    ) -> None:
        self._append(
            PIPELINE_MD,
            {
                "pipeline_name": pipeline_name,
                "source_name": source_name,
                "load_strategy": load_strategy,
                "schedule": schedule,
                "is_active": True,
                "created_at": _utc_now(),
            },
        )

    def register_table(
        self,
        table_name: str,
        source_name: str,
        grain: str,
        primary_key: list[str],
        load_strategy: str = "full",
        watermark_column: str | None = None,
    ) -> None:
        self._append(
            TABLE_MD,
            {
                "table_name": table_name,
                "layer": "load",
                "source_name": source_name,
                "grain": grain,
                "primary_key": ",".join(primary_key),
                "load_strategy": load_strategy,
                "watermark_column": watermark_column,
                "last_loaded_value": None,
                "row_count": 0,
                "is_active": True,
                "created_at": _utc_now(),
                "updated_at": _utc_now(),
            },
        )

    def update_watermark(self, table_name: str, value: str, row_count: int) -> None:
        """Advance a table's incremental-load watermark after a load."""
        self._append(
            TABLE_MD,
            {
                "table_name": table_name,
                "last_loaded_value": value,
                "row_count": row_count,
                "updated_at": _utc_now(),
            },
        )

    # -- pipeline lifecycle (reference metadata_table_helpers.py:60,107)
    def _pipeline_state(self) -> dict[str, dict]:
        """Current state per pipeline: later appended records overlay
        earlier ones (the append-only-log equivalent of the reference's
        UPDATE pipeline_md)."""
        by_name: dict[str, dict] = {}
        for r in self._read(PIPELINE_MD):
            name = r.get("pipeline_name")
            if name:
                by_name[name] = {**by_name.get(name, {}), **r}
        return by_name

    def get_pipeline(self, pipeline_name: str) -> dict | None:
        """Reference metadata_table_helpers.get_pipeline parity."""
        return self._pipeline_state().get(pipeline_name)

    def list_active_pipelines(self) -> list[dict]:
        """Active pipelines only (reference WHERE is_active = 1)."""
        return [p for p in self._pipeline_state().values() if p.get("is_active")]

    def set_pipeline_active(self, pipeline_name: str, active: bool) -> None:
        if self.get_pipeline(pipeline_name) is None:
            raise ValueError(f"Unknown pipeline: {pipeline_name}")
        self._append(
            PIPELINE_MD,
            {
                "pipeline_name": pipeline_name,
                "is_active": active,
                "updated_at": _utc_now(),
            },
        )

    def deactivate_pipeline(self, pipeline_name: str) -> None:
        """Pause a feed without a code change (reference
        metadata_table_helpers.deactivate_pipeline)."""
        self.set_pipeline_active(pipeline_name, False)

    def activate_pipeline(self, pipeline_name: str) -> None:
        self.set_pipeline_active(pipeline_name, True)

    # -- table metadata getters (reference metadata_table_helpers.py:132,148)
    def _table_state(self) -> dict[str, dict]:
        """Current state per table: later appended records overlay
        earlier ones (the append-only-log equivalent of the reference's
        UPDATE table_md)."""
        by_name: dict[str, dict] = {}
        for r in self._read(TABLE_MD):
            name = r.get("table_name")
            if name:
                by_name[name] = {**by_name.get(name, {}), **r}
        return by_name

    def get_table(self, table_name: str) -> dict | None:
        """Table metadata by name (reference
        metadata_table_helpers.get_table, :132)."""
        return self._table_state().get(table_name)

    def list_active_tables_for_source(self, source_name: str) -> list[dict]:
        """Active tables fed by a source (reference
        metadata_table_helpers.list_active_tables_for_source, :148)."""
        return [
            t
            for t in self._table_state().values()
            if t.get("source_name") == source_name and t.get("is_active")
        ]

    def set_table_active(self, table_name: str, active: bool) -> None:
        """Table lifecycle toggle (reference table_md.is_active). Scope
        matches the reference exactly: the flag filters the metadata
        READ API (list_active_tables_for_source,
        list_tables_for_pipeline — what downstream readers consult),
        while the RUNNER gates on pipeline activity only; the runner
        registers tables if-absent, so a pause set here survives
        re-runs."""
        if self.get_table(table_name) is None:
            raise ValueError(f"Unknown table: {table_name}")
        self._append(
            TABLE_MD,
            {
                "table_name": table_name,
                "is_active": active,
                "updated_at": _utc_now(),
            },
        )

    # -- pipeline<->table mapping (reference pipeline_table_map,
    #    sql/create_control_tables.sql:144 and
    #    metadata_table_helpers.list_tables_for_pipeline, :194)
    def map_table_to_pipeline(
        self,
        pipeline_name: str,
        table_name: str,
        load_order: int,
        table_role: str,
    ) -> None:
        """Upsert one (pipeline, table) mapping row — the reference's
        PRIMARY KEY (pipeline_name, table_name) becomes overlay-by-key
        in the append-only log, so re-registering on every run is
        idempotent."""
        self._append(
            PIPELINE_TABLE_MAP,
            {
                "pipeline_name": pipeline_name,
                "table_name": table_name,
                "load_order": load_order,
                "table_role": table_role,
                "updated_at": _utc_now(),
            },
        )

    def _map_state(self) -> dict[tuple[str, str], dict]:
        by_key: dict[tuple[str, str], dict] = {}
        for r in self._read(PIPELINE_TABLE_MAP):
            key = (r.get("pipeline_name"), r.get("table_name"))
            if all(key):
                by_key[key] = {**by_key.get(key, {}), **r}
        return by_key

    def list_tables_for_pipeline(self, pipeline_name: str) -> list[dict]:
        """Tables a pipeline owns, in execution order — table metadata
        joined with its mapping row (load_order, table_role), ACTIVE
        tables only, ordered by load_order; parity with the reference's
        JOIN table_md / WHERE is_active / ORDER BY load_order
        (metadata_table_helpers.py:194)."""
        tables = self._table_state()
        rows = []
        for (p, t), m in self._map_state().items():
            if p != pipeline_name:
                continue
            tm = tables.get(t)
            if tm is None or not tm.get("is_active"):
                continue
            rows.append(
                {**tm, "load_order": m["load_order"], "table_role": m["table_role"]}
            )
        return sorted(rows, key=lambda r: (r["load_order"], r["table_name"]))

    def bootstrap_metadata(
        self,
        pipelines: list[tuple] | None = None,
        tables: list[tuple] | None = None,
        mapping: list[tuple] | None = None,
    ) -> None:
        """Idempotently seed pipeline/table/map metadata before a first
        run (reference scripts/bootstrap_metadata.py:42): existing
        pipeline and table records are left untouched (re-seeding never
        resets lifecycle flags or watermarks); mapping rows upsert by
        their (pipeline, table) key.

        ``pipelines``: (pipeline_name, source_name, load_strategy,
        schedule) tuples; ``tables``: (table_name, source_name, grain,
        primary_key_list, load_strategy, watermark_column); ``mapping``:
        (pipeline_name, table_name, load_order, table_role).
        """
        have_p = self._pipeline_state()
        for p in pipelines or []:
            if p[0] not in have_p:
                self.register_pipeline(*p)
        have_t = self._table_state()
        for t in tables or []:
            if t[0] not in have_t:
                self.register_table(*t)
        for m in mapping or []:
            self.map_table_to_pipeline(*m)

    # -- queries
    def runs(self) -> list[dict]:
        return self._read(RUN_LOG)

    def stages(self, run_id: str | None = None) -> list[dict]:
        rows = self._read(STAGE_LOG)
        return [r for r in rows if run_id is None or r["run_id"] == run_id]

    def latest_watermark(self, table_name: str) -> str | None:
        latest = None
        for r in self._read(TABLE_MD):
            if r.get("table_name") == table_name and r.get("last_loaded_value"):
                latest = r["last_loaded_value"]
        return latest
