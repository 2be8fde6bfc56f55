"""Per-table sync configuration — the reference's ``tables.json`` re-typed.

Reference: ``/root/reference/source/config.py:135-159`` loads
``tables.json`` entries ``{table, primary_key, modifier?}`` where
``primary_key`` may be a string or list (composite —
``utils.py:42-68``) and a missing ``modifier`` selects full-refresh mode
(``pipeline_management.py:2176-2182``). Here: ``merge_key`` / ``cursor`` /
``mode``; ``mode`` is explicit ('cdc' | 'snapshot') instead of inferred.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass(frozen=True)
class TableConfig:
    table: str
    merge_key: tuple[str, ...]  # composite keys supported
    cursor: str  # event-time/modifier column (LWW order); '' in snapshot mode
    # 'cdc': incremental merge by cursor. 'snapshot': full refresh
    # (target := source, O(metadata) replace). 'snapshot_diff': pull the
    # full source and MERGE only the derived I/U/D changes — the mode that
    # propagates upstream DELETEs, which a cursor can never see
    # (reference limitation: README.MD:395 — deleted rows linger forever).
    mode: str = "cdc"
    num_buckets: int = 64
    columns: tuple[tuple[str, str], ...] = ()  # (name, type) for creation

    def __post_init__(self):
        if self.mode not in ("cdc", "snapshot", "snapshot_diff"):
            raise ValueError(
                f"{self.table}: mode must be 'cdc', 'snapshot' or 'snapshot_diff', got {self.mode!r}"
            )
        if not self.merge_key:
            raise ValueError(f"{self.table}: merge_key must not be empty")
        # a missing modifier/cursor selects full-refresh mode in the reference
        # (pipeline_management.py:2176-2182); only cdc mode requires one
        if self.mode == "cdc" and not self.cursor:
            raise ValueError(f"{self.table}: cursor column required in cdc mode")

    @staticmethod
    def from_dict(d: dict) -> "TableConfig":
        mk = d["merge_key"] if "merge_key" in d else d.get("primary_key")
        if mk is None:
            raise ValueError(f"{d.get('table')}: merge_key/primary_key required")
        mk = (mk,) if isinstance(mk, str) else tuple(mk)
        cursor = d.get("cursor") or d.get("modifier")
        mode = d.get("mode") or ("cdc" if cursor else "snapshot")
        return TableConfig(
            table=d["table"],
            merge_key=mk,
            cursor=cursor or "",
            mode=mode,
            num_buckets=int(d.get("num_buckets", 64)),
            columns=tuple((c["name"], c["type"]) for c in d.get("columns", [])),
        )


def load_table_configs(path: str) -> list[TableConfig]:
    """Load + validate a tables.json file (reference:
    ``validate_table_configurations``, ``db_pipeline.py:43-71``)."""
    with open(path) as f:
        raw = json.load(f)
    if not isinstance(raw, list):
        raise ValueError("tables.json must be a JSON array")
    configs = [TableConfig.from_dict(d) for d in raw]
    names = [c.table for c in configs]
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        raise ValueError(f"duplicate table configs: {sorted(dupes)}")
    return configs
