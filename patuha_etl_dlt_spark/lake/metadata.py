"""Lake-table metadata: schemas with field IDs, snapshots, atomic pointer.

Schema evolution is column-ID based (the Iceberg model): renames and type
widenings keep the field id, so old data files remain readable under the
current schema by id-mapping at scan time. The reference's analog is
INFORMATION_SCHEMA diffing + ``ALTER TABLE ADD COLUMN``
(``/root/reference/source/schema_management.py:11-57``), which is add-only
and name-based; field ids are what let us additionally support rename and
type-widen (north-rule requirement).
"""

from __future__ import annotations

import json
import os
import tempfile
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import types as T

# simple DDL-ish type names -> Spark types
_TYPES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
    "binary": T.BinaryType(),
    "boolean": T.BooleanType(),
}

# allowed lossless widenings (old -> set of new)
WIDENINGS: dict[str, set[str]] = {
    "int": {"long", "double"},
    "float": {"double"},
    "long": {"double"},  # lossy >2^53 but matches common lake semantics opt-in
}


def spark_type(name: str) -> T.DataType:
    if name.startswith("decimal(") and name.endswith(")"):
        p, s = (int(x) for x in name[8:-1].split(","))
        return T.DecimalType(p, s)
    try:
        return _TYPES[name]
    except KeyError:
        raise ValueError(f"unsupported lake type: {name}") from None


def type_name(dt: T.DataType) -> str:
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    for k, v in _TYPES.items():
        if v == dt:
            return k
    raise ValueError(f"unsupported Spark type for lake schema: {dt}")


@dataclass(frozen=True)
class Field:
    id: int
    name: str
    type: str
    nullable: bool = True

    def to_json(self) -> dict:
        return {"id": self.id, "name": self.name, "type": self.type, "nullable": self.nullable}

    @staticmethod
    def from_json(d: dict) -> "Field":
        return Field(d["id"], d["name"], d["type"], d.get("nullable", True))


@dataclass(frozen=True)
class Schema:
    fields: tuple[Field, ...]

    @staticmethod
    def of(fields: list[Field]) -> "Schema":
        return Schema(tuple(fields))

    @property
    def names(self) -> list[str]:
        return [f.name for f in self.fields]

    def field_by_name(self, name: str) -> Field:
        for f in self.fields:
            if f.name == name:
                return f
        raise KeyError(name)

    def field_by_id(self, fid: int) -> Field | None:
        for f in self.fields:
            if f.id == fid:
                return f
        return None

    @property
    def max_id(self) -> int:
        return max((f.id for f in self.fields), default=0)

    def to_struct(self) -> T.StructType:
        return T.StructType(
            [T.StructField(f.name, spark_type(f.type), f.nullable) for f in self.fields]
        )

    def to_json(self) -> list[dict]:
        return [f.to_json() for f in self.fields]

    @staticmethod
    def from_json(lst: list[dict]) -> "Schema":
        return Schema(tuple(Field.from_json(d) for d in lst))

    # --- evolution (all return a NEW Schema; validation here, commit in table) ---

    def add_column(self, name: str, typ: str, nullable: bool = True) -> "Schema":
        if name in self.names:
            raise ValueError(f"column {name!r} already exists")
        spark_type(typ)  # validate
        return Schema(self.fields + (Field(self.max_id + 1, name, typ, nullable),))

    def rename_column(self, old: str, new: str) -> "Schema":
        if new in self.names:
            raise ValueError(f"column {new!r} already exists")
        f = self.field_by_name(old)
        return Schema(
            tuple(Field(g.id, new, g.type, g.nullable) if g.id == f.id else g for g in self.fields)
        )

    def widen_column(self, name: str, new_type: str) -> "Schema":
        f = self.field_by_name(name)
        if new_type == f.type:
            return self
        if new_type not in WIDENINGS.get(f.type, set()):
            raise ValueError(f"illegal type change {f.type} -> {new_type} for {name!r}")
        return Schema(
            tuple(
                Field(g.id, g.name, new_type, g.nullable) if g.id == f.id else g
                for g in self.fields
            )
        )


@dataclass(frozen=True)
class DataFile:
    path: str  # relative to table root
    bucket: int
    schema_id: int
    # 'base': one LWW-resolved row per key; 'delta': merge-on-read overlay
    # (newer rows/tombstones to be LWW-reduced against base at read time)
    kind: str = "base"

    def to_json(self) -> dict:
        return {
            "path": self.path,
            "bucket": self.bucket,
            "schema_id": self.schema_id,
            "kind": self.kind,
        }

    @staticmethod
    def from_json(d: dict) -> "DataFile":
        return DataFile(d["path"], d["bucket"], d["schema_id"], d.get("kind", "base"))


@dataclass
class Snapshot:
    version: int
    parent: int | None
    schema_id: int
    schemas: dict[int, Schema]  # all historical schemas, keyed by schema id
    key_cols: list[str]
    order_cols: list[str]
    num_buckets: int
    files: list[DataFile]
    # batch ids for idempotent re-apply. With batch_retention=None the list
    # is cumulative; with retention=K only the K most recent are kept (the
    # Delta txn-retention pattern) — exactly-once then holds for any replay
    # within a K-batch horizon, which the engine's checkpoint offsets
    # guarantee (older events are filtered before they reach the merge).
    batch_ids: list[str] = field(default_factory=list)
    batch_retention: int | None = None
    summary: dict = field(default_factory=dict)
    ts: float = 0.0

    @property
    def schema(self) -> Schema:
        return self.schemas[self.schema_id]

    def to_json(self) -> dict:
        return {
            "version": self.version,
            "parent": self.parent,
            "schema_id": self.schema_id,
            "schemas": {str(k): v.to_json() for k, v in self.schemas.items()},
            "key_cols": self.key_cols,
            "order_cols": self.order_cols,
            "num_buckets": self.num_buckets,
            "files": [f.to_json() for f in self.files],
            "batch_ids": self.batch_ids,
            "batch_retention": self.batch_retention,
            "summary": self.summary,
            "ts": self.ts,
        }

    @staticmethod
    def from_json(d: dict) -> "Snapshot":
        return Snapshot(
            version=d["version"],
            parent=d["parent"],
            schema_id=d["schema_id"],
            schemas={int(k): Schema.from_json(v) for k, v in d["schemas"].items()},
            key_cols=d["key_cols"],
            order_cols=d["order_cols"],
            num_buckets=d["num_buckets"],
            files=[DataFile.from_json(f) for f in d["files"]],
            batch_ids=d.get("batch_ids", []),
            batch_retention=d.get("batch_retention"),
            summary=d.get("summary", {}),
            ts=d.get("ts", 0.0),
        )


# ---------------------------------------------------------------------------
# atomic metadata IO (local/posix; on object stores this would be a catalog
# compare-and-swap — same contract, different primitive)
# ---------------------------------------------------------------------------


def atomic_write(path: str, data: str) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".tmp-")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)  # atomic on POSIX
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def write_snapshot(meta_dir: str, snap: Snapshot) -> None:
    snap.ts = time.time()
    atomic_write(
        os.path.join(meta_dir, f"snap-{snap.version:08d}.json"),
        json.dumps(snap.to_json()),
    )
    # pointer swap LAST: readers either see the old or the new version
    atomic_write(os.path.join(meta_dir, "CURRENT"), str(snap.version))


def read_current_version(meta_dir: str) -> int | None:
    p = os.path.join(meta_dir, "CURRENT")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(f.read().strip())


def read_snapshot(meta_dir: str, version: int) -> Snapshot:
    with open(os.path.join(meta_dir, f"snap-{version:08d}.json")) as f:
        return Snapshot.from_json(json.load(f))


def new_data_dir(root: str) -> str:
    """Unique dir for one write's data files (never reused → no clobber)."""
    rel = os.path.join("data", uuid.uuid4().hex[:16])
    os.makedirs(os.path.join(root, rel), exist_ok=True)
    return rel
