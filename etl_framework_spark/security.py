"""Role-based access control + audit trail for pipeline runs.

Driver-side parity with the reference's security surface
(reference:src/etl_framework/security/access_control.py:10-154,
audit_logger.py:100-146): permission checks are cheap in-memory gates
evaluated BEFORE any Spark job is planned (never per-row — row-level
policy belongs in the plan as filters/masks, see ``transforms.crypto``),
and audit events are buffered driver-side and flushed as ONE appended
batch per pipeline run, so auditing costs a single small write instead
of a commit per event.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import SparkSession
from pyspark.sql import types as T


class Operation(str, Enum):
    """Operations subject to access control
    (reference:src/etl_framework/security/access_control.py:10-23)."""

    EXTRACT = "extract"
    TRANSFORM = "transform"
    LOAD = "load"
    READ_CONFIG = "read_config"
    WRITE_CONFIG = "write_config"
    EXECUTE_PIPELINE = "execute_pipeline"
    VIEW_SENSITIVE_DATA = "view_sensitive_data"
    MODIFY_SENSITIVE_DATA = "modify_sensitive_data"
    MANAGE_USERS = "manage_users"
    VIEW_AUDIT_LOGS = "view_audit_logs"


class Role(str, Enum):
    """Predefined roles
    (reference:src/etl_framework/security/access_control.py:25-34)."""

    VIEWER = "viewer"
    OPERATOR = "operator"
    DEVELOPER = "developer"
    ADMIN = "admin"
    AUDITOR = "auditor"
    DATA_STEWARD = "data_steward"


_PIPELINE_OPS = {
    Operation.EXECUTE_PIPELINE,
    Operation.EXTRACT,
    Operation.TRANSFORM,
    Operation.LOAD,
}

ROLE_PERMISSIONS: dict[Role, set[Operation]] = {
    Role.VIEWER: {Operation.READ_CONFIG},
    Role.OPERATOR: {Operation.READ_CONFIG} | _PIPELINE_OPS,
    Role.DEVELOPER: {Operation.READ_CONFIG, Operation.WRITE_CONFIG} | _PIPELINE_OPS,
    Role.ADMIN: set(Operation),
    Role.AUDITOR: {
        Operation.READ_CONFIG,
        Operation.VIEW_AUDIT_LOGS,
        Operation.VIEW_SENSITIVE_DATA,
    },
    Role.DATA_STEWARD: {Operation.READ_CONFIG}
    | _PIPELINE_OPS
    | {Operation.VIEW_SENSITIVE_DATA, Operation.MODIFY_SENSITIVE_DATA},
}


@dataclass
class User:
    username: str
    roles: set[Role]
    attributes: dict = field(default_factory=dict)


class AccessController:
    """Role-based permission checks.

    Users come from the ``ETL_USERS`` env var
    (``user1:viewer,operator;user2:admin`` — the reference's format,
    reference:src/etl_framework/security/access_control.py:107-126) or
    programmatic ``add_user``; with no configuration a single ``admin``
    user exists.
    """

    def __init__(self, users_config: str | None = None):
        self.users: dict[str, User] = {}
        cfg = users_config if users_config is not None else os.getenv("ETL_USERS", "")
        for spec in cfg.split(";"):
            if ":" in spec:
                name, roles_str = spec.split(":", 1)
                roles = {Role(r.strip()) for r in roles_str.split(",") if r.strip()}
                self.users[name] = User(name, roles)
        if not self.users:
            # Unconfigured: the reference admits exactly one ``admin``
            # user (access_control.py:107-126) — no other implicit
            # principal, so a default-constructed Pipeline under a
            # non-admin username is DENIED until ETL_USERS grants it.
            self.users["admin"] = User("admin", {Role.ADMIN})

    def add_user(self, username: str, roles: set[Role]) -> None:
        self.users[username] = User(username, set(roles))

    def check_permission(
        self, username: str, operation: Operation, resource: str | None = None
    ) -> bool:
        user = self.users.get(username)
        if not user:
            return False
        return any(
            operation in ROLE_PERMISSIONS.get(role, set()) for role in user.roles
        )


@dataclass
class SecurityConfig:
    """Environment-driven security configuration
    (reference:src/etl_framework/security/config.py:56-101): encryption
    toggles ride in ``ETL_ENCRYPTION_ENABLED`` / ``ETL_ENCRYPTION_KEY``
    so policy travels with the deployment, not the code."""

    encryption_enabled: bool = False
    encryption_key: str | None = None
    encryption_method: str = "aes"

    @classmethod
    def from_environment(cls, environ: dict[str, str] | None = None) -> "SecurityConfig":
        e = os.environ if environ is None else environ
        return cls(
            encryption_enabled=e.get("ETL_ENCRYPTION_ENABLED", "").lower() == "true",
            encryption_key=e.get("ETL_ENCRYPTION_KEY"),
            encryption_method=e.get("ETL_ENCRYPTION_METHOD", "aes"),
        )

    def should_encrypt(self) -> bool:
        return self.encryption_enabled and bool(self.encryption_key)


#: reference allowed-extension policy (cli/main.py + input_validator)
ALLOWED_EXTENSIONS = {
    "read": {".csv", ".xlsx", ".xls", ".pdf", ".json", ".parquet", ".feather"},
    "write": {".csv", ".xlsx", ".xls", ".parquet", ".feather", ".json"},
}


def validate_file_path(path: str, operation: str = "read") -> str:
    """Path safety gate (reference:security/input_validator.py:166-338):
    rejects traversal and null bytes; when the path has a file
    extension, it must be on the allowlist for the operation
    (extension-less paths are table/directory targets — LakeTable,
    parquet dirs — and pass through)."""
    if "\x00" in path:
        raise ValueError("null byte in path")
    norm = os.path.normpath(path)
    if ".." in norm.split(os.sep):
        raise ValueError(f"path traversal rejected: {path!r}")
    ext = os.path.splitext(norm)[1].lower()
    if ext and ext not in ALLOWED_EXTENSIONS.get(operation, set()):
        raise ValueError(f"extension {ext!r} not allowed for {operation}")
    return path


def validate_identifier(name: str) -> bool:
    """Safe registry/SQL identifier (the reference's
    ``validate_sql_identifier``): letters, digits, underscore, not
    starting with a digit, bounded length."""
    import re

    return bool(name) and len(name) <= 128 and bool(
        re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name)
    )


AUDIT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("user", T.StringType(), True),
        T.StructField("success", T.BooleanType(), True),
        T.StructField("details", T.StringType(), True),  # JSON blob
    ]
)


class AuditLogger:
    """Buffered audit trail with two sinks: a JSONL file (always, cheap,
    survives crashes) and optionally a LakeTable the events are appended
    to in one batch per ``flush`` — making the audit trail itself a
    queryable, snapshot-versioned table
    (reference:src/etl_framework/security/audit_logger.py:100-146)."""

    #: memory-only retention bound — with no file and no table sink the
    #: buffer IS the audit trail, but a long-lived scheduler must not
    #: grow it forever: keep the newest MAX_MEMORY_EVENTS, count drops.
    MAX_MEMORY_EVENTS = 10_000

    def __init__(self, log_file: str | None = None, table_path: str | None = None):
        self.log_file = log_file
        self.table_path = table_path
        self._buffer: list[dict] = []
        self.dropped_events = 0
        if log_file:
            os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)

    # ------------------------------------------------------------ events
    def log_event(
        self, event_type: str, user: str, details: dict, success: bool = True
    ) -> dict:
        record = {
            "event_id": uuid.uuid4().hex,
            "ts": time.time(),
            "event_type": str(event_type),
            "user": user,
            "success": bool(success),
            "details": json.dumps(details, default=str, sort_keys=True),
        }
        self._buffer.append(record)
        if self.log_file:
            with open(self.log_file, "a") as f:
                f.write(json.dumps(record) + "\n")
        elif not self.table_path and len(self._buffer) > self.MAX_MEMORY_EVENTS:
            # memory-only config: bounded ring, newest events win
            excess = len(self._buffer) - self.MAX_MEMORY_EVENTS
            del self._buffer[:excess]
            self.dropped_events += excess
        return record

    def log_pipeline_execution(
        self,
        user: str,
        pipeline_name: str,
        source: str,
        target: str,
        rows_processed: int,
        success: bool,
        error_message: str | None = None,
    ) -> dict:
        return self.log_event(
            "pipeline_execution",
            user,
            {
                "pipeline": pipeline_name,
                "source": source,
                "target": target,
                "rows_processed": rows_processed,
                "error_message": error_message,
            },
            success,
        )

    def log_data_access(self, user: str, resource: str, operation: str) -> dict:
        return self.log_event(
            "data_access", user, {"resource": resource, "operation": operation}
        )

    def log_permission_denied(
        self, user: str, operation: str, resource: str | None = None
    ) -> dict:
        return self.log_event(
            "permission_denied",
            user,
            {"operation": operation, "resource": resource},
            success=False,
        )

    # ------------------------------------------------------------- sinks
    @property
    def pending(self) -> list[dict]:
        return list(self._buffer)

    def flush(self, spark: SparkSession) -> int | None:
        """Append buffered events to the audit LakeTable (one batch).
        Returns the new table version, or None if nothing to do.

        With a JSONL file but no table sink the buffer is STILL cleared:
        events were already durably written at log time, and a
        long-lived pipeline process must not accumulate every audit
        event in memory forever. In a memory-ONLY config (no file, no
        table) the buffer IS the audit trail, so flush keeps it —
        bounded at ``MAX_MEMORY_EVENTS`` (newest win; ``dropped_events``
        counts evictions) so the default secure-pipeline config cannot
        grow without bound in a week-long scheduler process."""
        if not self._buffer:
            return None
        if not self.table_path:
            if self.log_file:
                self._buffer.clear()
            return None
        from etl_framework_spark.lakehouse.table import LakeTable

        rows = [
            (
                r["event_id"],
                r["ts"],
                r["event_type"],
                r["user"],
                r["success"],
                r["details"],
            )
            for r in self._buffer
        ]
        import datetime as _dt

        rows = [
            (eid, _dt.datetime.fromtimestamp(ts, _dt.timezone.utc).replace(tzinfo=None), *rest)
            for eid, ts, *rest in rows
        ]
        df = spark.createDataFrame(rows, AUDIT_SCHEMA)
        if LakeTable.exists(self.table_path):
            table = LakeTable(spark, self.table_path)
        else:
            table = LakeTable.create(
                spark,
                self.table_path,
                AUDIT_SCHEMA,
                key_columns=["event_id"],
                n_buckets=4,
            )
        version = table.append(df, summary={"operation": "audit_flush"})
        self._buffer.clear()
        return version
