"""Service persistence — sqlite3 storage
(reference: platipy/backend/models.py:78-170, SQLAlchemy there).

Tables: api_key, dicom_location, dataset, data_object (parent/child,
is_fetched/is_sent flags) — same shape as the reference's models.
"""

from __future__ import annotations

import json
import sqlite3
import threading
import uuid
from datetime import datetime
from pathlib import Path
from typing import Dict, List, Optional

__all__ = [
    "Database",
    "AlchemyEncoder",
    "default_timeout",
    "APIKey",
    "DicomLocation",
    "Dataset",
    "DataObject",
]


def default_timeout() -> datetime:
    """Default dataset timeout: 24 hours from now (reference models.py:73-76)."""
    from datetime import timedelta

    return datetime.now() + timedelta(hours=24)


class _Record:
    """Attribute view over a row dict — the reference exposes SQLAlchemy model
    instances (models.py:78-170); these wrap the same fields over sqlite rows."""

    _fields: tuple = ()

    def __init__(self, row: Optional[Dict] = None, **kwargs):
        data = dict(row or {})
        data.update(kwargs)
        for field in self._fields:
            setattr(self, field, data.get(field))

    def to_dict(self) -> Dict:
        return {f: getattr(self, f) for f in self._fields}

    def __repr__(self):
        inner = ", ".join(f"{f}={getattr(self, f)!r}" for f in self._fields)
        return f"{type(self).__name__}({inner})"


class APIKey(_Record):
    _fields = ("key", "name", "is_admin")


class DicomLocation(_Record):
    _fields = ("id", "owner_key", "name", "host", "port", "ae_title")


class Dataset(_Record):
    _fields = ("id", "owner_key", "from_dicom_location_id", "to_dicom_location_id",
               "timeout", "created", "input_data_objects", "output_data_objects")


class DataObject(_Record):
    _fields = ("id", "dataset_id", "is_input", "parent_id", "type", "path",
               "series_instance_uid", "meta_data", "is_fetched", "is_sent",
               "status")

    @property
    def parent(self):
        return self.parent_id


class AlchemyEncoder(json.JSONEncoder):
    """JSON encoder for model records and datetimes (reference models.py:30-56,
    which serialises SQLAlchemy instances; here the records above)."""

    def default(self, o):
        if isinstance(o, _Record):
            return o.to_dict()
        if isinstance(o, datetime):
            return o.isoformat()
        try:
            return super().default(o)
        except TypeError:
            return str(o)

_SCHEMA = """
CREATE TABLE IF NOT EXISTS api_key (
    key TEXT PRIMARY KEY,
    name TEXT,
    is_admin INTEGER DEFAULT 0
);
CREATE TABLE IF NOT EXISTS dicom_location (
    id INTEGER PRIMARY KEY AUTOINCREMENT,
    owner_key TEXT,
    name TEXT,
    host TEXT,
    port INTEGER,
    ae_title TEXT
);
CREATE TABLE IF NOT EXISTS dataset (
    id TEXT PRIMARY KEY,
    owner_key TEXT,
    from_dicom_location_id INTEGER,
    to_dicom_location_id INTEGER,
    timeout TEXT,
    created TEXT
);
CREATE TABLE IF NOT EXISTS data_object (
    id TEXT PRIMARY KEY,
    dataset_id TEXT,
    is_input INTEGER DEFAULT 1,
    parent_id TEXT,
    type TEXT DEFAULT 'FILE',
    path TEXT,
    series_instance_uid TEXT,
    meta_data TEXT,
    is_fetched INTEGER DEFAULT 0,
    is_sent INTEGER DEFAULT 0,
    status TEXT DEFAULT ''
);
"""


class Database:
    """Thread-safe sqlite3 wrapper for the service data model."""

    def __init__(self, path=":memory:"):
        self.path = str(path)
        self._lock = threading.Lock()
        self._conn = sqlite3.connect(self.path, check_same_thread=False)
        self._conn.row_factory = sqlite3.Row
        with self._lock:
            self._conn.executescript(_SCHEMA)
            self._conn.commit()

    def _execute(self, sql, params=()):
        with self._lock:
            cur = self._conn.execute(sql, params)
            self._conn.commit()
            return cur

    # -- api keys ---------------------------------------------------------------
    def add_api_key(self, name: str, key: Optional[str] = None, is_admin=False) -> str:
        key = key or uuid.uuid4().hex
        self._execute(
            "INSERT OR REPLACE INTO api_key (key, name, is_admin) VALUES (?,?,?)",
            (key, name, int(is_admin)),
        )
        return key

    def check_api_key(self, key: str) -> bool:
        cur = self._execute("SELECT key FROM api_key WHERE key=?", (key,))
        return cur.fetchone() is not None

    def list_api_keys(self) -> List[Dict]:
        cur = self._execute("SELECT * FROM api_key")
        return [dict(r) for r in cur.fetchall()]

    # -- dicom locations ----------------------------------------------------------
    def add_dicom_location(self, owner_key, name, host, port, ae_title=None) -> Dict:
        cur = self._execute(
            "INSERT INTO dicom_location (owner_key, name, host, port, ae_title) "
            "VALUES (?,?,?,?,?)",
            (owner_key, name, host, port, ae_title),
        )
        return self.get_dicom_location_by_id(cur.lastrowid)

    def get_dicom_location(self, owner_key, name) -> Optional[Dict]:
        cur = self._execute(
            "SELECT * FROM dicom_location WHERE owner_key=? AND name=?",
            (owner_key, name),
        )
        row = cur.fetchone()
        return dict(row) if row else None

    def get_dicom_location_by_id(self, loc_id) -> Optional[Dict]:
        cur = self._execute("SELECT * FROM dicom_location WHERE id=?", (loc_id,))
        row = cur.fetchone()
        return dict(row) if row else None

    # -- datasets -------------------------------------------------------------
    def add_dataset(self, owner_key, from_dicom_location_id=None,
                    to_dicom_location_id=None, timeout=None) -> Dict:
        dataset_id = uuid.uuid4().hex
        self._execute(
            "INSERT INTO dataset (id, owner_key, from_dicom_location_id, "
            "to_dicom_location_id, timeout, created) VALUES (?,?,?,?,?,?)",
            (dataset_id, owner_key, from_dicom_location_id, to_dicom_location_id,
             timeout, datetime.now().isoformat()),
        )
        return self.get_dataset(dataset_id)

    def get_dataset(self, dataset_id) -> Optional[Dict]:
        cur = self._execute("SELECT * FROM dataset WHERE id=?", (dataset_id,))
        row = cur.fetchone()
        if row is None:
            return None
        ds = dict(row)
        ds["input_data_objects"] = self.get_data_objects(dataset_id, is_input=True)
        ds["output_data_objects"] = self.get_data_objects(dataset_id, is_input=False)
        return ds

    def list_datasets(self, owner_key) -> List[Dict]:
        cur = self._execute("SELECT id FROM dataset WHERE owner_key=?", (owner_key,))
        return [self.get_dataset(r["id"]) for r in cur.fetchall()]

    # -- data objects ------------------------------------------------------------
    def add_data_object(self, dataset_id, is_input=True, parent_id=None, obj_type="FILE",
                        path=None, series_instance_uid=None, meta_data=None,
                        is_fetched=False) -> Dict:
        obj_id = uuid.uuid4().hex
        self._execute(
            "INSERT INTO data_object (id, dataset_id, is_input, parent_id, type, path, "
            "series_instance_uid, meta_data, is_fetched) VALUES (?,?,?,?,?,?,?,?,?)",
            (obj_id, dataset_id, int(is_input), parent_id, obj_type, path,
             series_instance_uid, json.dumps(meta_data or {}), int(is_fetched)),
        )
        return self.get_data_object(obj_id)

    def get_data_object(self, obj_id) -> Optional[Dict]:
        cur = self._execute("SELECT * FROM data_object WHERE id=?", (obj_id,))
        row = cur.fetchone()
        if row is None:
            return None
        obj = dict(row)
        obj["meta_data"] = json.loads(obj["meta_data"] or "{}")
        return obj

    def delete_data_object(self, obj_id) -> None:
        """Remove the row and best-effort unlink the file it points at."""
        obj = self.get_data_object(obj_id)
        self._execute("DELETE FROM data_object WHERE id=?", (obj_id,))
        if obj and obj.get("path"):
            try:
                Path(obj["path"]).unlink(missing_ok=True)
            except OSError:
                pass

    def get_data_objects(self, dataset_id, is_input=None) -> List[Dict]:
        if is_input is None:
            cur = self._execute(
                "SELECT id FROM data_object WHERE dataset_id=?", (dataset_id,)
            )
        else:
            cur = self._execute(
                "SELECT id FROM data_object WHERE dataset_id=? AND is_input=?",
                (dataset_id, int(is_input)),
            )
        return [self.get_data_object(r["id"]) for r in cur.fetchall()]

    def update_data_object(self, obj_id, **fields):
        allowed = {"path", "is_fetched", "is_sent", "status", "type"}
        sets = {k: v for k, v in fields.items() if k in allowed}
        if not sets:
            return
        clause = ", ".join(f"{k}=?" for k in sets)
        self._execute(
            f"UPDATE data_object SET {clause} WHERE id=?",
            tuple(sets.values()) + (obj_id,),
        )
