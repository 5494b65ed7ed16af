"""Checkpointed stage manifests: resumable builds with per-partition lineage.

Reference parity: the reference's indexer is chunked +
continue-on-error with progress/error counters
(``BlackLabConllUIndexer.java:96-135``); chunk rotation bounds memory
(``Main.java:130-133``). The north rule upgrades that to *resumable
from checkpointed segment manifests with per-partition lineage and
indexing metrics*: every build stage writes a JSON manifest recording
its inputs (paths + fingerprint), config fingerprint, outputs, and
per-partition metrics. A re-run skips any stage whose manifest says
``complete`` for the same (inputs, config) — idempotent restart after
a mid-build crash.

Commits are atomic via write-to-temp + ``os.replace`` — the parquet
"table format" analog of an Iceberg snapshot commit, isolated here so
swapping in a real Iceberg catalog is mechanical (SURVEY §7.0).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from pathlib import Path
from typing import Any

MANIFEST_NAME = "_manifest.json"


def config_fingerprint(obj: Any) -> str:
    """Stable fingerprint of a JSON-serializable config/lineage object."""
    blob = json.dumps(obj, sort_keys=True, default=str).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def input_fingerprint(paths: list[str]) -> str:
    """Fingerprint of input file listing (name, size, mtime_ns) — cheap
    lineage. mtime is part of the identity: a same-size content change
    must invalidate downstream stage manifests, or a resume would skip
    the stage and serve a stale index."""
    entries = []
    for p in sorted(paths):
        pp = Path(p)
        if pp.is_dir():
            for f in sorted(pp.rglob("*")):
                if f.is_file() and not f.name.startswith("_") and not f.name.startswith("."):
                    st = f.stat()
                    entries.append((str(f), st.st_size, st.st_mtime_ns))
        elif pp.is_file():
            st = pp.stat()
            entries.append((str(pp), st.st_size, st.st_mtime_ns))
    return config_fingerprint(entries)


class StageManifest:
    """One build stage's checkpoint record."""

    def __init__(self, stage_dir: str | Path, stage: str):
        self.stage_dir = Path(stage_dir)
        self.stage = stage
        self.path = self.stage_dir / MANIFEST_NAME

    def load(self) -> dict | None:
        if not self.path.exists():
            return None
        try:
            return json.loads(self.path.read_text())
        except (json.JSONDecodeError, OSError):
            return None

    def is_complete(self, inputs_fp: str, config_fp: str) -> bool:
        m = self.load()
        return bool(
            m
            and m.get("status") == "complete"
            and m.get("inputs_fp") == inputs_fp
            and m.get("config_fp") == config_fp
        )

    def commit(
        self,
        inputs_fp: str,
        config_fp: str,
        metrics: dict | None = None,
        partitions: list[dict] | None = None,
        lineage: dict | None = None,
    ) -> dict:
        """Atomically mark the stage complete with metrics + lineage."""
        m = {
            "stage": self.stage,
            "status": "complete",
            "inputs_fp": inputs_fp,
            "config_fp": config_fp,
            "committed_at": time.time(),
            "metrics": metrics or {},
            "partitions": partitions or [],
            "lineage": lineage or {},
        }
        self.stage_dir.mkdir(parents=True, exist_ok=True)
        tmp = self.path.with_suffix(".tmp")
        tmp.write_text(json.dumps(m, indent=1, sort_keys=True))
        os.replace(tmp, self.path)
        return m
