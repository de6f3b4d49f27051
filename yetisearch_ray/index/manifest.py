"""Index manifest: commit point, per-partition lineage + metrics, resume.

Replaces the reference's ``{index}_meta`` key/value table
(``src/Storage/SqliteStorage.php:195-199``) with a JSON manifest that is
written LAST in the build (the commit point).  Each posting partition
records its own status/rows/terms/bytes so an interrupted build can be
resumed: committed partitions are skipped, everything else is re-derived
from lineage (input fingerprint + config hash).
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import dataclass, field
from typing import Any

MANIFEST_NAME = "manifest.json"


@dataclass
class Manifest:
    path: str
    data: dict[str, Any] = field(default_factory=dict)

    # ------------------------------------------------------------------
    @classmethod
    def load(cls, index_dir: str) -> "Manifest":
        p = os.path.join(index_dir, MANIFEST_NAME)
        with open(p) as f:
            return cls(path=p, data=json.load(f))

    @classmethod
    def exists(cls, index_dir: str) -> bool:
        return os.path.exists(os.path.join(index_dir, MANIFEST_NAME))

    def save(self) -> None:
        """Atomic write (tmp + rename): readers never see a torn manifest."""
        d = os.path.dirname(self.path)
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, prefix=".manifest-")
        with os.fdopen(fd, "w") as f:
            json.dump(self.data, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)

    # ------------------------------------------------------------------
    @classmethod
    def new(cls, index_dir: str, config: dict, input_fingerprint: str) -> "Manifest":
        return cls(
            path=os.path.join(index_dir, MANIFEST_NAME),
            data={
                "format_version": 1,
                "created_at": time.time(),
                "config": config,
                "input_fingerprint": input_fingerprint,
                "partitions": {},
                "docstore": {},
                "stats": {},
                "status": "building",
            },
        )

    @property
    def config(self) -> dict:
        return self.data["config"]

    @property
    def stats(self) -> dict:
        return self.data["stats"]

    @property
    def num_partitions(self) -> int:
        return int(self.data["config"]["num_partitions"])

    def committed_partitions(self) -> set[int]:
        """Committed partition ids (across generations; keys are
        ``"gen:part"``, legacy bare ``"part"`` accepted)."""
        out = set()
        for k, v in self.data.get("partitions", {}).items():
            if v.get("status") == "committed":
                out.add(int(k.split(":")[-1]))
        return out

    def generations(self) -> set[int]:
        return {
            int(k.split(":")[0]) if ":" in k else 0
            for k in self.data.get("partitions", {})
        }

    def record_partition(self, part, metrics: dict) -> None:
        self.data["partitions"][str(part)] = {"status": "committed", **metrics}

    def finalize(self, stats: dict, docstore: dict) -> None:
        self.data["stats"] = stats
        self.data["docstore"] = docstore
        self.data["status"] = "committed"
        self.data["committed_at"] = time.time()
