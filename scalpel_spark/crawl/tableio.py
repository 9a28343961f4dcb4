"""Iceberg-style snapshot/manifest layer over Parquet.

No Iceberg jars ship in this sandbox (SURVEY §7), so the table layer is
a thin interface: per-round immutable Parquet artifacts + an atomically
replaced JSON manifest naming every file, row count, and config
fingerprint. Real deployment swaps the writes for
``df.writeTo(...).append()`` on an Iceberg catalog; the manifest becomes
the Iceberg snapshot log. Resume = read manifest, continue after the
last *complete* round (a round is complete only once the manifest entry
is committed — torn rounds are invisible, so resume is exact).
"""

from __future__ import annotations

import json
import os
import time


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # --- manifest ---------------------------------------------------------

    @property
    def manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def read_manifest(self) -> dict:
        if not os.path.exists(self.manifest_path):
            return {"engine": {}, "rounds": []}
        with open(self.manifest_path) as f:
            return json.load(f)

    def _write_manifest(self, manifest: dict) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, self.manifest_path)

    def init_engine(self, config: dict) -> None:
        manifest = self.read_manifest()
        manifest["engine"] = config
        self._write_manifest(manifest)

    def last_complete_round(self) -> int | None:
        rounds = self.read_manifest()["rounds"]
        return rounds[-1]["round"] if rounds else None

    # --- round artifacts --------------------------------------------------

    def round_dir(self, rnd: int) -> str:
        return os.path.join(self.root, "rounds", f"r{rnd:05d}")

    def table_path(self, rnd: int, name: str) -> str:
        return os.path.join(self.round_dir(rnd), name)

    def commit_round(self, rnd: int, tables: dict, metrics: dict) -> None:
        """``tables``: name → (path, row_count); called only after all
        parquet writes for the round succeeded."""
        manifest = self.read_manifest()
        rounds = [r for r in manifest["rounds"] if r["round"] != rnd]
        rounds.append(
            {
                "round": rnd,
                "committed_at": time.time(),
                "tables": {
                    name: {"path": os.path.relpath(path, self.root), "rows": rows}
                    for name, (path, rows) in tables.items()
                },
                "metrics": metrics,
            }
        )
        rounds.sort(key=lambda r: r["round"])
        manifest["rounds"] = rounds
        self._write_manifest(manifest)

    def round_metrics(self) -> list:
        return [
            {"round": r["round"], **r["metrics"]} for r in self.read_manifest()["rounds"]
        ]
