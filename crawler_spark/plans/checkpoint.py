"""Round checkpointing with per-partition lineage (SURVEY.md §4.3.4).

Iceberg-snapshot semantics emulated on plain parquet (no Iceberg catalog in
the sandbox, §7.3.6): each round writes its tables under ``round=K/`` and then
atomically commits by writing ``_manifest.json`` *last*. A manifest records
row counts, the parquet file list per table (per-partition lineage), and the
round's fetch/parse metrics. Resume = max committed round; uncommitted
(manifest-less) round dirs are torn down on startup, which makes replay after
a kill idempotent — the reference analog is its skip-if-exists file sinks
(base.js:135-138,164-167).

On a real cluster the same interface binds to an Iceberg catalog
(``df.writeTo(...).append()`` + snapshot ids) — the engine only ever calls
``commit_round`` / ``latest_round`` / ``load`` / ``load_all_deltas``.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class Checkpointer:
    MANIFEST = "_manifest.json"

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- commit protocol ----------------------------------------------------
    def round_dir(self, round_no: int) -> str:
        return os.path.join(self.root, f"round={round_no}")

    def committed_rounds(self) -> list[int]:
        out = []
        if not os.path.isdir(self.root):
            return out
        for d in os.listdir(self.root):
            if d.startswith("round=") and os.path.exists(
                os.path.join(self.root, d, self.MANIFEST)
            ):
                out.append(int(d.split("=", 1)[1]))
        return sorted(out)

    def latest_round(self) -> int | None:
        rounds = self.committed_rounds()
        return rounds[-1] if rounds else None

    def cleanup_partial(self) -> None:
        """Remove round dirs that never committed (kill mid-round)."""
        latest = self.latest_round()
        for d in list(os.listdir(self.root)):
            if not d.startswith("round="):
                continue
            k = int(d.split("=", 1)[1])
            if latest is None or k > latest:
                if not os.path.exists(os.path.join(self.root, d, self.MANIFEST)):
                    shutil.rmtree(os.path.join(self.root, d))

    def commit_round(
        self,
        round_no: int,
        tables: dict[str, DataFrame],
        metrics: dict,
    ) -> dict:
        """Write all tables, then the manifest (the commit point)."""
        rdir = self.round_dir(round_no)
        lineage: dict[str, dict] = {}
        for name, df in tables.items():
            path = os.path.join(rdir, name)
            df.write.mode("overwrite").parquet(path)
            files = sorted(
                f
                for f in os.listdir(path)
                if f.endswith(".parquet") or f.startswith("part-")
            )
            lineage[name] = {
                "path": path,
                "files": files,
                "n_files": len(files),
            }
        manifest = {
            "round": round_no,
            "lineage": lineage,
            "metrics": metrics,
        }
        tmp = os.path.join(rdir, self.MANIFEST + ".tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1, default=str)
        os.replace(tmp, os.path.join(rdir, self.MANIFEST))
        return manifest

    # -- readers --------------------------------------------------------------
    def load(self, spark: SparkSession, round_no: int, name: str) -> DataFrame:
        return spark.read.parquet(os.path.join(self.round_dir(round_no), name))

    def load_all_deltas(
        self,
        spark: SparkSession,
        name: str,
        upto: int | None = None,
        after: int | None = None,
    ) -> DataFrame | None:
        """Union of a delta table across committed rounds (≤ upto, > after)."""
        rounds = self.committed_rounds()
        if upto is not None:
            rounds = [r for r in rounds if r <= upto]
        if after is not None:
            rounds = [r for r in rounds if r > after]
        paths = [
            os.path.join(self.round_dir(r), name)
            for r in rounds
            if os.path.isdir(os.path.join(self.round_dir(r), name))
        ]
        if not paths:
            return None
        return spark.read.parquet(*paths)

    def manifest(self, round_no: int) -> dict:
        with open(os.path.join(self.round_dir(round_no), self.MANIFEST)) as fh:
            return json.load(fh)
