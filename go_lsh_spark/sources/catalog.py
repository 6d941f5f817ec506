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

fmt='parquet+manifest' adds the Iceberg trick in miniature: every stage
commit records its live data files in an atomically-replaced `_manifest.json`
and reads go through the manifest, so `delete_uids` can rewrite ONLY the
files that contain deleted uids (detected via the `_metadata.file_path`
column + a broadcast semi-join), swap the manifest in one os.replace, and
leave every other data file untouched -- a file-pruned row delete instead of
a full table rewrite. Every crash point leaves a readable table: new files
land before the manifest swap (invisible until it), and old files are
removed only after it (stale-but-unlisted files are harmless garbage).
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
MANIFEST = "_manifest.json"


def _strip_uri(p: str) -> str:
    """file:/x or file:///x -> /x (the `_metadata.file_path` column is a URI).

    Parsed with urlparse rather than hand-stripped slashes: a
    `file://host/x` URI (non-empty authority) must be rejected, not silently
    mapped to /host/x -- file-pruned deletes os.remove() these paths, and on
    a non-local Hadoop FS that would target the wrong file (r3 ADVICE).

    Only strings that actually LOOK like URIs are parsed: 'file:...' or an
    explicit '<scheme>://' prefix. A plain relative path with a colon in its
    first segment ('data:v2/part.parquet') is a valid local path and must
    pass through unchanged, not urlparse into scheme 'data' (r4 ADVICE #4)."""
    import re  # noqa: PLC0415
    from urllib.parse import unquote, urlparse  # noqa: PLC0415

    if not (
        p.startswith("file:") or re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*://", p)
    ):
        return p
    u = urlparse(p)
    if u.scheme != "file":
        raise ValueError(f"non-local file URI not supported here: {p}")
    if u.netloc not in ("", "localhost"):
        raise ValueError(f"file URI with remote authority not supported: {p}")
    return unquote(u.path)


def _shuffle_totals(spark: SparkSession, max_stages: int | None = 2000) -> dict | None:
    """Cumulative (shuffle read, shuffle write, input, output) bytes across
    all Spark stages so far, from the JVM AppStatusStore (the store that
    backs the UI; available even with spark.ui.enabled=false). Deltas of
    this around a stage write give the stage's real shuffle width -- the
    evidence for claims like 'deferring the transcript join narrows the
    verify shuffle'. Returns None if the internal API shifts (fail-soft:
    metrics are telemetry, never load-bearing).

    max_stages bounds the cost: the iteration costs ~6 py4j round trips
    PER RETAINED STAGE, so in a long-lived session with tens of thousands
    of retained stages (a full test suite run raised retention exactly to
    keep deltas trim-proof) one call costs tens of seconds -- measured as
    per-batch streaming walls 'growing' with suite progress, which is this
    telemetry's own cost, not the pipeline's. Above the cap the totals are
    skipped in O(1) (None, same as the API-shift fallback); callers that
    need exact deltas regardless pass max_stages=None."""
    try:
        jvm = spark._jvm
        store = spark._jsparkSession.sparkContext().statusStore()
        if max_stages is not None:
            n = store.store().count(
                jvm.java.lang.Class.forName(
                    "org.apache.spark.status.StageDataWrapper"
                )
            )
            if n > max_stages:
                return None
        empty = jvm.java.util.Collections.emptyList()
        defaults = [getattr(store, f"stageList$default${i}")() for i in range(2, 6)]
        it = store.stageList(empty, *defaults).iterator()
        out = {"shuffle_read_bytes": 0, "shuffle_write_bytes": 0,
               "input_bytes": 0, "output_bytes": 0}
        while it.hasNext():
            s = it.next()
            out["shuffle_read_bytes"] += s.shuffleReadBytes()
            out["shuffle_write_bytes"] += s.shuffleWriteBytes()
            out["input_bytes"] += s.inputBytes()
            out["output_bytes"] += s.outputBytes()
        return out
    except Exception:  # noqa: BLE001
        return None


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
    shuffle: dict | None = None


@dataclass
class Warehouse:
    """fmt options:
      * 'parquet+manifest' (DEFAULT): atomic manifest-swap commits +
        file-pruned deletes -- strictly better than plain parquet and what
        the CLI uses.
      * 'parquet': plain directory tables; deletes are full rewrites with a
        crash-recoverable rename-aside swap.
      * 'iceberg': SKETCH ONLY -- requires the Iceberg runtime jar, which
        this sandbox does not have; constructing a stage with it raises
        NotImplementedError unless the jar is detected on the classpath.
        On a real cluster the manifest mode's commit/delete semantics map
        1:1 onto Iceberg snapshots + delete files.
    """

    spark: SparkSession
    root: str
    fmt: str = "parquet+manifest"
    stages: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.fmt == "iceberg" and not self._iceberg_available():
            raise NotImplementedError(
                "fmt='iceberg' requires the Iceberg runtime jar on the Spark "
                "classpath (none in this sandbox); use fmt='parquet+manifest' "
                "for the same commit/delete semantics in miniature"
            )

    def _iceberg_available(self) -> bool:
        try:
            self.spark._jvm.java.lang.Class.forName(  # noqa: SLF001
                "org.apache.iceberg.catalog.Catalog"
            )
            return True
        except Exception:  # noqa: BLE001
            return False

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

    @property
    def _fmt_real(self) -> str:
        return "parquet" if self.fmt == "parquet+manifest" else self.fmt

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self.path(name), MANIFEST)

    def _list_data_files(self, path: str) -> list[str]:
        out = []
        for root, _dirs, files in os.walk(path):
            for fn in files:
                if fn.endswith(".parquet") and not fn.startswith(("_", ".")):
                    out.append(os.path.relpath(os.path.join(root, fn), path))
        return sorted(out)

    def _write_manifest(
        self, name: str, files: list[str], schema_json: dict | None = None
    ) -> None:
        """Atomic manifest swap (os.replace): readers see either the old or
        the new file list, never a partial state. The table schema rides in
        the manifest so a legitimately EMPTY table (e.g. every row deleted)
        stays readable (r3 ADVICE)."""
        mf = self._manifest_path(name)
        if schema_json is None and os.path.exists(mf):
            with open(mf) as f:
                schema_json = json.load(f).get("schema")
        tmp = mf + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "files": sorted(files),
                    "schema": schema_json,
                    "updated_at": time.time(),
                },
                f,
                indent=2,
            )
        os.replace(tmp, mf)

    def manifest_files(self, name: str) -> list[str]:
        with open(self._manifest_path(name)) as f:
            return json.load(f)["files"]

    def read(self, name: str) -> DataFrame:
        path = self.path(name)
        if self.fmt == "parquet+manifest":
            mf = self._manifest_path(name)
            if not os.path.exists(mf):
                # legacy plain-parquet stage opened under the (new) default
                # manifest mode: adopt it by backfilling a manifest from the
                # directory listing, then read through it
                self._write_manifest(name, self._list_data_files(path))
            with open(mf) as f:
                manifest = json.load(f)
            files = [os.path.join(path, f) for f in manifest["files"]]
            if not files:
                # empty table (all rows deleted): reconstruct from the
                # schema recorded at last write instead of crashing on a
                # zero-path parquet read
                from pyspark.sql.types import StructType  # noqa: PLC0415

                if manifest.get("schema") is None:
                    raise ValueError(
                        f"stage {name!r} manifest lists no files and carries "
                        "no schema; table is unreadable"
                    )
                return self.spark.createDataFrame(
                    [], StructType.fromJson(manifest["schema"])
                )
            # basePath keeps partition-directory columns (src=.../band=...)
            # resolvable when loading an explicit file list
            return self.spark.read.option("basePath", path).parquet(*files)
        return self.spark.read.format(self.fmt).load(path)

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
        shuf0 = _shuffle_totals(self.spark)
        df = fn()
        path = self.path(name)
        if os.path.exists(path):
            shutil.rmtree(path)
        writer = df.write.format(self._fmt_real).mode("overwrite")
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
            writer = df.write.format(self._fmt_real).mode("overwrite")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
        writer.save(path)
        if self.fmt == "parquet+manifest":
            self._write_manifest(
                name, self._list_data_files(path), schema_json=df.schema.jsonValue()
            )

        out = self.read(name)
        rows = out.count()
        wall = time.time() - t0
        shuf1 = _shuffle_totals(self.spark)
        shuffle = (
            {k: shuf1[k] - shuf0[k] for k in shuf1} if shuf0 and shuf1 else None
        )
        meta = {
            "name": name,
            "fingerprint": fp,
            "inputs": lineage,
            "rows": rows,
            "partition_by": list(partition_by),
            "wall_secs": wall,
            "committed_at": time.time(),
            "config": config or {},
            "shuffle": shuffle,
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
            shuffle=shuffle,
        )
        return out

    def _delete_pruned(
        self, name: str, deleted: DataFrame, uid_col: str
    ) -> None:
        """File-pruned row delete (fmt='parquet+manifest'): rewrite ONLY the
        data files that contain a deleted uid; every other file survives
        untouched and the manifest swap is the single atomic commit point.

        Crash safety at every step: (1) the rewrite lands in a tmp dir
        outside the table; (2) moved-in files are invisible until the
        manifest swap; (3) old affected files are removed only after the
        swap -- a crash leaves at worst unlisted garbage files, never a
        corrupt or partial table."""
        path = self.path(name)
        df = self.read(name).withColumn("_file", F.col("_metadata.file_path"))
        affected_raw = [
            r["_file"]
            for r in df.join(F.broadcast(deleted), uid_col, "left_semi")
            .select("_file")
            .distinct()
            .collect()
        ]
        if not affected_raw:
            return
        affected = [_strip_uri(p) for p in affected_raw]
        affected_rel = {os.path.relpath(p, path) for p in affected}
        remaining_in_affected = (
            df.filter(F.col("_file").isin(affected_raw))
            .drop("_file")
            .join(F.broadcast(deleted), uid_col, "left_anti")
        )
        meta_part = []
        sc = self._sidecar(name)
        if os.path.exists(sc):
            with open(sc) as f:
                meta_part = json.load(f).get("partition_by", [])
        tmp = path + "__delta"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        w = remaining_in_affected.write.format("parquet").mode("overwrite")
        if meta_part:
            w = w.partitionBy(*meta_part)
        w.save(tmp)
        moved = []
        for rel in self._list_data_files(tmp):
            dst = os.path.join(path, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.replace(os.path.join(tmp, rel), dst)
            moved.append(rel)
        live = [
            f for f in self.manifest_files(name) if f not in affected_rel
        ] + moved
        self._write_manifest(name, live)  # atomic commit point
        for p in affected:
            try:
                os.remove(p)
            except OSError:
                pass
        shutil.rmtree(tmp, ignore_errors=True)

    def delete_uids(self, name: str, uids: Sequence, uid_col: str = "uid") -> int:
        """O6 against a PERSISTED stage: remove the given uids from
        `<root>/<name>` (with fmt='iceberg' this would be a metadata-only
        `DELETE FROM`; fmt='parquet+manifest' rewrites only the files that
        contain deleted rows; plain parquet rewrites the stage with a
        crash-recoverable rename-aside swap).

        Returns rows removed. Raises DocumentNotStored if any requested uid
        is absent -- the reference's per-uid error (lsh/lsh.go:93-102,
        tables/tables.go:157-181) -- AFTER removing the ones that exist,
        matching the reference's delete-then-report behavior.
        """
        from go_lsh_spark.oracle import DocumentNotStored  # noqa: PLC0415

        path = self.path(name)
        old = path + "__old"
        if not os.path.exists(path) and os.path.exists(old):
            # recover from a crash between the two renames below
            os.rename(old, path)
        df = self.read(name)
        uid_type = df.schema[uid_col].dataType.simpleString()
        deleted = self.spark.createDataFrame(
            [(u,) for u in uids], f"{uid_col} {uid_type}"
        )
        present = {
            r[uid_col]
            for r in deleted.join(df, uid_col, "left_semi").distinct().collect()
        }
        if self.fmt == "parquet+manifest":
            self._delete_pruned(name, deleted, uid_col)
        else:
            remaining = df.join(F.broadcast(deleted), uid_col, "left_anti")
            tmp = path + "__rewrite"
            remaining.write.format(self._fmt_real).mode("overwrite").save(tmp)
            # rename-aside swap: every crash point leaves a recoverable table
            # (old copy intact until the new one is in place) -- never
            # rmtree-then-rename, whose mid-crash destroys the stage
            if os.path.exists(old):
                shutil.rmtree(old)
            os.rename(path, old)
            os.rename(tmp, path)
            shutil.rmtree(old)
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
                "shuffle": s.shuffle,
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
