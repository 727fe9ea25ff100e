"""Layered warehouse writer (reference's raw/legacy two-layer model).

Reference: `utils.py:145-163` writes every dataset to Postgres over JDBC
— ``raw.<entity>_pre`` with overwrite, ``legacy.<entity>`` append with a
``DAY_DT = current_date()`` column (`ingestion_task.py:49,59-60`).

Spark-first redesign:
- storage is parquet partitioned by ``DAY_DT`` (→ static/dynamic
  partition pruning for the ``DAY_DT == run_date`` read-backs, reference
  P6, and cheap per-day backfill/replace);
- ``run_date`` is an explicit parameter, never ``current_date()`` inside
  the plan (determinism hazard flagged in SURVEY.md §4);
- JDBC remains available as a serving extract, not the system of record.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class LayeredWarehouse:
    def __init__(self, root: str):
        self.root = root

    def _path(self, layer: str, name: str) -> str:
        return os.path.join(self.root, layer, name)

    def write_raw(self, df: DataFrame, name: str) -> str:
        """Current-day snapshot, full overwrite (raw.<name>_pre analog)."""
        path = self._path("raw", f"{name}_pre")
        df.write.mode("overwrite").parquet(path)
        return path

    def write_legacy(self, df: DataFrame, name: str, run_date: dt.date) -> str:
        """Append-only history partitioned by DAY_DT; re-running a day
        replaces just that day's partition (dynamic partition overwrite),
        which the reference's plain JDBC append cannot do."""
        path = self._path("legacy", name)
        self._assert_legacy_layout(df.sparkSession, name, batched=False)
        out = df.withColumn("DAY_DT", F.lit(run_date.isoformat()).cast("date")) if "DAY_DT" not in df.columns else df
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("DAY_DT")
            .parquet(path)
        )
        return path

    def write_bucketed(
        self,
        df: DataFrame,
        table: str,
        bucket_cols: list[str],
        num_buckets: int = 32,
        path: str | None = None,
    ) -> str:
        """Bucketed fact/dim table for CO-LOCATED joins: two tables
        bucketed (and sorted) on the same keys with the same bucket
        count join with ZERO shuffle — the join key partitioning is
        baked into the layout at write time. This is the 100 TB answer
        to recurring fact⋈fact joins (e.g. reconciliation runs against
        yesterday's snapshot): pay the shuffle once at ingest, never
        per query. Registered in the session catalog (bucket metadata
        lives there, not in parquet)."""
        path = path or self._path("bucketed", table)
        (
            df.write.mode("overwrite")
            .bucketBy(num_buckets, *bucket_cols)
            .sortBy(*bucket_cols)
            .option("path", path)
            .format("parquet")
            .saveAsTable(table)
        )
        return table

    def serve_jdbc(
        self,
        df: DataFrame,
        url: str,
        table: str,
        mode: str = "overwrite",
        schema: str | None = None,
        **options,
    ) -> None:
        """Serving extract to a JDBC database (reference S7,
        `utils.py:145-163`): parquet stays the system of record, the
        relational copy serves dashboards/APIs. ``schema`` triggers the
        bootstrap DDL hook (S9, `Raptor.py:41-57`) before the write.
        Overwrite defaults to ``truncate`` semantics upstream — see
        sinks.jdbc for the scale knobs (batchsize, numPartitions)."""
        from .jdbc import ensure_schema, write_jdbc

        ddl_runner = options.pop("ddl_runner", None)
        if schema is not None:
            ensure_schema(
                df.sparkSession,
                schema,
                url=url,
                user=options.get("user"),
                password=options.get("password"),
                ddl_runner=ddl_runner,
            )
        write_jdbc(df, url, table, mode=mode, **options)

    def _fs(self, spark: SparkSession, path: str):
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)
        return p.getFileSystem(spark._jsc.hadoopConfiguration()), p, jvm

    def _legacy_layout(self, spark: SparkSession, name: str) -> str | None:
        """'batched' (DAY_DT/__BATCH_ID, stream-landed), 'plain'
        (DAY_DT-only, batch writers), 'mixed' (corrupt: both depths
        present — every consumer must refuse) or None (table absent).
        Checks EVERY partition dir: sampling one would let a mixed
        table pass or fail depending on listing order."""
        fs, root, _ = self._fs(spark, self._path("legacy", name))
        if not fs.exists(root):
            return None
        seen: set[str] = set()
        for status in fs.listStatus(root):
            if not (status.isDirectory() and status.getPath().getName().startswith("DAY_DT=")):
                continue
            has_batch_dirs = any(
                s.isDirectory() and s.getPath().getName().startswith("__BATCH_ID=")
                for s in fs.listStatus(status.getPath())
            )
            seen.add("batched" if has_batch_dirs else "plain")
        if not seen:
            return None  # root exists but holds no partition yet
        return seen.pop() if len(seen) == 1 else "mixed"

    def _assert_legacy_layout(self, spark: SparkSession, name: str, batched: bool) -> None:
        """A legacy table is partitioned either DAY_DT-only (batch
        writers) or DAY_DT/__BATCH_ID (stream_to_legacy). Mixing the two
        under one table name corrupts partition discovery (Spark raises
        on conflicting directory depths, or worse mis-reads), so refuse
        up front when the existing layout disagrees with the writer."""
        path = self._path("legacy", name)
        layout = self._legacy_layout(spark, name)
        if layout == "mixed":
            raise ValueError(
                f"legacy table {name!r} at {path} mixes DAY_DT-only and "
                "DAY_DT/__BATCH_ID partition dirs — partition discovery is "
                "already broken; repair the layout before writing more."
            )
        if layout is not None:
            has_batch_dirs = layout == "batched"
            if has_batch_dirs != batched:
                want = "DAY_DT/__BATCH_ID" if batched else "DAY_DT-only"
                have = "DAY_DT/__BATCH_ID" if has_batch_dirs else "DAY_DT-only"
                raise ValueError(
                    f"legacy table {name!r} at {path} has a {have} layout; this "
                    f"writer produces {want}. Batch writers (write_legacy/"
                    "append_legacy) and stream_to_legacy cannot share a table "
                    "name — land the stream under its own name."
                )

    def append_legacy(self, df: DataFrame, name: str, run_date: dt.date) -> str:
        """Plain append into the DAY_DT-partitioned history — the
        micro-batch form (streaming foreachBatch appends each batch;
        the dynamic-overwrite write_legacy would clobber earlier
        batches of the same day)."""
        path = self._path("legacy", name)
        self._assert_legacy_layout(df.sparkSession, name, batched=False)
        out = df.withColumn("DAY_DT", F.lit(run_date.isoformat()).cast("date")) if "DAY_DT" not in df.columns else df
        out.write.mode("append").partitionBy("DAY_DT").parquet(path)
        return path

    def upsert_legacy(
        self, df: DataFrame, name: str, keys: list[str], run_date: dt.date
    ) -> str:
        """MERGE (keyed upsert) into one DAY_DT partition of the legacy
        layer: incoming rows REPLACE existing same-key rows, all other
        rows of the day survive — the lakehouse `MERGE INTO` re-expressed
        over plain partitioned parquet (the reference's append-only JDBC
        history cannot correct a row at all; `write_legacy` can only
        replace the WHOLE day).

        Mechanics: read ONLY the target day (partition-pruned), anti-join
        it against the incoming keys, union the incoming rows, and
        dynamic-partition-overwrite just that day. The merged day slice
        is `localCheckpoint`-ed first — Spark refuses to overwrite a
        path its own plan is still reading from, and truncating the
        lineage is the supported way out; the materialized slice is one
        day, not the table. Cost at 100 TB: one day partition read +
        rewritten per run, never the table.
        """
        if not keys:
            raise ValueError("upsert_legacy needs at least one key column")
        spark = df.sparkSession
        self._assert_legacy_layout(spark, name, batched=False)
        path = self._path("legacy", name)
        day = F.lit(run_date.isoformat()).cast("date")
        if "DAY_DT" in df.columns:
            # the merge is scoped to run_date's partition — but dynamic
            # partition overwrite rewrites EVERY day present in the
            # incoming frame, so a stray other-day row would replace
            # that whole day with just the strays (silent data loss).
            # Refuse loudly instead. Bounded driver action: 1-row count.
            # eqNullSafe: a NULL DAY_DT row would slip through `!=` (NULL
            # compares to NULL) and land in the hive default partition
            strays = df.filter(~F.col("DAY_DT").eqNullSafe(day)).count()
            if strays:
                raise ValueError(
                    f"upsert_legacy targets DAY_DT={run_date.isoformat()} but the "
                    f"incoming frame carries {strays} row(s) with a different "
                    "DAY_DT — dynamic overwrite would destroy those days. "
                    "Upsert one day at a time."
                )
            incoming = df
        else:
            incoming = df.withColumn("DAY_DT", day)
        fs, root, _ = self._fs(spark, path)
        if not fs.exists(root):
            incoming.write.mode("overwrite").partitionBy("DAY_DT").parquet(path)
            return path
        # mergeSchema: the target day's own files may carry columns added
        # after older days (additive evolution) — a single-footer sample
        # could miss them and this rewrite would destroy them for the day
        existing_day = (
            spark.read.option("mergeSchema", "true").parquet(path)
            .filter(F.col("DAY_DT") == day)
        )
        kept = existing_day.join(
            incoming.select(*keys).distinct(), keys, "left_anti"
        )
        # union BY NAME with null backfill in both directions: incoming
        # may introduce new columns (they must persist, as append would
        # persist them) and may lack evolved ones (null like any old row)
        merged = kept.unionByName(incoming, allowMissingColumns=True).localCheckpoint()
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("DAY_DT")
            .parquet(path)
        )
        return path

    def recover_compaction(
        self, spark: SparkSession, name: str, day_name: str | None = None
    ) -> dict:
        """Heal interrupted ``compact_legacy_day`` swaps. The swap is
        two renames (day→trash, staging→day); a crash between them
        leaves the day's rows stranded in a dot-prefixed
        ``.compact_trash_DAY_DT=*`` dir that partition discovery
        ignores — i.e. the day looks MISSING until recovered. This
        scans the table root and, per leftover trash dir: restores it
        when no live day exists (crash inside the window), or deletes
        it when the live day exists (crash after install, before
        cleanup). Leftover ``.compact_staging_*`` dirs are always
        deleted (pre-swap output; the source day is intact either way).

        ``day_name`` (e.g. ``DAY_DT=2025-07-09``) restricts recovery to
        that day's leftovers — the form ``compact_legacy_day`` runs
        automatically, so compacting one day never touches a SIBLING
        day's in-flight swap state. The unscoped full-table form is for
        startup/on-call use and must not run while compactions are in
        flight (it would mistake their live staging/trash dirs for
        leftovers). Returns {"restored": [...], "cleaned": [...]}.
        """
        path = self._path("legacy", name)
        fs, root, jvm = self._fs(spark, path)
        restored, cleaned = [], []
        if not fs.exists(root):
            return {"restored": restored, "cleaned": cleaned}
        for st in fs.listStatus(root):
            base = st.getPath().getName()
            if day_name is not None and not base.endswith(day_name):
                continue
            if base.startswith(".compact_staging_"):
                fs.delete(st.getPath(), True)
                cleaned.append(base)
            elif base.startswith(".compact_trash_"):
                # local name, NOT the day_name parameter: rebinding the
                # parameter here would activate the endswith filter
                # mid-scan and silently skip every other stranded day
                # in the unscoped (day_name=None) startup form
                restored_day = base[len(".compact_trash_"):]
                live = jvm.org.apache.hadoop.fs.Path(root, restored_day)
                if fs.exists(live):
                    fs.delete(st.getPath(), True)
                    cleaned.append(base)
                else:
                    if not fs.rename(st.getPath(), live):
                        raise OSError(f"could not restore {restored_day} from {base}")
                    restored.append(restored_day)
        return {"restored": restored, "cleaned": cleaned}

    def compact_legacy_day(
        self, spark: SparkSession, name: str, run_date: dt.date, n_files: int = 8
    ) -> dict:
        """Small-file compaction for one legacy day — the operational
        fix for the streaming sink's one-directory-per-micro-batch
        output (and for drip-fed append_legacy days): rewrite the day's
        rows as ``n_files`` right-sized parquet files and swap them in.

        Layout-preserving: a stream-landed (DAY_DT/__BATCH_ID) day
        compacts into a single ``__BATCH_ID=-1`` partition — the table
        keeps a uniform directory depth, so partition discovery stays
        valid alongside un-compacted days (a depth-changing "finalize"
        would corrupt the whole table's discovery). A batch (DAY_DT-
        only) day compacts in place. Swap protocol: write to a staging
        dir, rename old day aside, rename staging in, delete the old
        day — each rename is atomic on HDFS, but the swap as a whole is
        NOT: a reader between the two renames sees the day missing, and
        a crash there strands the rows in ``.compact_trash_*``
        (invisible to partition discovery). CONTRACT: schedule
        compaction without concurrent readers of the day, and
        interrupted swaps self-heal — ``recover_compaction`` runs first
        on every invocation and restores any stranded day (operators
        can also call it at startup). Object stores should route this
        through a committer. At 100 TB: one day read + rewritten,
        executor-parallel; the driver only issues renames.

        Returns {"rows": n, "files_before": b, "files_after": a}.
        """
        if n_files < 1:
            raise ValueError("n_files must be >= 1")
        day_name = f"DAY_DT={run_date.isoformat()}"
        self.recover_compaction(spark, name, day_name=day_name)
        layout = self._legacy_layout(spark, name)
        if layout is None:
            raise ValueError(f"legacy table {name!r} does not exist")
        path = self._path("legacy", name)
        fs, root, jvm = self._fs(spark, path)
        day_path = jvm.org.apache.hadoop.fs.Path(root, day_name)
        if not fs.exists(day_path):
            raise ValueError(f"{name!r} has no partition {day_name}")

        def _count_files(p) -> int:
            total = 0
            for st in fs.listStatus(p):
                if st.isDirectory():
                    total += _count_files(st.getPath())
                elif st.getPath().getName().endswith(".parquet"):
                    total += 1
            return total

        files_before = _count_files(day_path)
        day = F.lit(run_date.isoformat()).cast("date")
        # mergeSchema: the day may carry columns newer than the footer
        # Spark would sample — compaction must preserve them (it deletes
        # the originals)
        df = (
            spark.read.option("mergeSchema", "true").parquet(path)
            .filter(F.col("DAY_DT") == day).drop("DAY_DT")
        )
        if "__BATCH_ID" in df.columns:
            df = df.drop("__BATCH_ID")
        # materialize BEFORE touching the source files (same
        # read-then-overwrite hazard as upsert_legacy)
        compacted = df.repartition(n_files).localCheckpoint()
        n_rows = compacted.count()

        staging = jvm.org.apache.hadoop.fs.Path(root, f".compact_staging_{day_name}")
        target_dir = staging
        if layout == "batched":
            target_dir = jvm.org.apache.hadoop.fs.Path(staging, "__BATCH_ID=-1")
        compacted.write.mode("overwrite").parquet(str(target_dir))
        trash = jvm.org.apache.hadoop.fs.Path(root, f".compact_trash_{day_name}")
        if fs.exists(trash):
            fs.delete(trash, True)
        if not fs.rename(day_path, trash):
            raise OSError(f"compaction could not move {day_name} aside")
        if not fs.rename(staging, day_path):
            if not fs.rename(trash, day_path):  # roll back
                raise OSError(
                    f"compaction could not install {day_name} AND the rollback "
                    f"rename failed — day stranded in {trash}; run "
                    "recover_compaction"
                )
            raise OSError(f"compaction could not install the compacted {day_name}")
        fs.delete(trash, True)
        return {
            "rows": int(n_rows),
            "files_before": int(files_before),
            "files_after": _count_files(day_path),
        }

    def stream_to_legacy(
        self,
        stream_df: DataFrame,
        name: str,
        run_date: dt.date,
        checkpoint_dir: str,
    ):
        """Land a stream into the legacy layer via ``foreachBatch``;
        offsets are tracked in ``checkpoint_dir`` so a restart resumes
        where it stopped. Delivery is EFFECTIVELY EXACTLY-ONCE: each
        micro-batch writes under its own ``__BATCH_ID`` partition with
        dynamic partition overwrite, so when a crash lands between the
        sink write and the checkpoint commit, the replayed batch (same
        deterministic batch id, per the foreachBatch contract)
        REPLACES its own earlier files instead of appending duplicates.
        ``read_legacy`` hides the batch column. Returns the
        StreamingQuery; caller owns its lifecycle.

        The DAY_DT/__BATCH_ID layout is INCOMPATIBLE with the DAY_DT-only
        layout of write_legacy/append_legacy — a stream must own its
        table name (guarded by _assert_legacy_layout)."""
        path = self._path("legacy", name)
        self._assert_legacy_layout(stream_df.sparkSession, name, batched=True)
        day = F.lit(run_date.isoformat()).cast("date")

        def write_batch(batch_df: DataFrame, batch_id: int) -> None:
            out = batch_df if "DAY_DT" in batch_df.columns else batch_df.withColumn("DAY_DT", day)
            (
                out.withColumn("__BATCH_ID", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("DAY_DT", "__BATCH_ID")
                .parquet(path)
            )

        return (
            stream_df.writeStream.outputMode("append")
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(write_batch)
            .start()
        )

    def expire_legacy_days(
        self,
        spark: SparkSession,
        name: str,
        keep_days: int,
        as_of: dt.date,
    ) -> list[str]:
        """Retention: drop legacy ``DAY_DT`` partitions older than
        ``as_of - keep_days`` (cheap because DAY_DT is a physical
        partition directory — the reference's append-only JDBC history
        can only delete with a full-table DELETE). Goes through the
        Hadoop FileSystem API so the same code works on HDFS/object
        stores, not just local paths. Returns the partition values
        dropped."""
        if keep_days < 1:
            raise ValueError(f"keep_days must be >= 1, got {keep_days}")
        cutoff = (as_of - dt.timedelta(days=keep_days - 1)).isoformat()
        jvm = spark._jvm
        root = jvm.org.apache.hadoop.fs.Path(self._path("legacy", name))
        fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
        dropped: list[str] = []
        if not fs.exists(root):
            return dropped
        for status in fs.listStatus(root):
            base = status.getPath().getName()
            if not (status.isDirectory() and base.startswith("DAY_DT=")):
                continue
            day = base.split("=", 1)[1]
            if day < cutoff:  # ISO dates compare lexicographically
                fs.delete(status.getPath(), True)
                dropped.append(day)
        return sorted(dropped)

    def read_raw(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self._path("raw", f"{name}_pre"))

    def read_legacy(
        self,
        spark: SparkSession,
        name: str,
        run_date: dt.date | None = None,
        merge_schema: bool = False,
    ) -> DataFrame:
        """Read the legacy history (optionally one partition-pruned
        day). ``merge_schema=True`` unions the footers of every day's
        files — the schema-evolution read: a pipeline that started
        writing an extra column on some date yields that column for ALL
        days, null where absent (parquet's standard additive-evolution
        contract; without it Spark samples one footer and later columns
        can silently vanish from reads that span the change)."""
        reader = spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        df = reader.parquet(self._path("legacy", name))
        if "__BATCH_ID" in df.columns:  # streaming-landed: implementation detail
            df = df.drop("__BATCH_ID")
        if run_date is not None:
            # partition-pruned: DAY_DT is the physical partition column
            df = df.filter(F.col("DAY_DT") == F.lit(run_date.isoformat()).cast("date"))
        return df
