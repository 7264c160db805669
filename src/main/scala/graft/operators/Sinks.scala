package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import graft.compat.Compat

/** Sink / materialization operators — SURVEY §2.1 S4/S5/S8/S9 + §2.8 C2/C3.
  *
  * The reference's write path (`/root/reference/smartpy_arc/arc_utils.py:815-898`
  * `pandas_to_arc`) applies write-side type coercions (§1.2: int64→int32 when
  * in range else float64, bool→int32 — `arc_utils.py:792-800`), optionally
  * derives a point geometry from two scalar columns + a spatial reference id
  * (`x_col`/`y_col`/`srs`, `arc_utils.py:846-875`), honors an overwrite flag
  * (`TempOverwrite`, `arc_utils.py:121-135`), and can hand back a readback
  * cursor (`get_cursor`, `arc_utils.py:883-892`).
  * `pandas_to_features` (`arc_utils.py:901-953`) composes write + equi-join +
  * materialize; `polars_to_arc` (`arc_utils.py:1054-1120`) attaches geometry
  * encoding + CRS WKT as field metadata on the way out.
  *
  * Spark design: everything is one lazy plan ending in a parquet
  * `DataFrameWriter` — the coercion `select`, the point-struct `withColumn`,
  * and the join all stay inside whole-stage codegen and write directly from
  * executors (no driver materialization, unlike the reference's
  * numpy-in-driver round trip). At cluster scale the write parallelism equals
  * the upstream partitioning; callers repartition by a key column first when
  * downstream reads want co-location.
  */
object Sinks {

  /** Field-metadata keys the Arrow sink attaches (`arc_utils.py:1104-1112`). */
  val EncodingKey = "esri.encoding"
  val SrWktKey = "esri.sr_wkt"

  /** Every sink-owned parquet DATA write emits INT64 TIMESTAMP_MICROS
    * regardless of the session default. Spark 4 still defaults to
    * deprecated INT96, whose footer statistics are order-unreliable —
    * [[graft.sources.FooterStats]] must ignore them, so timestamp FILE
    * SKIPPING (manifests, per-leaf partition manifests) would be inert on
    * every table a default session writes. Per-WRITER, not session-wide:
    * the frame is re-rooted ([[org.apache.spark.sql.graftbridge.Bridge
    * .rebind]]) onto an ISOLATED session (same context/catalog, cloned
    * runtime conf — the [[graft.sources.WorkspaceDml.isolatedSession]]
    * pattern) with the key set only there, so concurrent queries on the
    * caller's session never observe the override and the driver contract's
    * own result dumps keep their session-default timestamp encoding.
    * Values are unaffected either way (both encodings round-trip Spark's
    * microsecond timestamps exactly); only footer-stats usability changes. */
  private[graft] def microsBound(df: DataFrame): DataFrame = {
    val key = "spark.sql.parquet.outputTimestampType"
    if (df.sparkSession.conf.getOption(key).contains("TIMESTAMP_MICROS")) df
    else org.apache.spark.sql.graftbridge.Bridge.rebind(df,
      graft.sources.WorkspaceDml.isolatedSession(
        df.sparkSession, key -> "TIMESTAMP_MICROS"))
  }

  /** S4 XY→point: derive a point-geometry struct from two scalar columns and
    * a spatial-reference id (`arc_utils.py:846-875`). */
  def withPointGeom(df: DataFrame, xCol: String, yCol: String, srid: Int,
                    geomCol: String = "geom"): DataFrame =
    df.withColumn(geomCol, struct(
      col(xCol).cast("double").as("x"),
      col(yCol).cast("double").as("y"),
      lit(srid).cast(IntegerType).as("srid")))

  /** S4 `pandas_to_arc`: coerce (write-side type rules) → optional XY→point →
    * write. `overwrite=false` reproduces the reference's default
    * error-on-existing (`arcpy` overwriteOutput, C2 `TempOverwrite`).
    * `format`: parquet (default; the only one carrying nested structs and
    * column stats), csv (header written), or json — mirroring the
    * reference's folder-workspace formats (SURVEY §2.1 note). */
  def writeTable(df: DataFrame, dir: String, name: String,
                 overwrite: Boolean = true,
                 xy: Option[(String, String, Int)] = None,
                 coerce: Boolean = true,
                 format: String = "parquet",
                 varcharMode: String = "truncate"): String = {
    val sized = enforceVarchar(df, varcharMode)
    val coerced = if (coerce) Compat.downcastLongs(sized) else sized
    val out = xy match {
      case Some((x, y, srid)) => withPointGeom(coerced, x, y, srid)
      case None => coerced
    }
    val path = s"$dir/$name.$format"
    val bound = if (format == "parquet") microsBound(out) else out
    val w = bound.write.mode(if (overwrite) SaveMode.Overwrite else SaveMode.ErrorIfExists)
    (if (format == "csv") w.option("header", "true") else w).format(format).save(path)
    path
  }

  /** Enforce `String(n)` lengths declared by [[FieldMap]] varchar metadata at
    * write time — the semantic of `copy_feats`' `fld_lens` resize
    * (`arc_utils.py:414-415` sets `outputField.length`; arcpy then truncates
    * longer values on copy). `mode`: "truncate" (arcpy behavior, default),
    * "error" (reject the write on the first oversize value — `raise_error`
    * stays codegen'd and distributed), "ignore" (length stays metadata-only).
    * Columns without the metadata key pass through untouched, so plain
    * writes never pay for this. */
  /** Compacted parquet write — the small-files defense. A 1000-executor
    * job that writes one file per task leaves thousands of KB-sized files
    * per day; every later scan then pays a footer read and a scheduler
    * round per file (the classic small-files collapse). This sizes the
    * file count from the data: ceil(rows / targetRows) round-robin
    * partitions (even ±1 row spread, so every file lands within one row of
    * target), belt-and-braces capped by `maxRecordsPerFile`. The row count
    * is one driver-side scalar (the Compat min/max pattern); production
    * variants can size from SizeEstimator bytes or table statistics
    * instead. Returns the file count written. */
  def writeCompacted(df: DataFrame, path: String, targetRows: Long): Int = {
    val n = df.count()
    val files = math.max(1L, (n + targetRows - 1) / targetRows).toInt
    microsBound(df.repartition(files)).write.mode("overwrite")
      .option("maxRecordsPerFile", targetRows).parquet(path)
    files
  }

  def enforceVarchar(df: DataFrame, mode: String = "truncate"): DataFrame = {
    val needsWork = df.schema.fields.exists(f =>
      f.dataType == org.apache.spark.sql.types.StringType &&
        f.metadata.contains(FieldMap.VarcharLenKey))
    if (!needsWork || mode == "ignore") df
    else {
      val cols = df.schema.fields.map { f =>
        if (f.dataType == org.apache.spark.sql.types.StringType &&
            f.metadata.contains(FieldMap.VarcharLenKey)) {
          val n = f.metadata.getLong(FieldMap.VarcharLenKey).toInt
          val c = mode match {
            case "truncate" => substring(col(f.name), 1, n)
            case "error" =>
              when(length(col(f.name)) > n, raise_error(concat(
                lit(s"value exceeds String($n) for field '${f.name}': "), col(f.name))))
                .otherwise(col(f.name))
            case other =>
              throw new IllegalArgumentException(s"unknown varcharMode '$other'")
          }
          c.as(f.name, f.metadata)
        } else col(f.name)
      }
      df.select(cols.toSeq: _*)
    }
  }

  /** S4 `get_cursor` readback: scan what was just written. Schema is
    * self-describing for parquet; pass one for csv/json (schema-on-read
    * formats infer strings otherwise). */
  def readBack(spark: SparkSession, dir: String, name: String,
               format: String = "parquet",
               schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val r = spark.read.format(format)
    val r2 = schema.map(r.schema).getOrElse(r)
    (if (format == "csv") r2.option("header", "true") else r2)
      .load(s"$dir/$name.$format")
  }

  /** S9 `pandas_to_features`: write the attribute df to scratch, equi-join it
    * to the feature table, materialize the joined result, read it back. The
    * reference's scratch-gdb + AddIndex + AddJoin + CopyFeatures pipeline
    * (`arc_utils.py:923-953`) collapses to one Catalyst plan whose exchange
    * replaces the scratch round-trip; the through-scratch write is kept so
    * the on-disk artifact exists like the reference's (and so the join input
    * is the *written* table — write-side coercions included). */
  def joinMaterialize(spark: SparkSession,
                      attrs: DataFrame, features: DataFrame,
                      attrKey: String, featureKey: String,
                      keepCommon: Boolean,
                      scratchDir: String, outName: String): DataFrame = {
    writeTable(attrs, scratchDir, s"__build_$outName")
    val build = readBack(spark, scratchDir, s"__build_$outName")
    val joined = Joins.joinToFeatures(features, build, featureKey, attrKey,
      if (keepCommon) Joins.KeepCommon else Joins.KeepAll)
    Sinks.microsBound(joined).write.mode(SaveMode.Overwrite).parquet(s"$scratchDir/$outName.parquet")
    readBack(spark, scratchDir, outName)
  }

  // ---- versioned snapshot sink (atomic publish + time travel) -------------

  /** Versioned snapshot writes — the minimal atomic-publish / time-travel
    * protocol a 100 TB training-data pipeline needs when a full table
    * format (Iceberg/Delta) isn't in play. Every call lands a COMPLETE new
    * version under `<table>/v=N/` (a plain parquet folder, written with
    * full upstream parallelism), then commits by swapping the one-line
    * `_latest` pointer file via write-temp + atomic rename
    * (`FileContext.rename(OVERWRITE)` — atomic on HDFS; on S3-like stores
    * substitute a conditional PUT). Consequences:
    *  - a writer crash before the pointer swap leaves `_latest` on the
    *    previous complete version — readers NEVER see partial data; the
    *    orphaned folder is skipped (its number is not reused: the next
    *    write takes max(existing)+1) until a janitor prunes it;
    *  - published folders are immutable, so concurrent readers of any
    *    versions never conflict and a training run can pin the exact
    *    snapshot it consumed (reproducibility);
    *  - time travel = reading an explicit older version.
    * Returns the committed version number. */
  def writeSnapshot(df: DataFrame, tableDir: String): Int =
    writeSnapshot(df, tableDir, commitTsMicros = None)

  /** [[writeSnapshot]] with an INJECTED commit timestamp (micros since
    * epoch) — `None` records wall-clock. Injection exists so deterministic
    * pipelines (and the repo's own oracle faces) can pin `TIMESTAMP AS OF`
    * resolution without reading the system clock. */
  def writeSnapshot(df: DataFrame, tableDir: String,
                    commitTsMicros: Option[Long]): Int = {
    val next = snapshotVersions(df.sparkSession, tableDir).lastOption.getOrElse(0) + 1
    microsBound(df).write.mode(SaveMode.Overwrite).parquet(s"$tableDir/v=$next")
    carryManifest(df.sparkSession, tableDir, next)
    commitPointer(df.sparkSession, tableDir, next, commitTsMicros)
    next
  }

  /** The atomic commit primitive every snapshot writer shares: record the
    * commit timestamp (`_commits/v=N`, the `TIMESTAMP AS OF` resolution
    * metadata), then write the pointer to a temp file and ONE
    * `FileContext.rename(OVERWRITE)` — atomic on HDFS; substitute a
    * conditional PUT on object stores. The timestamp record lands BEFORE
    * the swap so a commit is never visible without its time; the converse
    * window (crash between record and swap) leaves a timestamped orphan,
    * which stays invisible because resolution only considers versions at
    * or below the committed pointer. */
  private def commitPointer(spark: SparkSession, tableDir: String,
                            version: Int,
                            tsMicros: Option[Long] = None): Unit = {
    writeCommitRecord(spark, tableDir, version, tsMicros)
    swapPointer(spark, tableDir, version)
  }

  /** [[commitPointer]] for the partitioned-snapshot module
    * ([[graft.sources.PartitionedSnapshot]]) — the shared atomic commit
    * primitive, exposed package-wide rather than duplicated. */
  private[graft] def commitSnapshotPointer(spark: SparkSession,
                                           tableDir: String,
                                           version: Int,
                                           tsMicros: Option[Long] = None): Unit =
    commitPointer(spark, tableDir, version, tsMicros)

  /** The `_commits/v=N` timestamp record, CREATE-IF-ABSENT: a
    * [[writeSnapshotAs]] REPLAY (crash recovery) re-commits an
    * already-committed version; overwriting its record would move the
    * wall-clock a prior TIMESTAMP AS OF resolved against. */
  private def writeCommitRecord(spark: SparkSession, tableDir: String,
                                version: Int, tsMicros: Option[Long]): Unit = {
    val ts = tsMicros.getOrElse(System.currentTimeMillis() * 1000L)
    val cp = new org.apache.hadoop.fs.Path(s"$tableDir/_commits/v=$version")
    val cfs = cp.getFileSystem(spark.sessionState.newHadoopConf())
    if (!cfs.exists(cp)) {
      // exists-then-create is not atomic: a replay racing the repair loop
      // can pass the exists check twice — the loser's "already exists" IS
      // the success outcome (the record is present), never a throw out of
      // an idempotent commit
      try {
        val out0 = cfs.create(cp, false)
        try out0.write(ts.toString.getBytes("UTF-8")) finally out0.close()
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => ()
        case _: java.nio.file.FileAlreadyExistsException => ()
        case _: java.io.IOException if cfs.exists(cp) => ()
      }
    }
  }

  /** Same-JVM swap serialization: `FileContext.rename(OVERWRITE)` is
    * namenode-atomic on HDFS, but the LOCAL filesystem implements overwrite
    * as check-delete-rename — two in-process writers can interleave and one
    * throws. One process-wide lock removes the local race (Spark local mode,
    * the spec's thread race); cross-process local-FS writers remain
    * best-effort, which the repair loop's retry absorbs. */
  private val PointerSwapLock = new Object

  /** Atomic pointer swap: temp write + ONE `FileContext.rename(OVERWRITE)`
    * (atomic on HDFS; substitute a conditional PUT on object stores). */
  private def swapPointer(spark: SparkSession, tableDir: String,
                          version: Int): Unit = PointerSwapLock.synchronized {
    import org.apache.hadoop.fs.{FileContext, Options, Path}
    val fc = FileContext.getFileContext(new Path(tableDir).toUri,
      spark.sessionState.newHadoopConf())
    // tmp name is unique PER ATTEMPT: two repair loops converging on the
    // same target must not share a tmp file (the loser's rename would find
    // its source already consumed)
    val tmp = new Path(tableDir,
      s"_latest.tmp.$version.${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fc.create(tmp,
      java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
        org.apache.hadoop.fs.CreateFlag.OVERWRITE))
    out.write(version.toString.getBytes("UTF-8")); out.close()
    fc.rename(tmp, new Path(tableDir, "_latest"), Options.Rename.OVERWRITE)
  }

  /** Commit timestamps (micros) per version from the `_commits/` records,
    * restricted to versions AT OR BELOW the committed pointer (a
    * timestamped orphan — writer crashed between record and swap — must
    * not resolve). Tables published before timestamp records exist return
    * an empty map. */
  def snapshotCommitTimes(spark: SparkSession, tableDir: String): Map[Int, Long] = {
    val committed = snapshotCommitted(spark, tableDir).getOrElse(return Map.empty)
    val dir = new org.apache.hadoop.fs.Path(s"$tableDir/_commits")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dir)) return Map.empty
    fs.listStatus(dir).toSeq
      .map(_.getPath)
      .collect { case p if p.getName.startsWith("v=") &&
          p.getName.drop(2).forall(_.isDigit) && p.getName.drop(2).nonEmpty =>
        val v = p.getName.drop(2).toInt
        val in = fs.open(p)
        val ts = try new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim.toLong
        finally in.close()
        v -> ts
      }
      .filter(_._1 <= committed)
      .toMap
  }

  /** `TIMESTAMP AS OF` resolution: the newest committed version whose
    * commit time is ≤ `tsMicros`. Guided errors for pre-history timestamps
    * and for tables without commit records (pin by version there). */
  def snapshotVersionAt(spark: SparkSession, tableDir: String,
                        tsMicros: Long): Int = {
    val times = snapshotCommitTimes(spark, tableDir)
    if (times.isEmpty)
      throw new IllegalArgumentException(
        s"$tableDir has no commit-timestamp records (published before they existed, " +
          "or never committed); pin by VERSION AS OF <n> instead")
    val at = times.filter(_._2 <= tsMicros)
    if (at.isEmpty)
      throw new IllegalArgumentException(
        s"timestamp ${tsMicros}us predates the first commit of $tableDir " +
          s"(earliest ${times.values.min}us); no snapshot existed then")
    at.keys.max
  }

  /** OPTIMIZE for the snapshot sink: rewrite the committed version's ROWS
    * unchanged through [[writeCompacted]] (file count sized from the data)
    * into a NEW version and commit it — readers mid-compaction keep the
    * old version, the swap is the usual atomic pointer move, and the
    * small-files debt of many incremental publishes is paid without a
    * write outage. Returns the committed compacted version.
    *
    * Single-writer maintenance API: allocation reads claims too (never
    * lands on a concurrent/crashed writer's claimed number) but the
    * commit is a plain pointer swap — don't run it concurrently with
    * live writers on one table; the auto-compaction the thin publishers
    * trigger goes through the claim-fenced [[autoCompactCas]] instead. */
  def compactSnapshot(spark: SparkSession, tableDir: String,
                      targetRows: Long): Int = {
    require(graft.sources.PartitionedSnapshot.partSpec(spark, tableDir).isEmpty,
      s"$tableDir is a PARTITIONED snapshot — a flat compaction would " +
        "destroy its layout; use PartitionedSnapshot.compactTable " +
        "(SQL snapshot_compact routes there)")
    val cur = readSnapshot(spark, tableDir)
    val base = snapshotCommitted(spark, tableDir).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $tableDir"))
    val next = (snapshotVersions(spark, tableDir) ++
      claimedVersions(spark, tableDir)).foldLeft(base)(math.max) + 1
    stageCompactedVersion(spark, tableDir, cur, next, base, targetRows)
    carryManifest(spark, tableDir, next)
    commitPointer(spark, tableDir, next)
    next
  }

  /** [[compactSnapshot]] safe BESIDE live CAS writers — the variant the
    * SQL `snapshot_compact` face uses, since a SQL user cannot audit what
    * else is committing to the table. Optimistic: bind the committed
    * base, claim the next version, and require the claim to be the
    * IMMEDIATE successor — an intervening claim means another writer got
    * between the base read and the claim, so release and re-bind against
    * the new head (the rows to compact have changed). Converges in one
    * pass on an idle table; bounded retries under contention, then
    * `ConcurrentModificationException` (compaction is maintenance — a
    * busy table defers, it never overwrites a concurrent commit the way
    * the last-writer-wins [[compactSnapshot]] swap could). */
  def compactSnapshotCas(spark: SparkSession, tableDir: String,
                         targetRows: Long, maxRetries: Int = 5): Int = {
    require(graft.sources.PartitionedSnapshot.partSpec(spark, tableDir).isEmpty,
      s"$tableDir is a PARTITIONED snapshot — a flat compaction would " +
        "destroy its layout; use PartitionedSnapshot.compactTable " +
        "(SQL snapshot_compact routes there)")
    var attempt = 0
    while (attempt < maxRetries) {
      val base = snapshotCommitted(spark, tableDir).getOrElse(
        throw new IllegalStateException(s"no committed snapshot at $tableDir"))
      val v = claimNextVersion(spark, tableDir)
      if (v == base + 1) {
        try {
          stageCompactedVersion(spark, tableDir,
            compactionRows(spark, tableDir, base), v, base, targetRows)
          carryManifest(spark, tableDir, v)
          commitPointerCas(spark, tableDir, v, tsMicros = None)
        } catch { case scala.util.control.NonFatal(e) =>
          releaseClaimIfUnpublished(spark, tableDir, v); throw e }
        return v
      }
      releaseClaim(spark, tableDir, v)
      attempt += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"snapshot_compact at $tableDir: lost the claim race $maxRetries " +
        "times to concurrent writers; retry when the table quiesces")
  }

  /** The rows a compaction of committed `base` must materialize: resolved
    * with HEAD rename semantics and conformed to the SERVED schema. A
    * PINNED read (the pre-r17 shape) kept pre-rename physical names and
    * pre-drop tombstone bytes — and the compacted folder, committed AFTER
    * every recorded rename, serves with an empty replay window, so renamed
    * columns would silently null-fill at the head and a re-ADD of a
    * dropped name would RESURRECT the retired bytes (the metadata-only
    * DROP relies on compaction retiring them physically). `base` is the
    * committed head when the CAS claim fences (v == base + 1), so head
    * semantics OF base is exactly the unpinned read, race-free. */
  private def compactionRows(spark: SparkSession, tableDir: String,
                             base: Int): DataFrame = {
    val raw = readSnapshotServed(spark, tableDir, base)
    servedSnapshotSchema(spark, tableDir)
      .map(graft.sources.SchemaEvolution.conform(raw, _)).getOrElse(raw)
  }

  /** Write a compacted version ATOMICALLY: [[writeCompacted]] output plus
    * its `_compaction` provenance stamp land in a staging dir and appear
    * as `v=N` in ONE rename — the marker is visible from the folder's
    * first observable instant, preserving [[cachedMarker]]'s invariant
    * (markers appear atomically with their folder; a probe of a
    * half-written folder could otherwise permanently negative-cache the
    * `compact` kind). A crash mid-stage leaves `.compact_staging_*`
    * debris for [[vacuumOrphans]]' age-out, never a visible folder. */
  private def stageCompactedVersion(spark: SparkSession, tableDir: String,
                                    rows: DataFrame, v: Int, base: Int,
                                    targetRows: Long): Unit = {
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val staged = new org.apache.hadoop.fs.Path(tableDir,
      s".compact_staging_${java.util.UUID.randomUUID().toString.take(8)}")
    try {
      writeCompacted(rows, staged.toString, targetRows): Unit
      val mp = new org.apache.hadoop.fs.Path(staged, "_compaction")
      val out = mp.getFileSystem(spark.sessionState.newHadoopConf()).create(mp, false)
      try out.write(base.toString.getBytes("UTF-8")) finally out.close()
      val dest = new org.apache.hadoop.fs.Path(tableDir, s"v=$v")
      if (!fs.rename(staged, dest))
        throw new IllegalStateException(
          s"compaction publish: rename $staged -> $dest failed")
    } finally if (fs.exists(staged)) fs.delete(staged, true): Unit
  }

  /** The version this compacted version materialized, if `v` was written
    * by a compaction (None for genuine rewrites — INSERT OVERWRITE — and
    * for pre-marker history). */
  def compactionBase(spark: SparkSession, tableDir: String,
                     v: Int): Option[Int] =
    cachedMarker[Int](spark, tableDir, v, "compact") {
      val p = new org.apache.hadoop.fs.Path(s"$tableDir/v=$v/_compaction")
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val txt = try new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim
        finally in.close()
        txt.toIntOption
      }
    }

  /** [[writeSnapshot]] at a CALLER-CHOSEN version — the exactly-once hook
    * for streaming publishes: derive `version` deterministically from the
    * micro-batch id and a replayed batch (restart after a crash anywhere
    * between sink write and checkpoint commit) rewrites the SAME immutable
    * folder and re-swaps the pointer to the SAME value — idempotent by
    * construction, no side ledger. The pointer only ever moves forward
    * (a replay of an old batch can't demote a newer commit).
    *
    * Concurrency contract: the forward-only guarantee is a read-check-rename,
    * NOT a compare-and-swap (HDFS rename can't express one), so it holds
    * under SERIALIZED writers — exactly the streaming-sink model this hook
    * exists for, where a replay is a re-execution of the same (single)
    * writer, never concurrent with a newer batch. Genuinely concurrent
    * independent writers need [[writeSnapshotConcurrent]], whose claim
    * files serialize version allocation and whose repair loop converges
    * the pointer. */
  def writeSnapshotAs(df: DataFrame, tableDir: String, version: Int): Int = {
    microsBound(df).write.mode(SaveMode.Overwrite).parquet(s"$tableDir/v=$version")
    // a REPLAY rewrote the version's data files under new names, so any
    // manifest from the previous attempt enumerates files that no longer
    // exist — drop it first, then carry fresh (stale skipping would be
    // wrong; a missing manifest merely serves unpruned)
    val mp = new org.apache.hadoop.fs.Path(s"$tableDir/_manifest/v=$version")
    val mfs = mp.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
    if (mfs.exists(mp)) mfs.delete(mp, true): Unit
    carryManifest(df.sparkSession, tableDir, version)
    if (snapshotCommitted(df.sparkSession, tableDir).forall(_ < version))
      commitPointer(df.sparkSession, tableDir, version)
    version
  }

  // ---- optimistic multi-writer commits -------------------------------------

  /** Versions already CLAIMED by some writer (data may not exist yet). */
  private def claimedVersions(spark: SparkSession, tableDir: String): Seq[Int] = {
    val dir = new org.apache.hadoop.fs.Path(s"$tableDir/_claims")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case s if s.startsWith("v=") &&
        s.drop(2).nonEmpty && s.drop(2).forall(_.isDigit) => s.drop(2).toInt }
  }

  /** Atomic EXCLUSIVE claim of a version number — the compare-and-swap
    * that makes concurrent writers safe. The primitive is create-if-absent
    * where absence is checked by the STORE, not the client: O_CREAT|O_EXCL
    * via NIO on local filesystems (kernel-atomic; Hadoop's
    * RawLocalFileSystem create is check-then-create and can race), the
    * namenode-atomic `create(overwrite=false)` on HDFS, a conditional PUT
    * on object stores. Returns false — claim lost — when the file already
    * exists. */
  private def claimVersion(spark: SparkSession, tableDir: String,
                           version: Int): Boolean = {
    val dir = new org.apache.hadoop.fs.Path(s"$tableDir/_claims")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(dir): Unit
    val p = new org.apache.hadoop.fs.Path(dir, s"v=$version")
    val scheme = fs.getUri.getScheme
    if (scheme == null || scheme == "file") {
      try {
        java.nio.file.Files.createFile(
          java.nio.file.Paths.get(p.toUri.getPath)): Unit
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else {
      try { fs.create(p, false).close(); true }
      catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException => false }
    }
  }

  /** Every version with a commit RECORD, pointer-independent (unlike
    * [[snapshotCommitTimes]], which is the read-side view). */
  private def recordedCommits(spark: SparkSession, tableDir: String): Seq[Int] = {
    val dir = new org.apache.hadoop.fs.Path(s"$tableDir/_commits")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case s if s.startsWith("v=") &&
        s.drop(2).nonEmpty && s.drop(2).forall(_.isDigit) => s.drop(2).toInt }
  }

  /** [[writeSnapshot]] for GENUINELY CONCURRENT independent writers —
    * optimistic concurrency in two moves:
    *
    *  1. ALLOCATION is a compare-and-swap loop: compute
    *     next = max(folders, claims, pointer) + 1 and try to claim it via
    *     [[claimVersion]]'s atomic exclusive create. A lost race means
    *     another writer owns that number — its claim file is now visible,
    *     so the retry allocates past it. Claimed versions are exclusively
    *     owned: no two writers ever write the same `v=N` folder, and the
    *     committed sequence stays contiguous.
    *  2. COMMIT is a REPAIR LOOP, not a blind swap: record `_commits/v=N`
    *     (create-if-absent, after the data lands), then loop —
    *     read the pointer, target = max(recorded commits), swap to the
    *     target if the pointer is behind, re-check. The rename is
    *     last-writer-wins, so a slower writer can transiently demote the
    *     pointer; the re-check sees the regression (the newer writer's
    *     record is durable) and repairs it. Every writer exits only when
    *     pointer ≥ max(recorded), so the pointer CONVERGES to the newest
    *     recorded commit no matter the interleaving.
    *
    * Consequences: a writer that crashes between record and swap leaves a
    * complete, recorded version that the NEXT successful commit promotes
    * (its data landed before its record — readers never see partial data);
    * a crash before the record leaves an unrecorded orphan folder that
    * never resolves, exactly like [[writeSnapshot]]. Don't mix this with
    * single-writer [[writeSnapshot]] on one table: the single-writer path
    * neither claims nor repairs.
    *
    * Scale note: the claim/commit files are empty markers — per commit this
    * is O(1) tiny-file round-trips against the store, amortized over a
    * full-parallelism snapshot write; the loop retries only under actual
    * contention on the SAME table. */
  def writeSnapshotConcurrent(df: DataFrame, tableDir: String,
                              commitTsMicros: Option[Long] = None): Int = {
    val spark = df.sparkSession
    val v = claimNextVersion(spark, tableDir)
    try {
      microsBound(df).write.mode(SaveMode.Overwrite).parquet(s"$tableDir/v=$v")
      carryManifest(spark, tableDir, v)
      commitPointerCas(spark, tableDir, v, commitTsMicros)
    } catch { case scala.util.control.NonFatal(e) =>
      releaseClaimIfUnpublished(spark, tableDir, v); throw e }
    v
  }

  /** Publish an ALREADY-STAGED data folder as the next snapshot version —
    * the commit half of [[writeSnapshotConcurrent]] for callers that stage
    * rows first (the snapshot catalog's SQL DML lands its copy-on-write
    * output in a staging dir, then publishes): claim the next version
    * (same CAS), ONE same-filesystem rename of the staged folder into
    * `v=N`, then the repair-loop pointer commit. A crash after the rename
    * but before the record leaves an unrecorded orphan that never
    * resolves — identical to a [[writeSnapshot]] crash. */
  def publishStagedSnapshot(spark: SparkSession, tableDir: String,
                            staged: org.apache.hadoop.fs.Path,
                            tsMicros: Option[Long] = None): Int = {
    val v = claimNextVersion(spark, tableDir)
    try {
      val dest = new org.apache.hadoop.fs.Path(tableDir, s"v=$v")
      val f = dest.getFileSystem(spark.sessionState.newHadoopConf())
      if (!f.rename(staged, dest))
        throw new IllegalStateException(s"publish: rename $staged -> $dest failed")
      carryManifest(spark, tableDir, v)
      commitPointerCas(spark, tableDir, v, tsMicros)
    } catch { case scala.util.control.NonFatal(e) =>
      releaseClaimIfUnpublished(spark, tableDir, v); throw e }
    v
  }

  /** [[publishStagedSnapshot]] with a COMPLETE lost-update fence for
    * writers whose staged output DERIVES from a specific base version
    * (thin merge-on-read deltas, copy-on-write DML): claim the next
    * version, then require the claim to be the IMMEDIATE successor of
    * `expectedBase`. Claims serialize allocation (atomic exclusive
    * create), so `v == expectedBase + 1` proves no other writer even
    * CLAIMED — let alone committed — since the caller bound its base;
    * any intervening claim forces `v > expectedBase + 1` and the publish
    * aborts (claim released, staging deleted,
    * `ConcurrentModificationException`) instead of silently chaining past
    * the other writer's changes. This closes the window a committed-
    * pointer re-read leaves open (two writers can both pass a pointer
    * check before either swaps; they cannot both claim `base + 1`).
    *
    * Liveness trade: a CRASHED claimed writer holds `base + 1` and fails
    * every fenced publish until [[vacuumOrphans]] ages its claim out —
    * the standard optimistic-concurrency deadline, not a correctness
    * hole. */
  def publishStagedSnapshotFenced(spark: SparkSession, tableDir: String,
                                  staged: org.apache.hadoop.fs.Path,
                                  expectedBase: Int,
                                  tsMicros: Option[Long] = None): Int = {
    val v = claimNextVersion(spark, tableDir)
    val f = staged.getFileSystem(spark.sessionState.newHadoopConf())
    if (v != expectedBase + 1) {
      // release OUR claim (exclusively owned — nobody else can hold it)
      // so retries after the conflicting writer commits can re-fence
      f.delete(new org.apache.hadoop.fs.Path(s"$tableDir/_claims/v=$v"), false)
      f.delete(staged, true)
      throw new java.util.ConcurrentModificationException(
        s"fenced publish at $tableDir: staged output derives from " +
          s"v=$expectedBase but the claim landed at v=$v — another writer " +
          "claimed in between; re-read and retry")
    }
    try {
      val dest = new org.apache.hadoop.fs.Path(tableDir, s"v=$v")
      if (!f.rename(staged, dest))
        throw new IllegalStateException(s"publish: rename $staged -> $dest failed")
      carryManifest(spark, tableDir, v)
      commitPointerCas(spark, tableDir, v, tsMicros)
    } catch { case scala.util.control.NonFatal(e) =>
      releaseClaimIfUnpublished(spark, tableDir, v); throw e }
    v
  }

  /** MANIFEST CONTINUITY: a DML/overwrite/compaction on a manifest-bearing
    * table must not silently lose the planning index — at 100 TB the
    * manifest IS the difference between a one-file planning read and a
    * full footer sweep, and one UPDATE dropping it would be invisible
    * until the latency regression. Called with the new version's data in
    * place but BEFORE the pointer commit (readers never observe a
    * manifest-less window, and a partial manifest of an uncommitted
    * version can never mis-skip — uncommitted versions never resolve).
    * Carries the stats columns of the newest older manifest-bearing
    * version, restricted to columns the new schema still has; THIN and
    * BUCKETED versions are skipped (they serve through the resolver /
    * bucketed scan, not the manifest path). NON-FATAL: the manifest is an
    * optimization — a failure must not fail a statement whose data is
    * already correct. */
  private def carryManifest(spark: SparkSession, tableDir: String,
                            v: Int): Unit =
    try {
      // manifest-less tables short-circuit on ONE listing — never an
      // O(#versions) probe walk per commit
      val mroot = new org.apache.hadoop.fs.Path(s"$tableDir/_manifest")
      val fs = mroot.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(mroot)) return
      if (graft.sources.ManifestPrune.exists(spark, tableDir, v)) return
      if (thinBase(spark, tableDir, v).isDefined ||
          bucketedLayout(spark, tableDir, v).isDefined) return
      val prev = snapshotVersions(spark, tableDir).filter(_ < v).reverse
        .find(p => graft.sources.ManifestPrune.exists(spark, tableDir, p))
        .getOrElse(return)
      val statsCols = graft.sources.FooterSchema
        .require(spark, graft.sources.ManifestPrune.manifestDir(tableDir, prev))
        .fieldNames.filter(_.startsWith("min_")).map(_.drop(4)).toSeq
      // schema inference reads footers, not data — the whole carry stays
      // metadata-only (the r14 wart was a FULL data re-read of the version
      // just published, a 2× write-path I/O tax at 100 TB; the footers
      // already hold the same min/max, plus null counts the agg never had)
      val writtenSchema = graft.sources.FooterSchema.require(spark, s"$tableDir/v=$v")
      val cols = statsCols.filter(writtenSchema.fieldNames.contains)
      if (cols.isEmpty) return
      // temp dir + ONE rename: a manifest must appear COMPLETE or not at
      // all — ManifestPrune trusts it to enumerate every file, so a
      // half-written directory would silently skip rows (and an empty one
      // would fail every read on schema inference)
      val tmp = new org.apache.hadoop.fs.Path(mroot,
        s".carry_v${v}_${java.util.UUID.randomUUID().toString.take(8)}")
      try {
        graft.sources.FooterStats
          .manifestFrame(spark, s"$tableDir/v=$v", writtenSchema, cols)
          .coalesce(1)
          .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        val dest = new org.apache.hadoop.fs.Path(mroot, s"v=$v")
        if (!fs.exists(dest) && !fs.rename(tmp, dest))
          throw new IllegalStateException(s"manifest carry: rename to $dest failed")
      } finally if (fs.exists(tmp)) fs.delete(tmp, true): Unit
    } catch {
      case scala.util.control.NonFatal(e) =>
        // belt and braces: never leave a PARTIAL manifest behind — a
        // missing manifest degrades to unpruned planning, a broken one
        // breaks every read
        try {
          val p = new org.apache.hadoop.fs.Path(s"$tableDir/_manifest/v=$v")
          val f = p.getFileSystem(spark.sessionState.newHadoopConf())
          if (f.exists(p)) f.delete(p, true): Unit
        } catch { case scala.util.control.NonFatal(_) => () }
        org.slf4j.LoggerFactory.getLogger(Sinks.getClass).warn(
          s"manifest carry for $tableDir v=$v failed; the version commits " +
            "without a manifest (unpruned planning) — rewrite it with " +
            "writeSnapshotWithManifest to restore file skipping", e)
    }

  /** Delete OUR claim file — claims are exclusively owned, so the holder
    * may release unconditionally. */
  private def releaseClaim(spark: SparkSession, tableDir: String,
                           v: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$tableDir/_claims/v=$v")
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, false): Unit
  }

  /** Failure-path claim release for every post-claim publish body: a
    * claim whose publish never LANDED (no commit record) must not outlive
    * the failure — a leaked claim at `base+1` makes every later fenced
    * publish forfeit with `ConcurrentModificationException` until a
    * janitor runs, silently wedging the table (the triggering error is
    * often swallowed by a non-fatal wrapper). Releasing is always safe
    * here: allocation maxes over FOLDERS too, so a partially-written
    * `v=N` folder still blocks number reuse until [[vacuumOrphans]]
    * retires both together; a RECORDED commit keeps its claim (the repair
    * loop will promote it — that publish did land). Never throws — this
    * runs inside failure paths that must surface the original error. */
  private def releaseClaimIfUnpublished(spark: SparkSession, tableDir: String,
                                        v: Int): Unit =
    try {
      if (!recordedCommits(spark, tableDir).contains(v))
        releaseClaim(spark, tableDir, v)
    } catch { case scala.util.control.NonFatal(_) => () }

  /** The claim-CAS primitives, exposed package-wide for the
    * partitioned-snapshot module ([[graft.sources.PartitionedSnapshot]]):
    * the SAME protocol every concurrent flat-store publisher uses —
    * atomic exclusive claim allocation, repair-loop pointer commit,
    * failure-path claim release — rather than a duplicate. */
  private[graft] def claimSnapshotVersion(spark: SparkSession,
                                          tableDir: String): Int =
    claimNextVersion(spark, tableDir)
  private[graft] def releaseSnapshotClaim(spark: SparkSession,
                                          tableDir: String, v: Int): Unit =
    releaseClaim(spark, tableDir, v)
  private[graft] def releaseSnapshotClaimIfUnpublished(
      spark: SparkSession, tableDir: String, v: Int): Unit =
    releaseClaimIfUnpublished(spark, tableDir, v)
  private[graft] def commitSnapshotPointerCas(
      spark: SparkSession, tableDir: String, version: Int,
      tsMicros: Option[Long] = None): Unit =
    commitPointerCas(spark, tableDir, version, tsMicros)

  /** [[snapshotCommitted]] hardened for concurrent-writer windows: the
    * LOCAL checksum filesystem renames the pointer and its .crc sidecar as
    * two moves, so a read racing a swap can throw ChecksumException —
    * share the swap lock (serializes in-JVM) and retry a torn
    * cross-process read, the same discipline as [[commitPointerCas]]'s
    * pointer read. */
  private[graft] def snapshotCommittedStable(spark: SparkSession,
                                             tableDir: String): Option[Int] = {
    var attempt = 0
    while (true) {
      PointerSwapLock.synchronized {
        // retry ONLY the torn-read shapes the cross-process swap race can
        // produce (crc/data renamed as two moves on the local checksum FS:
        // ChecksumException; a half-visible file: EOF; the exists→open
        // window of a rename swap: FileNotFound). A persistent unrelated
        // failure (permissions, connectivity) surfaces on the first throw
        // instead of spinning 100 hot iterations under the JVM-wide swap
        // lock (ADVICE r18).
        try return snapshotCommitted(spark, tableDir)
        catch {
          case e @ (_: org.apache.hadoop.fs.ChecksumException |
                    _: java.io.EOFException |
                    _: java.io.FileNotFoundException) =>
            if (attempt >= 100) throw e
        }
      }
      attempt += 1
      // tiny backoff OUTSIDE the lock: let the racing swap's second move
      // land instead of re-reading the torn window back-to-back
      Thread.sleep(math.min(2L * attempt, 50L))
    }
    None // unreachable
  }

  /** The CAS allocation loop (move 1), shared by both concurrent
    * publishers: max over folders, claims and the pointer, then try to
    * claim — a lost race re-reads past the winner's now-visible claim. */
  private def claimNextVersion(spark: SparkSession, tableDir: String): Int = {
    var v = 0
    while (v == 0) {
      val next = (snapshotVersions(spark, tableDir) ++
        claimedVersions(spark, tableDir) ++
        snapshotCommitted(spark, tableDir).toSeq).foldLeft(0)(math.max) + 1
      if (claimVersion(spark, tableDir, next)) v = next
    }
    v
  }

  /** The repair-loop commit of [[writeSnapshotConcurrent]] (move 2). */
  private def commitPointerCas(spark: SparkSession, tableDir: String,
                               version: Int, tsMicros: Option[Long]): Unit = {
    writeCommitRecord(spark, tableDir, version, tsMicros)
    var done = false
    while (!done) {
      // the pointer READ shares the swap lock: on the local checksum
      // filesystem a concurrent swap renames the data file and its .crc
      // sidecar as TWO moves, and an unserialized read in that window
      // throws ChecksumException (HDFS renames atomically — the lock only
      // matters in-JVM). A torn read from a cross-process writer still
      // surfaces as an exception → treated as "behind, retry".
      val cur = PointerSwapLock.synchronized {
        try snapshotCommitted(spark, tableDir).getOrElse(0)
        catch { case scala.util.control.NonFatal(_) => -1 }
      }
      val target = recordedCommits(spark, tableDir).foldLeft(version)(math.max)
      if (cur >= target) done = true
      else
        // a concurrent swap can make this attempt fail (local-FS rename is
        // not atomic cross-process); the loop's re-check IS the retry —
        // convergence only needs SOME writer's swap to land
        try swapPointer(spark, tableDir, target)
        catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  /** Version folders present on disk (committed or orphaned), ascending.
    * Folder presence drives version-number allocation; ONLY the `_latest`
    * pointer decides what an unpinned read serves. */
  def snapshotVersions(spark: SparkSession, tableDir: String): Seq[Int] = {
    val p = new org.apache.hadoop.fs.Path(tableDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("v=") &&
        s.drop(2).nonEmpty && s.drop(2).forall(_.isDigit) => s.drop(2).toInt }
      .sorted
  }

  /** The version `_latest` points at; None before the first commit. */
  def snapshotCommitted(spark: SparkSession, tableDir: String): Option[Int] = {
    val p = new org.apache.hadoop.fs.Path(tableDir, "_latest")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        "UTF-8").trim.toInt)
      finally in.close()
    }
  }

  /** Read the committed snapshot, or an explicit pinned `version` (time
    * travel). Unpinned reads NEVER trust folder listings — only the
    * atomically-swapped pointer — so a concurrent or crashed writer is
    * invisible. An UNPINNED read of a schema-evolved table
    * ([[declareSnapshotSchema]], SQL `ALTER TABLE ADD COLUMN`) serves the
    * DECLARED schema — files written before the evolution null-fill;
    * pinned reads keep their version's own schema (history is immutable,
    * including its shape). */
  def readSnapshot(spark: SparkSession, tableDir: String,
                   version: Option[Int] = None): DataFrame = {
    // PARTITIONED snapshots resolve through their carry manifests — a
    // flat folder read of a carry-bearing version would silently miss
    // every carried partition
    if (graft.sources.PartitionedSnapshot.partSpec(spark, tableDir).isDefined)
      return graft.sources.PartitionedSnapshot.read(spark, tableDir, version)
    val v = version.orElse(snapshotCommitted(spark, tableDir)).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $tableDir"))
    if (version.isDefined) resolveVersion(spark, tableDir, v, depth = 0)
    else {
      val raw = readSnapshotServed(spark, tableDir, v)
      servedSnapshotSchema(spark, tableDir)
        .map(graft.sources.SchemaEvolution.conform(raw, _)).getOrElse(raw)
    }
  }

  /** Declare the snapshot table's EVOLVED schema (the metadata half of
    * `ALTER TABLE ADD COLUMN`): one `_schema.json` per table, no data
    * published, no version folder touched. Unpinned reads conform to it
    * (old files null-fill the added columns); pinned reads are untouched.
    * The declared schema must be a SUPERSET-by-name of what is on disk —
    * enforcement lives in the SQL face (SnapshotCatalog.alterTable), which
    * only ever appends nullable columns. */
  def declareSnapshotSchema(spark: SparkSession, tableDir: String,
                            schema: org.apache.spark.sql.types.StructType): Unit = {
    val p = new org.apache.hadoop.fs.Path(tableDir, "_schema.json")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    // complete-or-absent (temp + ONE rename): a reader racing the write,
    // or a crash mid-write, must never observe a truncated JSON — every
    // unpinned read parses this file
    val tmp = new org.apache.hadoop.fs.Path(tableDir,
      s"._schema.json.tmp.${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(schema.json.getBytes("UTF-8")) finally out.close()
    if (fs.exists(p)) fs.delete(p, false): Unit
    if (!fs.rename(tmp, p))
      throw new IllegalStateException(s"declareSnapshotSchema: rename to $p failed")
    declaredSchemaCache.remove(tableDir): Unit
  }

  /** In-JVM memo for the `_schema.json` probe: the declared schema is read
    * on EVERY unpinned read / feed-schema / DML bind, and the overwhelming
    * common case is "no declared schema at all" — paying an FS round-trip
    * per statement for a negative is the same tax the marker cache kills.
    * Invalidated by the only writer ([[declareSnapshotSchema]]); an ALTER
    * from ANOTHER process becomes visible to this JVM's long-lived session
    * on its next cache turnover or restart — the same single-writer-DDL
    * visibility contract the workspace catalog documents for RENAME. */
  private val declaredSchemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, Option[org.apache.spark.sql.types.StructType]]()

  /** The declared evolved schema, if the table has one. */
  def declaredSnapshotSchema(spark: SparkSession, tableDir: String):
      Option[org.apache.spark.sql.types.StructType] = {
    val hit = declaredSchemaCache.get(tableDir)
    if (hit != null) return hit
    val p = new org.apache.hadoop.fs.Path(tableDir, "_schema.json")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val res =
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val txt = try new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
        finally in.close()
        Some(org.apache.spark.sql.types.DataType.fromJson(txt)
          .asInstanceOf[org.apache.spark.sql.types.StructType])
      }
    if (declaredSchemaCache.size >= MarkerCacheMax) declaredSchemaCache.clear()
    declaredSchemaCache.put(tableDir, res): Unit
    res
  }

  // ---- metadata-only RENAME COLUMN (r16) -----------------------------------

  /** Field-metadata key carrying a column's rename chain inside the
    * declared schema: `"<v1>:<urlenc-from1>;<v2>:<urlenc-from2>"`, oldest
    * first — the names this field bore before each recorded rename, with
    * the committed version each rename was declared at. Living INSIDE
    * `_schema.json` means the evolved schema and its rename history land
    * in ONE atomic write — no crash window where one exists without the
    * other (a half-completed two-file ALTER would make unpinned reads
    * null-fill a whole column). */
  val RenamesKey = "graft.renames"

  private[graft] def renameChainOf(
      f: org.apache.spark.sql.types.StructField): Seq[(Int, String)] =
    if (!f.metadata.contains(RenamesKey)) Nil
    else f.metadata.getString(RenamesKey).split(';').toSeq
      .filter(_.nonEmpty).map { e =>
        val i = e.indexOf(':')
        (e.take(i).toInt, java.net.URLDecoder.decode(e.drop(i + 1), "UTF-8"))
      }

  private[graft] def appendRenameChain(
      f: org.apache.spark.sql.types.StructField, atVersion: Int,
      to: String): org.apache.spark.sql.types.StructField = {
    val entry = s"$atVersion:${java.net.URLEncoder.encode(f.name, "UTF-8")}"
    val prior =
      if (f.metadata.contains(RenamesKey)) f.metadata.getString(RenamesKey)
      else ""
    val chain = if (prior.isEmpty) entry else s"$prior;$entry"
    f.copy(name = to,
      metadata = new org.apache.spark.sql.types.MetadataBuilder()
        .withMetadata(f.metadata).putString(RenamesKey, chain).build())
  }

  /** The table's COLUMN-RENAME HISTORY: (atVersion, from, to) in global
    * chronological order, reconstructed from the declared schema's
    * per-field chains. `atVersion` is the committed version when the
    * rename was declared — reads pinned at or below it keep the old name
    * (history is immutable, including its names); the head and every
    * later version serve the new name, with files written under old
    * names resolving through a chronological conditional replay
    * ([[applyRenames]]). Metadata-only: no version folder is touched, no
    * byte reinterpreted — the replay is a plan-time column rename. */
  def snapshotRenames(spark: SparkSession,
                      tableDir: String): Seq[(Int, String, String)] =
    declaredSnapshotSchema(spark, tableDir).map { s =>
      s.fields.toSeq.flatMap { f =>
        val chain = renameChainOf(f)
        if (chain.isEmpty) Nil
        else {
          // each entry renamed its `from` into the NEXT entry's from (or
          // the field's final name)
          val tos = chain.drop(1).map(_._2) :+ f.name
          chain.zip(tos).map { case ((v, from), to) => (v, from, to) }
        }
      }.sortBy(_._1) // stable: per-field order survives same-v ties
    }.getOrElse(Nil)

  /** The renames a READ pinned at `topV` serves: only those declared
    * while the table sat at an EARLIER committed version
    * (`atVersion < topV`). A rename declared at committed C does not
    * retitle version C itself — pinned history keeps the names it
    * committed under (the Iceberg time-travel contract); the head and
    * every later version serve the new name. */
  private def renamesWindowPinned(spark: SparkSession, tableDir: String,
                                  topV: Int): Seq[(Int, String, String)] =
    snapshotRenames(spark, tableDir).filter(_._1 < topV)

  /** The renames that apply to FOLDER `v`'s frame within a resolution
    * window: exactly those declared at or after the folder's own commit
    * position (`atVersion >= v`) — a folder committed as version v was
    * written with the names current THEN, so earlier renames are already
    * baked into its physical names, and keying the replay on the folder's
    * version (not on name presence) is what disambiguates a later ADD
    * COLUMN that reuses a retired name. Chronological order preserved
    * (chained renames compose). */
  private def renamesForFolder(v: Int,
                               window: Seq[(Int, String, String)]):
      Seq[(String, String)] =
    window.filter(_._1 >= v).map(r => (r._2, r._3))

  /** Chronological replay of one folder's rename window over its frame.
    * A pure plan-time projection: zero bytes move, pruning pushes
    * through. The presence guards are a belt (a folder that somehow
    * already carries the new name is left alone). */
  private def applyRenames(df: DataFrame,
                           renames: Seq[(String, String)]): DataFrame =
    renames.foldLeft(df) { case (d, (from, to)) =>
      if (d.columns.exists(_.equalsIgnoreCase(from)) &&
          !d.columns.exists(_.equalsIgnoreCase(to)))
        d.withColumnRenamed(from, to)
      else d
    }

  /** Map one marker-recorded column name (thin keyCols, written with the
    * names current at publish time) through a folder's rename window. */
  private def renameKey(k: String, renames: Seq[(String, String)]): String =
    renames.foldLeft(k) { case (n, (from, to)) =>
      if (n.equalsIgnoreCase(from)) to else n }

  /** Does HEAD serving of version `v` require the rename replay — i.e.
    * was a rename declared at or after `v`'s commit whose old name is
    * physically present in the folder? False for folders written after
    * every rename (physical names already canonical — plain file serving
    * keeps manifest skipping and full DML). Pinned serving NEVER needs
    * the replay on its top folder (a pinned read only sees renames
    * declared before its version, which are baked into the folder's own
    * names); thin versions serve through the resolver anyway. Cost: one
    * memoized footer-schema read. */
  def renameAffected(spark: SparkSession, tableDir: String, v: Int): Boolean = {
    val rn = renamesForFolder(v, snapshotRenames(spark, tableDir))
    rn.nonEmpty && {
      val phys = readVersionDir(spark, tableDir, v, "").schema
      rn.exists { case (from, to) =>
        phys.fieldNames.exists(_.equalsIgnoreCase(from)) &&
          !phys.fieldNames.exists(_.equalsIgnoreCase(to))
      }
    }
  }

  /** The schema an UNPINNED read serves. With the rename history living
    * inside `_schema.json` (field metadata), the declared schema IS the
    * served schema — schema and history are one atomic artifact — minus
    * DROPPED-column tombstones (r17): a metadata-only DROP COLUMN records
    * the field under a reserved `__dropped_<k>` name (its rename chain is
    * what keeps old folders' bytes resolving onto the tombstone instead of
    * onto a later re-ADD of the same name); serving never projects them. */
  def servedSnapshotSchema(spark: SparkSession, tableDir: String):
      Option[org.apache.spark.sql.types.StructType] =
    declaredSnapshotSchema(spark, tableDir).map(s =>
      org.apache.spark.sql.types.StructType(s.fields.filterNot(
        _.name.startsWith(graft.sources.WorkspaceCatalog.DroppedPrefix))))

  /** Drop any resolved tombstone columns from a frame — the terminal step
    * of every read entry point (pinned AND unpinned): after the rename
    * replay, a pre-drop folder's bytes sit under the reserved
    * `__dropped_<k>` name, which no read may expose. */
  private def dropTombstones(df: DataFrame): DataFrame = {
    val t = df.columns.filter(
      _.startsWith(graft.sources.WorkspaceCatalog.DroppedPrefix))
    if (t.isEmpty) df else df.drop(t.toIndexedSeq: _*)
  }

  // ---- merge-on-read deletes (thin versions) -------------------------------

  /** Declare the snapshot table's ROW-IDENTITY columns (Iceberg's
    * "identifier fields"): once declared, the SQL catalog's DELETE takes
    * the THIN merge-on-read path — the matched rows' keys are published as
    * an O(keys) delta instead of a whole-table copy-on-write rewrite.
    * Declaring keys ASSERTS uniqueness: a thin delete removes every row
    * sharing a matched key, which equals predicate-delete exactly when the
    * key identifies one row (the same contract thin upserts already
    * enforce batch-side). Stored as a one-line `_keycols` file; idempotent
    * re-declaration overwrites. */
  def declareSnapshotKeys(spark: SparkSession, tableDir: String,
                          keyCols: Seq[String]): Unit = {
    require(keyCols.nonEmpty && keyCols.forall(!_.contains(",")),
      "key columns must be non-empty and ','-free (marker format)")
    val p = new org.apache.hadoop.fs.Path(tableDir, "_keycols")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(keyCols.mkString(",").getBytes("UTF-8")) finally out.close()
  }

  /** The declared row-identity columns, None if never declared. */
  def snapshotDeclaredKeys(spark: SparkSession,
                           tableDir: String): Option[Seq[String]] = {
    val p = new org.apache.hadoop.fs.Path(tableDir, "_keycols")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt = try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      finally in.close()
      Some(txt.trim.split(',').toSeq)
    }
  }

  /** Publish a TASK-STAGED thin delta (the `SupportsDelta` SQL DML path:
    * executors already wrote `_deletes`/`_upserts` parquet parts into
    * `staged` — the delta is written exactly once). Same contract as
    * [[deleteSnapshotKeys]]/[[upsertSnapshotRows]]: duplicate-upsert-key
    * integrity gate, `_base` marker, FENCED claim publish (abort on a
    * concurrent writer), change-data-feed landing. An empty delta (the
    * statement matched nothing) publishes NO version and returns the
    * bound base — replayed no-op statements leave history untouched. */
  private[graft] def publishThinStagedDelta(spark: SparkSession,
                                            tableDir: String,
                                            keyCols: Seq[String],
                                            expectedBase: Int,
                                            staged: org.apache.hadoop.fs.Path): Int = {
    val fs = staged.getFileSystem(spark.sessionState.newHadoopConf())
    def deltaDir(name: String): Option[String] = {
      val p = new org.apache.hadoop.fs.Path(staged, name)
      if (!fs.exists(p)) None
      else if (!fs.listStatus(p).exists(st =>
          st.isFile && st.getPath.getName.endsWith(".parquet"))) {
        // a zero-row part set: the dir must go, or the resolver would try
        // to infer a schema from an empty folder
        fs.delete(p, true): Unit
        None
      } else Some(p.toString)
    }
    val ups = deltaDir("_upserts")
    val dels = deltaDir("_deletes")
    if (ups.isEmpty && dels.isEmpty) {
      fs.delete(staged, true): Unit
      return expectedBase
    }
    ups.foreach { u =>
      val kc = keyCols.map(col)
      val dup = spark.read.parquet(u).groupBy(kc: _*)
        .count().filter(col("count") > 1)
      if (!dup.isEmpty) {
        fs.delete(staged, true): Unit
        throw new IllegalArgumentException(
          "delta carries duplicate upsert keys (first: " + dup.head().toString +
            ") — a MERGE source must be unique per key")
      }
    }
    val mp = new org.apache.hadoop.fs.Path(staged, "_base.json")
    val out = fs.create(mp, false)
    try out.write(s"$expectedBase\n${keyCols.mkString(",")}".getBytes("UTF-8"))
    finally out.close()
    val v = publishStagedSnapshotFenced(spark, tableDir, staged, expectedBase)
    if (changeFeedEnabled(spark, tableDir))
      landChangeFeedSafe(spark, tableDir, v,
        // the base resolves at names-as-of-THIS-commit (renames declared
        // at the base's own version included — the delta parts already
        // carry them), so a feed landed just after a RENAME is uniform
        changeRows(resolveVersionR(spark, tableDir, expectedBase, 0,
            renamesWindowPinned(spark, tableDir, v)), keyCols, v,
          dels.map(_ => spark.read.parquet(s"$tableDir/v=$v/_deletes")),
          ups.map(_ => spark.read.parquet(s"$tableDir/v=$v/_upserts"))))
    autoCompactIfDeep(spark, tableDir, v)
    v
  }

  // ---- change data feed -----------------------------------------------------

  /** Opt a snapshot table into a CHANGE DATA FEED: every subsequent thin
    * commit ([[deleteSnapshotKeys]]/[[upsertSnapshotRows]]) also lands ONE
    * parquet file of its change rows into the table's visible `cdf/`
    * directory — schema = base columns + `__change` ('delete'|'upsert') +
    * `__version`. Spark's own FILE STREAMING SOURCE over `cdf/` is then
    * the change stream: exactly-once via the stream's file log, atomic
    * per-commit visibility via the single-file rename, zero extra reads of
    * the table. This is the Delta/Iceberg CDF trade stated plainly: the
    * writer pays O(delta) once so every downstream incremental consumer
    * (index refresh, cache invalidation, re-embedding) avoids re-diffing
    * 100 TB. Thin commits ONLY — a materialized rewrite is a snapshot, not
    * a change set; diff those with [[snapshotDiff]]. A crash between the
    * version commit and the feed landing drops that version's feed file;
    * [[repairChangeFeed]] re-derives it from the version's own
    * `_deletes`/`_upserts` (idempotent by file name). */
  def enableChangeFeed(spark: SparkSession, tableDir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(tableDir, "_cdf_enabled")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(tableDir, "cdf")): Unit
    if (!fs.exists(p)) {
      // record the ENABLE POINT (the committed version at enable time):
      // the feed starts here — repair must never fabricate feed files for
      // older commits, which live consumers would replay OUT OF ORDER
      val out = fs.create(p, false)
      try out.write(snapshotCommitted(spark, tableDir).getOrElse(0)
        .toString.getBytes("UTF-8"))
      finally out.close()
    }
  }

  def changeFeedEnabled(spark: SparkSession, tableDir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(tableDir, "_cdf_enabled")
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** The version the feed was enabled AT — commits at or below it never
    * feed (an empty/legacy marker reads as 0: everything feeds). */
  private def changeFeedSince(spark: SparkSession, tableDir: String): Int = {
    val p = new org.apache.hadoop.fs.Path(tableDir, "_cdf_enabled")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return Int.MaxValue
    val in = fs.open(p)
    val txt = try new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim
    finally in.close()
    txt.toIntOption.getOrElse(0)
  }

  /** The feed's read schema for a table (base columns + change metadata) —
    * what a `readStream.schema(...)` consumer passes. */
  def changeFeedSchema(spark: SparkSession, tableDir: String):
      org.apache.spark.sql.types.StructType = {
    // UNPINNED read: an evolved table's feed carries the declared schema
    val base = readSnapshot(spark, tableDir).schema
    base.add("__change", org.apache.spark.sql.types.StringType)
      .add("__version", org.apache.spark.sql.types.IntegerType)
  }

  /** Change rows of one thin commit, in base column order — extended by
    * any columns the upserts ADDED (post-ALTER writes), which delete rows
    * null-fill. */
  private def changeRows(rawBaseDf: DataFrame, keyCols: Seq[String], v: Int,
                         deletes: Option[DataFrame],
                         upserts: Option[DataFrame]): DataFrame = {
    // never land DROPPED-column tombstone bytes into new feed files — the
    // drop is usually a compliance action, and the feed is a fresh write
    val baseDf = dropTombstones(rawBaseDf)
    val extra = upserts.toSeq.flatMap(_.schema.fields).filterNot(f =>
      baseDf.columns.exists(_.equalsIgnoreCase(f.name)))
    val cols = baseDf.columns.toSeq ++ extra.map(_.name)
    def typeOf(c: String): org.apache.spark.sql.types.DataType =
      extra.find(_.name == c).map(_.dataType)
        .getOrElse(baseDf.schema(c).dataType)
    def conform(df: DataFrame, change: String): DataFrame =
      df.select(cols.map(c =>
        if (df.columns.contains(c)) col(c)
        else lit(null).cast(typeOf(c)).as(c)): _*)
        .withColumn("__change", lit(change))
        .withColumn("__version", lit(v))
    val parts =
      deletes.map(d => conform(d.select(keyCols.map(col): _*).distinct(),
        "delete")).toSeq ++
        upserts.map(conform(_, "upsert")).toSeq
    parts.reduce(_ unionByName _)
  }

  /** Land one committed thin version's change rows as `cdf/v{N}.parquet`
    * (single file per commit — the commit's delta IS the grain): write to
    * a staging dir, ONE rename in. Idempotent: an existing feed file for
    * the version is left untouched. */
  private def landChangeFeed(spark: SparkSession, tableDir: String, v: Int,
                             rows: DataFrame): Unit = {
    val dest = new org.apache.hadoop.fs.Path(s"$tableDir/cdf/v$v.parquet")
    val fs = dest.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(dest)) return
    val tmp = new org.apache.hadoop.fs.Path(tableDir,
      s".cdf_staging_${java.util.UUID.randomUUID().toString.take(8)}")
    try {
      microsBound(rows.coalesce(1)).write.parquet(tmp.toString)
      val part = fs.listStatus(tmp).toSeq
        .find(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(s"no parquet part in $tmp"))
      fs.mkdirs(dest.getParent): Unit
      if (!fs.rename(part.getPath, dest) && !fs.exists(dest))
        throw new IllegalStateException(s"change feed: rename to $dest failed")
    } finally { if (fs.exists(tmp)) fs.delete(tmp, true): Unit }
  }

  /** Batch SQL face of the change feed — Delta's `table_changes` TVF shape
    * (`SELECT * FROM table_changes('snap.t', fromV, toV)` once the graft
    * extensions are active): the change rows of every thin commit with
    * `fromV <= version <= toV`, read straight off the landed `cdf/`
    * files — zero table reads, zero re-diffing; the result is exactly the
    * per-commit grain the stream consumer sees, now addressable from
    * batch SQL by version range. Guardrails are Delta's too: the feed
    * must be enabled, the range must start past the enable point, and a
    * MATERIALIZED version inside the range (INSERT OVERWRITE, compaction)
    * errors with guidance — a rewrite has no change grain; diff it with
    * [[snapshotDiff]]. A committed thin version whose feed file is
    * missing (landing crash) errors toward [[repairChangeFeed]] rather
    * than silently dropping its changes. */
  def tableChanges(spark: SparkSession, tableDir: String,
                   fromV: Int, toV: Int): DataFrame = {
    require(changeFeedEnabled(spark, tableDir),
      s"change feed is not enabled on $tableDir (Sinks.enableChangeFeed)")
    val committed = snapshotCommitted(spark, tableDir).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $tableDir"))
    require(fromV >= 1 && toV >= fromV && toV <= committed,
      s"table_changes range [$fromV, $toV] must be within [1, $committed]")
    val since = changeFeedSince(spark, tableDir)
    require(fromV > since,
      s"change feed on $tableDir starts after v=$since (the enable point); " +
        s"requested from v=$fromV")
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val files: Seq[(Int, String)] = (fromV to toV).flatMap { v =>
      val feed = new org.apache.hadoop.fs.Path(s"$tableDir/cdf/v$v.parquet")
      if (thinBase(spark, tableDir, v).isEmpty) {
        // a COMPACTION's change grain is exactly empty (its rows are the
        // prior committed state, re-materialized) — it contributes nothing
        // and the range keeps spanning it; a genuine rewrite has no grain
        if (compactionBase(spark, tableDir, v).isDefined) None
        else throw new UnsupportedOperationException(
          s"v=$v of $tableDir is a MATERIALIZED version (overwrite)" +
            " — it has no change grain; diff it with Sinks.snapshotDiff")
      } else if (!fs.exists(feed))
        throw new IllegalStateException(
          s"feed file for committed thin v=$v is missing (a landing crash) " +
            "— run Sinks.repairChangeFeed first")
      else Some((v, feed.toString))
    }
    if (files.isEmpty)
      // every version in range was a compaction: the change set is empty
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        changeFeedSchema(spark, tableDir))
    else {
      // ONE evolution-proof path: read each feed file with its own schema,
      // replay its version's rename window (no-op when no renames exist),
      // and union by name. The union null-fills files from before an
      // ALTER ADD COLUMN and COERCES across a widening ALTER COLUMN TYPE
      // (int-era feed files union with bigint-era ones to bigint) — the
      // previous mergeSchema fast path failed the parquet schema merge on
      // exactly that type straddle (r16). Cost is the TVF's own grain
      // either way: O(requested files) footer reads; feed files are
      // per-commit deltas, so the plan is a union of tiny scans.
      val renames = snapshotRenames(spark, tableDir)
      val reads = files.map { case (v, f) =>
        applyRenames(spark.read.parquet(f), renamesForFolder(v, renames))
      }
      // BALANCED union (ADVICE r16): a left-deep reduce over a wide version
      // range builds an O(files)-deep plan tree that stresses the analyzer/
      // optimizer; pairing halves the depth to O(log files) with the same
      // result (union is associative; unionByName resolves per pair)
      def fold(xs: Seq[DataFrame]): DataFrame =
        if (xs.lengthCompare(1) == 0) xs.head
        else fold(xs.grouped(2).map {
          case Seq(a, b) => a.unionByName(b, allowMissingColumns = true)
          case Seq(a) => a
        }.toSeq)
      // pre-drop feed files replay their column onto the tombstone name —
      // the feed, like every read, never exposes it
      dropTombstones(fold(reads))
    }
  }

  /** [[landChangeFeed]] for the POST-COMMIT call sites: by the time the
    * feed lands, `v=N` is already committed, so a thrown filesystem error
    * here would misreport an applied statement as failed — a SQL caller's
    * retry would then double-apply the delta. A failed landing is exactly
    * the crash window [[repairChangeFeed]] already closes (it re-derives
    * the feed file from the version's own `_deletes`/`_upserts`), so the
    * failure is logged and left to repair, never propagated. */
  private def landChangeFeedSafe(spark: SparkSession, tableDir: String,
                                 v: Int, rows: => DataFrame): Unit =
    try landChangeFeed(spark, tableDir, v, rows)
    catch {
      case scala.util.control.NonFatal(e) =>
        org.slf4j.LoggerFactory.getLogger(Sinks.getClass).warn(
          s"change-feed landing for $tableDir v=$v failed AFTER the commit; " +
            s"the version is live — run Sinks.repairChangeFeed to land the " +
            s"feed file", e)
    }

  /** Thin-hop count from `v` back to its nearest materialized ancestor
    * (0 = `v` itself is materialized). Cost: one marker-file read per hop,
    * bounded by the resolver's own 64-hop stop. */
  def chainDepth(spark: SparkSession, tableDir: String, v: Int): Int = {
    var d = 0
    var cur = thinBase(spark, tableDir, v)
    while (cur.isDefined && d <= 64) { d += 1; cur = thinBase(spark, tableDir, cur.get._1) }
    d
  }

  /** Rows per file for an auto-compaction — sized so a compacted 100 TB
    * version lands in parquet files big enough to scan efficiently without
    * any single partition outgrowing executor memory. */
  private val AutoCompactTargetRows = 5000000L

  /** The resolver hard-stops at 64 thin hops, so without a backstop ~64
    * consecutive `INSERT INTO` statements (each a keyless thin append)
    * would make EVERY read of the table throw until someone manually runs
    * [[compactSnapshot]] — a correctness cliff reachable from plain SQL.
    * Once a commit pushes the chain to the threshold
    * (`graft.snapshot.autoCompactDepth`, default 48; <= 0 disables), the
    * chain auto-materializes into a new full version. Post-commit and
    * NON-FATAL by design: the statement's own version is already live, a
    * compaction failure only defers the debt to the next commit. */
  private def autoCompactIfDeep(spark: SparkSession, tableDir: String,
                                v: Int): Unit =
    // the ENTIRE body is non-fatal: this runs POST-COMMIT, so any throw —
    // an unparseable conf value, a transient FS error in the chain walk,
    // the compaction itself — would misreport an already-applied statement
    // as failed and invite a double-applying retry
    try {
      val threshold = spark.conf
        .get("graft.snapshot.autoCompactDepth", "48").trim.toInt
      if (threshold > 0 && chainDepth(spark, tableDir, v) >= threshold)
        autoCompactCas(spark, tableDir, v)
    } catch {
      case scala.util.control.NonFatal(e) =>
        org.slf4j.LoggerFactory.getLogger(Sinks.getClass).warn(
          s"auto-compaction check for $tableDir failed; v=$v is committed " +
            s"and readable, but compact before the chain reaches the " +
            s"64-hop resolver stop", e)
    }

  /** Auto-compaction for the CONCURRENT-publisher call sites. The plain
    * [[compactSnapshot]] allocates blindly and commits with a last-writer-
    * wins swap — racing a CAS publisher it could write into a claimed
    * version number or regress the pointer past a newer committed delta.
    * This variant plays the same optimistic game as the writers it runs
    * beside: claim the next version, require it to be the IMMEDIATE
    * successor of the triggering commit `base` (any intervening claim —
    * i.e. any concurrent writer since — forfeits: the claim is released
    * and the depth debt defers to THAT writer's own auto-compaction
    * check), compact the resolved rows OF `base` specifically, and commit
    * through the converging repair loop. On a change-feed-enabled table
    * the compacted version's empty change grain is declared via the
    * [[markCompaction]] stamp, so `table_changes` ranges keep spanning
    * the history a plain INSERT transparently triggered compaction on.
    * (private[graft] for the fence spec: the forfeit branch needs a
    * foreign claim wedged between the triggering commit and this call —
    * unreachable from the public surface in one thread, because a
    * pre-existing claim fences the triggering statement itself.) */
  private[graft] def autoCompactCas(spark: SparkSession, tableDir: String,
                                    base: Int): Unit = {
    val v = claimNextVersion(spark, tableDir)
    if (v != base + 1) {
      releaseClaim(spark, tableDir, v)
      return
    }
    try {
      stageCompactedVersion(spark, tableDir,
        compactionRows(spark, tableDir, base), v, base,
        AutoCompactTargetRows)
      carryManifest(spark, tableDir, v)
      commitPointerCas(spark, tableDir, v, tsMicros = None)
    } catch { case scala.util.control.NonFatal(e) =>
      // the caller swallows this (post-commit, non-fatal) — the claim MUST
      // be released here or the table wedges: every later fenced publish
      // would forfeit against a claim nobody is writing
      releaseClaimIfUnpublished(spark, tableDir, v); throw e }
  }

  /** Re-derive and land any committed THIN version whose feed file is
    * missing (writer crashed between the version commit and the landing).
    * Returns the versions repaired. */
  def repairChangeFeed(spark: SparkSession, tableDir: String): Seq[Int] = {
    if (!changeFeedEnabled(spark, tableDir)) return Seq.empty
    val committed = snapshotCommitted(spark, tableDir).getOrElse(return Seq.empty)
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val hconf = spark.sessionState.newHadoopConf()
    // only commits AFTER the enable point: fabricating feed files for
    // pre-enable history would replay ancient changes into live consumers
    val since = changeFeedSince(spark, tableDir)
    ((since + 1) to committed).flatMap { v =>
      thinBase(spark, tableDir, v) match {
        case Some((base, keyCols)) if !fs.exists(
            new org.apache.hadoop.fs.Path(s"$tableDir/cdf/v$v.parquet")) =>
          def part(name: String): Option[DataFrame] = {
            val p = new org.apache.hadoop.fs.Path(s"$tableDir/v=$v/$name")
            if (p.getFileSystem(hconf).exists(p))
              Some(spark.read.parquet(p.toString))
            else None
          }
          // names-as-of-v's COMMIT throughout, matching what the original
          // landing wrote: the base resolves with exactly the renames
          // visible at v, and v's own delta parts / marker keys already
          // carry their commit-time names
          val baseDf = resolveVersionR(spark, tableDir, base, 0,
            renamesWindowPinned(spark, tableDir, v))
          landChangeFeed(spark, tableDir, v,
            changeRows(baseDf, keyCols, v, part("_deletes"), part("_upserts")))
          Some(v)
        case _ => None
      }
    }
  }

  /** The (base, keyCols) marker of a THIN delete version, None for a
    * materialized one. */
  // ---- immutable-version marker cache --------------------------------------

  /** Committed version folders are IMMUTABLE (the protocol's core), so
    * their kind markers (`_base.json`, `_buckets`, `_compaction`) memoize
    * process-wide: every statement's chain resolution, depth check and
    * history/serving classification re-walks the same markers, and at
    * per-commit grain those FS round-trips are the measurable tax
    * (VERDICT r14 item 5 — the thin faces' residual). Safety:
    *  - a marker appears ATOMICALLY with its folder (thin/staged publishes
    *    rename a complete staged dir in; plain writes create materialized
    *    folders, whose marker absence is the correct answer mid-write);
    *  - a NEGATIVE result is cached only when the version FOLDER exists —
    *    probing a yet-unpublished version never poisons the cache;
    *  - the only way a (dir, version) pair can change kind is folder
    *    DELETION followed by number reuse — every deleting path
    *    ([[expireSnapshots]], [[vacuumOrphans]], the SQL catalog's DROP)
    *    calls [[invalidateMarkerCache]].
    * Bounded; clears wholesale on overflow (it is a cache, not a ledger). */
  private val MarkerCacheMax = 16384
  private val markerCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Int, String), Option[Any]]()

  private def cachedMarker[T](spark: SparkSession, tableDir: String,
                              version: Int, kind: String)(
      read: => Option[T]): Option[T] = {
    val k = (tableDir, version, kind)
    val hit = markerCache.get(k)
    if (hit != null) return hit.asInstanceOf[Option[T]]
    val res = read
    val cacheable = res.isDefined || {
      val vp = new org.apache.hadoop.fs.Path(s"$tableDir/v=$version")
      vp.getFileSystem(spark.sessionState.newHadoopConf()).exists(vp)
    }
    if (cacheable) {
      if (markerCache.size >= MarkerCacheMax) markerCache.clear()
      markerCache.put(k, res.asInstanceOf[Option[Any]]): Unit
    }
    res
  }

  /** Drop every cached marker of `tableDir` — called by the paths that
    * DELETE version folders, after which a version number can be reused.
    * Clears the declared-schema memo too (a DROP + re-CREATE of the same
    * name must not inherit the dropped incarnation's schema). */
  private[graft] def invalidateMarkerCache(tableDir: String): Unit = {
    val it = markerCache.keySet.iterator
    while (it.hasNext) if (it.next()._1 == tableDir) it.remove()
    declaredSchemaCache.remove(tableDir): Unit
  }

  def thinBase(spark: SparkSession, tableDir: String,
               version: Int): Option[(Int, Seq[String])] =
    cachedMarker[(Int, Seq[String])](spark, tableDir, version, "thin") {
      val p = new org.apache.hadoop.fs.Path(s"$tableDir/v=$version/_base.json")
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val txt = try new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
        finally in.close()
        // fixed two-line format: "<base>\n<keyCol,keyCol,...>" — no JSON
        // parser dependency needed for two fields. An EMPTY second line is a
        // keyless APPEND version (base ∪ upserts, no identity semantics).
        val lines = txt.trim.split('\n')
        val keys =
          if (lines.length < 2 || lines(1).trim.isEmpty) Seq.empty[String]
          else lines(1).trim.split(',').toSeq
        Some((lines(0).trim.toInt, keys))
      }
    }

  /** Read one version folder (or a delta sub-dir of it) with its SCHEMA
    * memoized through the immutable-version cache: resolving a depth-D
    * chain otherwise pays D parquet footer inferences PER STATEMENT —
    * driver round-trips that dominate thin-commit latency at toy scale
    * and planning latency at any scale. Folders are immutable once
    * visible (staged publishes rename complete dirs in), so the memoized
    * schema can never drift from the files. */
  private def readVersionDir(spark: SparkSession, tableDir: String,
                             v: Int, sub: String): DataFrame = {
    val path = if (sub.isEmpty) s"$tableDir/v=$v" else s"$tableDir/v=$v/$sub"
    val kind = if (sub.isEmpty) "schema" else s"schema:$sub"
    cachedMarker[org.apache.spark.sql.types.StructType](
        spark, tableDir, v, kind) {
      // one footer, no inference job (FooterSchema scaladoc) for the flat
      // common case; BUCKETED version dirs keep their data under b=K
      // subdirs (no direct data file), where full inference must run so
      // the partition-dir column participates exactly as before
      Some(graft.sources.FooterSchema.of(spark, Seq(path))
        .getOrElse(spark.read.parquet(path).schema))
    } match {
      case Some(s) => spark.read.schema(s).parquet(path)
      case None => spark.read.parquet(path)
    }
  }

  private def resolveVersion(spark: SparkSession, tableDir: String,
                             v: Int, depth: Int): DataFrame =
    // PINNED semantics: the resolution window holds only the renames
    // declared BEFORE the pinned version's commit; each folder in the
    // chain then replays the window's entries at or after its own commit
    // position, so every frame in the merge carries names-as-of-topV
    dropTombstones(resolveVersionR(spark, tableDir, v, depth,
      renamesWindowPinned(spark, tableDir, v)))

  /** The resolver at HEAD (unpinned) semantics: names after EVERY recorded
    * rename — what the catalog's head markers splice into SQL plans. */
  def readSnapshotServed(spark: SparkSession, tableDir: String,
                         v: Int): DataFrame =
    dropTombstones(
      resolveVersionR(spark, tableDir, v, 0, snapshotRenames(spark, tableDir)))

  private def resolveVersionR(spark: SparkSession, tableDir: String,
                              v: Int, depth: Int,
                              window: Seq[(Int, String, String)]): DataFrame = {
    require(depth <= 64,
      s"merge-on-read chain deeper than 64 at $tableDir v=$v — compact it")
    val renames = renamesForFolder(v, window)
    thinBase(spark, tableDir, v) match {
      case None =>
        val df = applyRenames(readVersionDir(spark, tableDir, v, ""), renames)
        // bucketed versions carry a synthetic __bucket layout column —
        // physical, not logical
        if (bucketedLayout(spark, tableDir, v).isDefined) df.drop("__bucket")
        else df
      case Some((base, rawKeyCols)) =>
        val baseDf = resolveVersionR(spark, tableDir, base, depth + 1, window)
        val keyCols = rawKeyCols.map(renameKey(_, renames))
        val hconf = spark.sessionState.newHadoopConf()
        def part(name: String): Option[DataFrame] = {
          val p = new org.apache.hadoop.fs.Path(s"$tableDir/v=$v/$name")
          if (p.getFileSystem(hconf).exists(p))
            Some(applyRenames(readVersionDir(spark, tableDir, v, name), renames))
          else None
        }
        val kc = keyCols.map(org.apache.spark.sql.functions.col)
        val ups = part("_upserts")
        // keyless APPEND version: nothing ever leaves the base
        val gone =
          if (keyCols.isEmpty) None
          else (part("_deletes").toSeq ++ ups.map(_.select(kc: _*)).toSeq)
            .reduceOption(_ unionByName _)
        val kept = gone.fold(baseDf)(g =>
          baseDf.join(g.distinct(), keyCols, "left_anti"))
        // the version's schema is the base's EXTENDED by any columns its
        // upserts added (writes after an ALTER TABLE ADD COLUMN land full-
        // schema deltas on a narrower base) and WIDENED wherever the
        // upserts carry a wider type (writes after a widening ALTER COLUMN
        // TYPE land e.g. bigint deltas on an int-typed base — conforming
        // to the base's type would overflow-cast the delta, r16) — base
        // rows null-fill additions and widen losslessly; an upsert can
        // never be NARROWER than the base (writes bind to the table
        // schema), so conform only widens
        ups.fold(kept) { u =>
          val extra = u.schema.fields.filterNot(f =>
            baseDf.columns.exists(_.equalsIgnoreCase(f.name)))
          val widened = baseDf.schema.fields.map { bf =>
            u.schema.fields.find(_.name.equalsIgnoreCase(bf.name)) match {
              case Some(uf) if graft.sources.SnapshotCatalog
                  .widens(bf.dataType, uf.dataType) =>
                bf.copy(dataType = uf.dataType)
              case _ => bf
            }
          }
          val target = org.apache.spark.sql.types.StructType(widened ++ extra)
          graft.sources.SchemaEvolution.conform(kept, target)
            .unionByName(graft.sources.SchemaEvolution.conform(u, target))
        }
    }
  }

  /** TAKEDOWN AT 100 TB: publish the next version as a THIN merge-on-read
    * delete — only the removal KEYS are written (a `_deletes/` parquet and
    * a two-line `_base` marker inside the new version folder; zero data
    * files), and [[readSnapshot]] resolves the chain base-first with one
    * LEFT ANTI join per thin hop. The copy-on-write alternative (q217's
    * SQL DELETE) rewrites the whole table per takedown — right for tables
    * that fit a rewrite, wrong at 100 TB where a daily key-list removal
    * must cost O(keys), not O(corpus). The trade is the classic MOR one:
    * reads pay an anti-join per uncompacted hop (the resolver hard-stops
    * at 64), so [[compactSnapshot]] — which reads through the same
    * resolver — materializes the chain back to a full version on the
    * operator's schedule. Version semantics are unchanged: thin versions
    * commit through the same claim-CAS publish, pinned bases stay
    * immutable and readable, [[snapshotDiff]] diffs resolved content, and
    * [[expireSnapshots]] refuses to drop a base a surviving thin version
    * still needs. NULL keys never match an anti join — a null-keyed delete
    * row removes nothing, by SQL semantics. SQL catalog serving of thin
    * chains is native since r13 ([[graft.sources.ResolveThinSnapshots]]
    * expands the marker relation at analysis); sessions without the graft
    * extensions still need materialized versions — compact first, the
    * contract Iceberg puts on non-MOR-aware readers. */
  def deleteSnapshotKeys(spark: SparkSession, tableDir: String,
                         keys: DataFrame, keyCols: Seq[String],
                         commitTsMicros: Option[Long] = None,
                         expectedBase: Option[Int] = None): Int =
    publishThin(spark, tableDir, keyCols, commitTsMicros,
      deletes = Some(keys), upserts = None, expectedBase = expectedBase)

  /** The UPSERT half of the thin-version story — CDC INGEST at O(batch)
    * per commit: publish the next version as base minus the touched keys
    * plus the new rows (`_upserts/` parquet; optional tombstones ride the
    * same version's `_deletes/`). The upsert is LAST-WRITER-WINS against
    * the base — callers enforcing an ordering residual (q108's (ts, tie))
    * compute the EFFECTIVE delta against the current resolved state first,
    * which is the standard CDC ingest shape anyway. Everything else is
    * [[deleteSnapshotKeys]]'s contract: claim-CAS commit, chain resolution,
    * diff over resolved content, compaction, base protection. */
  def upsertSnapshotRows(spark: SparkSession, tableDir: String,
                         rows: DataFrame, keyCols: Seq[String],
                         deletes: Option[DataFrame] = None,
                         commitTsMicros: Option[Long] = None,
                         expectedBase: Option[Int] = None): Int =
    publishThin(spark, tableDir, keyCols, commitTsMicros,
      deletes = deletes, upserts = Some(rows), expectedBase = expectedBase)

  /** `INSERT INTO` at the MOR cost model: publish the next version as a
    * KEYLESS thin APPEND — only the new rows are written (`_upserts/` +
    * an empty-keys `_base` marker; zero base bytes move), and the resolver
    * serves base ∪ appended with no anti join (nothing ever leaves the
    * base). No identity semantics: duplicates are the caller's to mean. */
  def appendSnapshotRows(spark: SparkSession, tableDir: String,
                         rows: DataFrame,
                         commitTsMicros: Option[Long] = None,
                         expectedBase: Option[Int] = None): Int =
    publishThin(spark, tableDir, Seq.empty, commitTsMicros,
      deletes = None, upserts = Some(rows), expectedBase = expectedBase)

  private def publishThin(spark: SparkSession, tableDir: String,
                          keyCols: Seq[String], commitTsMicros: Option[Long],
                          deletes: Option[DataFrame],
                          upserts: Option[DataFrame],
                          expectedBase: Option[Int] = None): Int = {
    require(keyCols.nonEmpty || (deletes.isEmpty && upserts.nonEmpty),
      "keyless thin versions are APPENDs: upserts only, no deletes")
    require(keyCols.forall(!_.contains(",")),
      "thin-version key column names must not contain ',' (marker format)")
    // a duplicate key inside ONE upsert batch would materialize as
    // duplicate rows in every resolved read downstream — reject the
    // corrupt commit up front (one batch-sized grouped count; the cost of
    // an integrity gate, not of the corpus). Keyless appends have no
    // identity to gate.
    if (keyCols.nonEmpty) upserts.foreach { u =>
      val kc = keyCols.map(org.apache.spark.sql.functions.col)
      val dup = u.groupBy(kc: _*)
        .count().filter(org.apache.spark.sql.functions.col("count") > 1)
      if (!dup.isEmpty)
        throw new IllegalArgumentException(
          "upsert batch carries duplicate keys (first: " +
            dup.head().toString + ") — compact the batch per key first")
    }
    // base binds ONCE, up front: the delta the caller computed (effective
    // upserts, takedown keys) was derived against this version, so this
    // version is what the chain must reference. Callers that derived their
    // delta against an EARLIER read (SQL DML handles) pass that version as
    // `expectedBase` to extend the fence back to their read. The FENCED
    // publish proves at claim time that no other writer got in between —
    // two concurrent thin writers can both bind the same base, but only
    // one can claim base+1; the loser aborts with its staging discarded
    // instead of silently dropping the winner's delta (the lost update).
    val base = expectedBase.orElse(snapshotCommitted(spark, tableDir))
      .getOrElse(throw new IllegalStateException(
        s"no committed snapshot at $tableDir — nothing to derive from"))
    // bucketed × MOR: a thin hop on a bucketed base stays correct (the
    // resolver reads through it) but the new head is no longer a single
    // key-grouped scan — storage-partitioned joins shuffle until
    // rebucketSnapshot re-materializes the layout. Degrading SILENTLY is
    // the failure mode; say it once per commit.
    if (bucketedLayout(spark, tableDir, base).isDefined)
      org.slf4j.LoggerFactory.getLogger(Sinks.getClass).warn(
        s"thin commit on BUCKETED base v=$base of $tableDir: readers stay " +
          "correct but the zero-exchange join layout is gone until " +
          "Sinks.rebucketSnapshot re-materializes it")
    val staged = new org.apache.hadoop.fs.Path(tableDir,
      s".dml_staging_${java.util.UUID.randomUUID().toString.take(8)}")
    deletes.foreach(
      _.select(keyCols.map(org.apache.spark.sql.functions.col): _*).distinct()
        .transform(microsBound).write.parquet(new org.apache.hadoop.fs.Path(staged, "_deletes").toString))
    upserts.foreach(
      u => microsBound(u).write.parquet(new org.apache.hadoop.fs.Path(staged, "_upserts").toString))
    val fs = staged.getFileSystem(spark.sessionState.newHadoopConf())
    val mp = new org.apache.hadoop.fs.Path(staged, "_base.json")
    val out = fs.create(mp, false)
    try out.write(s"$base\n${keyCols.mkString(",")}".getBytes("UTF-8"))
    finally out.close()
    val v = publishStagedSnapshotFenced(spark, tableDir, staged, base, commitTsMicros)
    // change data feed (opt-in): land this commit's change rows post-commit
    // — a crash in between is repaired from the version's own delta files
    // (repairChangeFeed), never from a second source of truth
    if (changeFeedEnabled(spark, tableDir))
      landChangeFeedSafe(spark, tableDir, v,
        changeRows(resolveVersionR(spark, tableDir, base, 0,
            renamesWindowPinned(spark, tableDir, v)), keyCols, v,
          // re-read the published delta (the input frames may hold
          // now-consumed staging paths); v=N is immutable from here on
          deletes.map(_ => spark.read.parquet(s"$tableDir/v=$v/_deletes")),
          upserts.map(_ => spark.read.parquet(s"$tableDir/v=$v/_upserts"))))
    autoCompactIfDeep(spark, tableDir, v)
    v
  }

  /** Change feed between two snapshot versions — CDC DERIVED from
    * immutable snapshots (the complement of applying CDC, q108/q116):
    * keyed full-outer join of the two folders, each row classified
    * `added` / `removed` / `changed` (any non-key column differs,
    * null-safe). Emits only the delta — what an incremental downstream
    * (index refresh, re-embedding, cache invalidation) consumes instead
    * of re-reading the full table.
    *
    * Scale: ONE join keyed on `keyCols` — both sides shuffle once; with
    * both versions written bucketed on the key the exchange disappears
    * entirely. Non-key columns ride packed in a single struct so the
    * comparison is one codegen'd null-safe struct equality, not N column
    * comparisons with N null branches. Delta output is |changes|-sized. */
  def snapshotDiff(spark: SparkSession, tableDir: String,
                   fromV: Int, toV: Int, keyCols: Seq[String]): DataFrame =
    diffTables(readSnapshot(spark, tableDir, Some(fromV)),
      readSnapshot(spark, tableDir, Some(toV)), keyCols)

  /** [[writeSnapshot]] BUCKETED for storage-partitioned joins: rows land
    * in `__bucket=i` subfolders of the version by `pmod(key, n)` (integral
    * keys — the canonical co-location layout two fact/dim tables share),
    * and the version carries a `_buckets` marker (`keyCol\nn`). The
    * bucketed SQL read ([[graft.sources.BucketedSnapshotTable]]) reports
    * `KeyGroupedPartitioning(graft_bucket(n, key))`, so a join of two
    * tables bucketed the SAME way runs with ZERO exchange on either side
    * (Spark's storage-partitioned join; enable
    * `spark.sql.sources.v2.bucketing.enabled`). At 100 TB this is the
    * difference between a co-located merge and shuffling both corpora. */
  def writeSnapshotBucketed(df: DataFrame, tableDir: String,
                            keyCol: String, buckets: Int): Int = {
    require(buckets > 0, "buckets must be positive")
    val kt = df.schema(keyCol).dataType
    require(Seq(org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(kt),
      s"bucketed snapshots need an integral key, got $kt")
    val spark = df.sparkSession
    val next = snapshotVersions(spark, tableDir).lastOption.getOrElse(0) + 1
    val vDir = s"$tableDir/v=$next"
    // NULL keys are rejected IN the write pass (no extra job): pmod(null)
    // would land rows in __bucket=__HIVE_DEFAULT_PARTITION__ and poison
    // every subsequent bucketed read
    df.withColumn("__bucket",
        when(col(keyCol).isNull, raise_error(lit(
          s"writeSnapshotBucketed: NULL in bucket key $keyCol — bucketed " +
            "layouts require non-null keys")).cast("int"))
          .otherwise(pmod(col(keyCol).cast("long"), lit(buckets.toLong)).cast("int")))
      .transform(microsBound)
      .write.partitionBy("__bucket").mode(SaveMode.Overwrite).parquet(vDir)
    val mp = new org.apache.hadoop.fs.Path(vDir, "_buckets")
    val fs = mp.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(mp, true)
    try out.write(s"$keyCol\n$buckets".getBytes("UTF-8")) finally out.close()
    commitPointer(spark, tableDir, next)
    next
  }

  /** Restore the ZERO-EXCHANGE layout after merge-on-read DML degraded it:
    * re-materialize the resolved chain into a fresh BUCKETED version (one
    * read through the chain, one bucketed write, one pointer swap). The
    * bucketed × MOR contract in one line: thin hops on a bucketed base
    * stay O(delta)-correct but the chain head is a resolved multi-scan
    * plan, not a single key-grouped scan — storage-partitioned joins
    * shuffle until this re-bucket lands. Returns the committed version. */
  def rebucketSnapshot(spark: SparkSession, tableDir: String,
                       keyCol: String, buckets: Int): Int =
    writeSnapshotBucketed(readSnapshot(spark, tableDir), tableDir,
      keyCol, buckets)

  /** The (keyCol, buckets) marker of a bucketed version, None otherwise. */
  def bucketedLayout(spark: SparkSession, tableDir: String,
                     version: Int): Option[(String, Int)] =
    cachedMarker[(String, Int)](spark, tableDir, version, "buckets") {
      val p = new org.apache.hadoop.fs.Path(s"$tableDir/v=$version/_buckets")
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val txt = try new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
        finally in.close()
        val lines = txt.trim.split('\n')
        Some((lines(0).trim, lines(1).trim.toInt))
      }
    }

  /** [[writeSnapshot]] + an Iceberg-style FILE MANIFEST: per-file min/max
    * of `statsCols`, computed in one grouped pass over the written files
    * (`input_file_name` groupBy — at production scale this piggybacks on
    * write-task accumulators instead) and committed as
    * `_manifest/v=N.parquet` BEFORE the pointer swap, so manifest and data
    * are one atomic unit. What it buys at 100 TB: [[readSnapshotPruned]]
    * prunes candidate files on the DRIVER from the (tiny) manifest — zero
    * parquet footer round-trips across a 100k-file table, the difference
    * between a sub-second and a minutes-long planning phase on an object
    * store. */
  def writeSnapshotWithManifest(df: DataFrame, tableDir: String,
                                statsCols: Seq[String],
                                maxRecordsPerFile: Long = 0L): Int = {
    val spark = df.sparkSession
    val next = snapshotVersions(spark, tableDir).lastOption.getOrElse(0) + 1
    val w = microsBound(df).write.mode(SaveMode.Overwrite)
    (if (maxRecordsPerFile > 0) w.option("maxRecordsPerFile", maxRecordsPerFile)
     else w).parquet(s"$tableDir/v=$next")
    // stats come off the just-written files' FOOTERS (min/max/null-count),
    // not a second full read of the data — the build is O(#files) metadata
    graft.sources.FooterStats
      .manifestFrame(spark, s"$tableDir/v=$next",
        graft.sources.FooterSchema.require(spark, s"$tableDir/v=$next"), statsCols)
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$tableDir/_manifest/v=$next")
    commitPointer(spark, tableDir, next)
    next
  }

  /** Manifest-pruned snapshot read: keep only files whose [min,max] range
    * on `statCol` intersects [lo,hi] (closed interval; a file with a NULL
    * min/max — all-null column chunk — is conservatively kept), hand Spark
    * the surviving file list directly, and re-apply the exact predicate.
    * Pruning correctness never depends on the manifest: it only SKIPS
    * files the range test proves empty for the predicate. Returns the
    * pruned DataFrame plus (files kept, files total) for audits. */
  def readSnapshotPruned(spark: SparkSession, tableDir: String,
                         statCol: String, lo: Long, hi: Long,
                         version: Option[Int] = None): (DataFrame, Int, Int) = {
    val v = version.orElse(snapshotCommitted(spark, tableDir)).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $tableDir"))
    val manifest = spark.read.parquet(s"$tableDir/_manifest/v=$v")
      .select(col("file"), col(s"min_$statCol").cast("long").as("lo"),
        col(s"max_$statCol").cast("long").as("hi"))
      .collect()
    val total = manifest.length
    val kept = manifest.filter { r =>
      r.isNullAt(1) || r.isNullAt(2) ||
        (r.getLong(1) <= hi && r.getLong(2) >= lo)
    }.map(_.getString(0))
    // all files pruned (valid predicate range matching no data): parquet
    // can't infer a schema from zero paths, so serve an empty DataFrame
    // with the snapshot's schema instead
    val df =
      if (kept.isEmpty)
        spark.read.parquet(s"$tableDir/v=$v").where(lit(false))
      else spark.read.parquet(kept.toIndexedSeq: _*)
        .filter(col(statCol).between(lo, hi))
    (df, kept.length, total)
  }

  /** `DESCRIBE HISTORY` for the snapshot store: one row per version
    * folder at or below the committed pointer (expired versions are gone;
    * orphans above the pointer never show), classified by the version's
    * own on-disk markers — the same records every reader trusts:
    *
    *  - `kind`: 'thin' (`_base.json`), 'bucketed' (`_buckets`), else
    *    'materialized';
    *  - `operation`: thin → 'append' (keyless) / 'delete' (tombstones
    *    only) / 'upsert'; bucketed → 'rebucket'; materialized →
    *    'compact' (`_compaction` stamp), 'create' (v=1), 'overwrite';
    *  - `base_version`: the thin hop's base or the compaction's source;
    *  - `committed_at`: micros from the `_commits/` record (null for
    *    tables published before commit records existed);
    *  - `files`/`bytes`: the version folder's data-file footprint.
    *
    * Cost: one folder listing + marker probes per version — O(history),
    * zero data reads. SQL face: `SELECT * FROM snapshot_history('snap.t')`
    * with the graft extensions active. */
  def snapshotHistory(spark: SparkSession, tableDir: String): DataFrame = {
    import spark.implicits._
    val committed = snapshotCommitted(spark, tableDir).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $tableDir"))
    val times = snapshotCommitTimes(spark, tableDir)
    val hconf = spark.sessionState.newHadoopConf()
    val partitioned =
      graft.sources.PartitionedSnapshot.partSpec(spark, tableDir).isDefined
    val rows = snapshotVersions(spark, tableDir).filter(_ <= committed).map { v =>
      val dir = new org.apache.hadoop.fs.Path(s"$tableDir/v=$v")
      val fs = dir.getFileSystem(hconf)
      def sub(name: String): Boolean =
        fs.exists(new org.apache.hadoop.fs.Path(dir, name))
      // footprint includes thin versions' delta subdirs (_upserts/_deletes)
      // — the version KIND this face classifies stores its bytes there —
      // and, for PARTITIONED snapshots, the hive leaf dirs the version
      // OWNS, walked to any nesting depth (mixed `key:src,days:ts`
      // layouts nest; carried partitions live in — and are billed to —
      // the folder that physically owns them; a zero-copy drop reports
      // 0 files)
      def walkParquet(p: org.apache.hadoop.fs.Path):
          Seq[org.apache.hadoop.fs.FileStatus] =
        fs.listStatus(p).toSeq.flatMap { st =>
          if (st.isFile && st.getPath.getName.endsWith(".parquet")) Seq(st)
          else if (st.isDirectory) walkParquet(st.getPath)
          else Nil
        }
      val dataFiles =
        if (partitioned) walkParquet(dir)
        else fs.listStatus(dir).toSeq.flatMap { st =>
          if (st.isFile && st.getPath.getName.endsWith(".parquet")) Seq(st)
          else if (st.isDirectory && st.getPath.getName.startsWith("_"))
            fs.listStatus(st.getPath).toSeq.filter(c =>
              c.isFile && c.getPath.getName.endsWith(".parquet"))
          else Nil
        }
      val (kind, operation, base) =
        if (partitioned)
          graft.sources.PartitionedSnapshot.versionMeta(spark, tableDir, v) match {
            case Some((op, b)) => ("partitioned", op, b)
            case None => // pre-r18 folder without an _op record
              ("partitioned", if (v == 1) "create" else "overwrite",
                None: Option[Int])
          }
        else thinBase(spark, tableDir, v) match {
        case Some((b, keys)) =>
          val op =
            if (keys.isEmpty) "append"
            else if (sub("_upserts")) "upsert"
            else "delete"
          ("thin", op, Some(b))
        case None if bucketedLayout(spark, tableDir, v).isDefined =>
          ("bucketed", "rebucket", None)
        case None => compactionBase(spark, tableDir, v) match {
          case Some(b) => ("materialized", "compact", Some(b))
          case None =>
            ("materialized", if (v == 1) "create" else "overwrite", None)
        }
      }
      (v, times.get(v), kind, operation, base,
        dataFiles.length, dataFiles.map(_.getLen).sum)
    }
    rows.toDF("version", "committed_at", "kind", "operation",
      "base_version", "files", "bytes")
  }

  /** Retention janitor: delete all but the newest `keep` committed-or-older
    * version folders (and their manifests). The committed version itself
    * and anything NEWER than it (an in-flight writer's folder) are never
    * touched, so the janitor is safe to run concurrently with readers
    * pinned to the retained window and with an active writer. Returns the
    * versions dropped. Time travel obviously shortens to the retained
    * window — pin + copy before expiring if a snapshot must outlive it. */
  def expireSnapshots(spark: SparkSession, tableDir: String,
                      keep: Int): Seq[Int] = {
    require(keep >= 1, "keep at least the committed version")
    val committed = snapshotCommitted(spark, tableDir).getOrElse(return Seq.empty)
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val all = snapshotVersions(spark, tableDir)
    val toDrop0 = all.filter(_ <= committed).dropRight(keep)
    // a surviving THIN version resolves through its base chain — dropping
    // a needed base would orphan readable history; protect transitively
    val survivors = all.toSet -- toDrop0
    val needed = survivors.flatMap { v =>
      Iterator.iterate(thinBase(spark, tableDir, v).map(_._1)) {
        case Some(b) => thinBase(spark, tableDir, b).map(_._1)
        case None => None
      }.takeWhile(_.isDefined).flatten.toSeq
    }
    // a PARTITIONED snapshot's surviving versions CARRY partition dirs
    // from older folders (single-hop refs) — those folders must survive
    // too, exactly like thin bases (r17)
    val carried: Set[Int] =
      if (graft.sources.PartitionedSnapshot.partSpec(spark, tableDir).isEmpty)
        Set.empty
      else graft.sources.PartitionedSnapshot
        .referencedVersions(spark, tableDir, survivors.toSeq)
    val toDrop = toDrop0.filterNot(v => needed(v) || carried(v))
    toDrop.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$tableDir/v=$v"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$tableDir/_manifest/v=$v"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$tableDir/_commits/v=$v"), false)
      // concurrent writers' claim markers expire with their versions —
      // re-allocation stays impossible (allocation maxes over folders,
      // claims AND the pointer, and newer versions survive by contract)
      fs.delete(new org.apache.hadoop.fs.Path(s"$tableDir/_claims/v=$v"), false)
      // an expired version's change-feed file retires with it (consumers
      // past it have their offsets in the stream checkpoint, not here)
      fs.delete(new org.apache.hadoop.fs.Path(s"$tableDir/cdf/v$v.parquet"), false)
    }
    if (toDrop.nonEmpty) invalidateMarkerCache(tableDir)
    toDrop
  }

  /** Janitor for crashed-writer debris: version FOLDERS without a commit
    * record never resolve (readers go through the pointer; TIMESTAMP AS OF
    * through the records) but hold disk forever. An unrecorded folder is
    * dropped only when OLDER than `graceMs` (folder modification time) —
    * position relative to the pointer proves nothing about liveness: a
    * slow concurrent writer can sit mid-write on a claimed version BELOW a
    * faster writer's committed pointer, and deleting under it would let
    * its later record resolve to missing data. The age discipline is the
    * same one every object-store janitor needs; size `graceMs` well past
    * the longest plausible write. Returns the dropped version numbers. */
  def vacuumOrphans(spark: SparkSession, tableDir: String,
                    graceMs: Long = 24L * 3600 * 1000): Seq[Int] = {
    val recorded = recordedCommits(spark, tableDir).toSet
    val root = new org.apache.hadoop.fs.Path(tableDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Seq.empty
    val now = System.currentTimeMillis()
    val dropped = snapshotVersions(spark, tableDir)
      .filterNot(recorded)
      .filter { v =>
        val st = fs.getFileStatus(new org.apache.hadoop.fs.Path(s"$tableDir/v=$v"))
        now - st.getModificationTime > graceMs
      }
    dropped.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$tableDir/v=$v"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$tableDir/_claims/v=$v"), false)
      // the orphan's manifest must die with it: vacuuming an ABOVE-pointer
      // orphan lets its version NUMBER be re-allocated, and a later writer
      // reusing it would inherit a STALE manifest enumerating deleted
      // files (carryManifest's exists-check would then keep it)
      fs.delete(new org.apache.hadoop.fs.Path(s"$tableDir/_manifest/v=$v"), true)
    }
    // number reuse after a vacuum is real (an above-pointer orphan frees
    // its number) — the marker cache must forget this table
    if (dropped.nonEmpty) invalidateMarkerCache(tableDir)
    // crashed writers that never reached publish leave `.dml_staging_*`
    // folders (publish renames staging into v=N; a JVM crash mid-stage
    // orphans it), a crash inside the change-feed landing leaves
    // `.cdf_staging_*`, and a crashed compaction leaves
    // `.compact_staging_*` — same age discipline, same grace window
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory &&
        (s.getPath.getName.startsWith(".dml_staging_") ||
          s.getPath.getName.startsWith(".cdf_staging_") ||
          s.getPath.getName.startsWith(".compact_staging_") ||
          s.getPath.getName.startsWith(".psnap_staging_")) &&
        now - s.getModificationTime > graceMs)
      .foreach(s => fs.delete(s.getPath, true))
    // FOLDER-LESS claims: a writer that crashed after claiming but before
    // any byte of `v=N` landed (or a pre-fix failure path that leaked its
    // claim) leaves a claim file no folder-keyed cleanup above ever
    // reaches — and a leaked claim at `base+1` wedges every fenced publish
    // indefinitely. Age-out by the claim FILE's mtime: a live writer's
    // claim is younger than any sane grace, and its folder (once a byte
    // lands) protects the number regardless.
    val claimsDir = new org.apache.hadoop.fs.Path(s"$tableDir/_claims")
    if (fs.exists(claimsDir)) {
      val folders = snapshotVersions(spark, tableDir).toSet
      fs.listStatus(claimsDir).toSeq
        .filter { s =>
          val n = s.getPath.getName
          n.startsWith("v=") && n.drop(2).nonEmpty &&
            n.drop(2).forall(_.isDigit) &&
            !folders.contains(n.drop(2).toInt) &&
            !recorded.contains(n.drop(2).toInt) &&
            now - s.getModificationTime > graceMs
        }
        .foreach(s => fs.delete(s.getPath, false))
    }
    dropped
  }

  /** Workspace-side staging janitor: COW DML on workspace tables stages
    * as `.{table}.__cow_*` siblings of the table directory (rename-swapped
    * in on commit, discarded on failure) — a JVM CRASH mid-write orphans
    * the staging folder with neither path taken. Age-out with the same
    * grace discipline as [[vacuumOrphans]]: modification time, never
    * position (a slow writer can legitimately sit mid-stage for the length
    * of its longest job). Returns the deleted paths. */
  def vacuumWorkspaceStaging(spark: SparkSession, workspaceDir: String,
                             graceMs: Long = 24L * 3600 * 1000): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(workspaceDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Seq.empty
    val now = System.currentTimeMillis()
    // a `.repart_*` sibling is only DEBRIS while its table has no
    // `.repart` journal: with the journal present it is a live/crashed
    // partition-spec evolution's transient state — the parked or staged
    // copy may be the ONLY copy of the table's rows, and recovery (not
    // the janitor) owns it. Name shape: `.repart[_old]_<table>_<8hex>`.
    // the name grammar is AMBIGUOUS for tables whose own name starts with
    // "old_" (`.repart_old_x_t` = staged-of-"old_x" OR parked-of-"x") —
    // probe EVERY interpretation and protect the dir if any journal
    // exists: deleting a live swap's staged copy is total data loss
    def repartJournalExists(n: String): Boolean = {
      def tableOf(core: String): Option[String] = {
        val i = core.lastIndexOf('_')
        if (i <= 0) None else Some(core.take(i))
      }
      val candidates =
        (if (n.startsWith(".repart_old_"))
          tableOf(n.stripPrefix(".repart_old_")).toSeq
        else Nil) ++ tableOf(n.stripPrefix(".repart_")).toSeq
      candidates.exists(t => fs.exists(new org.apache.hadoop.fs.Path(
        s"$workspaceDir/_graft_schema/$t.repart")))
    }
    val debris = fs.listStatus(root).toSeq.filter { s =>
      val n = s.getPath.getName
      s.isDirectory && n.startsWith(".") &&
        (n.contains(".__cow_") || n.startsWith(".dml_staging_") ||
          (n.startsWith(".repart_") && !repartJournalExists(n))) &&
        now - s.getModificationTime > graceMs
    }
    debris.foreach(s => fs.delete(s.getPath, true))
    debris.map(_.getPath.toString)
  }

  /** [[snapshotDiff]]'s engine over any two same-schema tables. */
  def diffTables(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame = {
    val valCols = a.columns.filterNot(keyCols.contains).toSeq
    val av = a.select(keyCols.map(col) :+ struct(valCols.map(col): _*).as("__a"): _*)
    val bv = b.select(keyCols.map(col) :+ struct(valCols.map(col): _*).as("__b"): _*)
    av.join(bv, keyCols, "full_outer")
      .withColumn("change",
        when(col("__a").isNull, lit("added"))
          .when(col("__b").isNull, lit("removed"))
          .when(!(col("__a") <=> col("__b")), lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("change") =!= "unchanged")
      .select(keyCols.map(col) :+ col("change"): _*)
  }
}
