package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** PARTITIONED VERSIONED tables — the snapshot protocol × a hidden
  * directory layout (VERDICT r16 missing #5: the versioned store had no
  * partition-dir layout, so day-grained retention paid O(keys) thin
  * deletes or a full COW rewrite).
  *
  * Layout: each immutable `v=N` folder holds hive leaf directories of ONE
  * hidden transform (`days(ts)` / `hours(ts)` / `months(ts)` /
  * `bucket(n, id)` — the [[PartLevel]] grammar; identity specs route to
  * the partitioned WORKSPACE catalog, whose hive value re-attachment a
  * cross-version dir list cannot express) PLUS a `_carry` manifest naming
  * the partitions REUSED from older versions:
  *
  * {{{
  *   <t>/_partspec            days:ts            (the table marker)
  *   <t>/_partschema.json     declared schema    (reads + empty versions)
  *   <t>/v=1/ts_day=19723/…parquet               (physically owned)
  *   <t>/v=2/_carry           19723 -> v=1/ts_day=19723   (reused, 0 bytes)
  *   <t>/v=2/ts_day=19730/…parquet               (this version's new day)
  * }}}
  *
  * Carry entries are SINGLE-HOP by construction: publishing v=N+1 copies
  * v=N's carry entries verbatim and adds entries pointing INTO v=N for the
  * days v=N owned — resolution never recurses. What this buys at 100 TB:
  *
  *  - **[[dropPartitions]] is a ZERO-COPY commit**: the new version is one
  *    `_carry` file naming every surviving day — dropping a day from a
  *    year of history writes NO data file and touches NO other day's
  *    bytes, while every pinned version keeps serving its own content.
  *  - **[[appendRows]] is O(touched days + batch)**: only the days the
  *    batch lands in are rewritten (old content ∪ new rows, clustered);
  *    every other day rides a carry entry.
  *  - **Reads partition-prune** through the level's derivation, exactly
  *    like partitioned workspace tables (the SQL catalog serves versions
  *    through the same pruned scan builder).
  *
  * Concurrency: single-writer maintenance API (the [[graft.operators.Sinks.compactSnapshot]]
  * contract) — version allocation maxes over folders AND live claims, the
  * pointer commit is the shared atomic primitive, and readers mid-publish
  * keep the committed version. Retention: [[graft.operators.Sinks.expireSnapshots]]
  * protects folders that surviving versions still CARRY FROM, transitively
  * — like thin bases. */
object PartitionedSnapshot {

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def specPath(tableDir: String) = new Path(tableDir, "_partspec")
  private def schemaPath(tableDir: String) = new Path(tableDir, "_partschema.json")
  private def carryPath(tableDir: String, v: Int) =
    new Path(s"$tableDir/v=$v/_carry")

  /** The table's partition spec marker, if it is a partitioned snapshot. */
  def partSpec(spark: SparkSession, tableDir: String): Option[String] = {
    val p = specPath(tableDir)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim)
      finally in.close()
    }
  }

  def declaredSchema(spark: SparkSession, tableDir: String): StructType = {
    val p = schemaPath(tableDir)
    val fs = fsOf(spark, p)
    require(fs.exists(p), s"$tableDir has no _partschema.json")
    val in = fs.open(p)
    val txt = try new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
    finally in.close()
    DataType.fromJson(txt).asInstanceOf[StructType]
  }

  private[graft] def levelOf(spark: SparkSession, tableDir: String): PartLevel = {
    val spec = partSpec(spark, tableDir).getOrElse(
      throw new IllegalArgumentException(s"$tableDir is not a partitioned snapshot"))
    PartitionedWorkspace.levelsOf(spec, declaredSchema(spark, tableDir)).head
  }

  private def writeSmall(spark: SparkSession, p: Path, txt: String): Unit = {
    val fs = fsOf(spark, p)
    fs.mkdirs(p.getParent): Unit
    val tmp = new Path(p.getParent,
      s".${p.getName}.tmp.${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(txt.getBytes("UTF-8")) finally out.close()
    if (fs.exists(p)) fs.delete(p, false): Unit
    if (!fs.rename(tmp, p))
      throw new IllegalStateException(s"small-file write: rename to $p failed")
  }

  private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")

  /** The carry entries of one version: (partition value, path relative to
    * the TABLE dir). Complete-or-absent (temp+rename write); a missing
    * file means "no carries" (v=1, or a full rewrite). */
  private def readCarry(spark: SparkSession, tableDir: String,
                        v: Int): Seq[(String, String)] = {
    val p = carryPath(tableDir, v)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) Nil
    else {
      val in = fs.open(p)
      val txt = try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      finally in.close()
      txt.split('\n').toSeq.filter(_.nonEmpty).map { line =>
        val i = line.indexOf('\t')
        (dec(line.take(i)), dec(line.drop(i + 1)))
      }
    }
  }

  private def writeCarry(spark: SparkSession, dest: Path,
                         entries: Seq[(String, String)]): Unit = {
    val fs = fsOf(spark, dest)
    fs.mkdirs(dest.getParent): Unit
    val out = fs.create(dest, false)
    try out.write(entries.sortBy(_._1)
      .map { case (v, r) => s"${enc(v)}\t${enc(r)}" }
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** A version's OWNED leaf dirs: `<pathName>=<value>` children of v=N. */
  private def ownedDirs(spark: SparkSession, tableDir: String, v: Int,
                        pathName: String): Seq[(String, String)] = {
    val root = new Path(s"$tableDir/v=$v")
    val fs = fsOf(spark, root)
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"$pathName="))
      .map { st =>
        val value = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .unescapePathName(st.getPath.getName.substring(pathName.length + 1))
        (value, s"v=$v/${st.getPath.getName}")
      }
  }

  /** Version `v`'s full partition map: (value → table-relative path),
    * owned dirs shadowing same-valued carries (they never coexist by
    * construction, but owned-wins is the safe order). */
  def resolvedPartitions(spark: SparkSession, tableDir: String,
                         v: Int): Seq[(String, String)] = {
    val level = levelOf(spark, tableDir)
    val carried = readCarry(spark, tableDir, v).toMap
    val owned = ownedDirs(spark, tableDir, v, level.pathName).toMap
    (carried ++ owned).toSeq.sortBy(_._1)
  }

  /** The version numbers a version's carries point into. */
  private def carryTargets(spark: SparkSession, tableDir: String,
                           v: Int): Set[Int] =
    readCarry(spark, tableDir, v).flatMap { case (_, rel) =>
      rel.split('/').headOption.filter(_.startsWith("v="))
        .flatMap(_.drop(2).toIntOption)
    }.toSet

  /** Every version a SURVIVING version still carries from — the expire
    * protection set (single-hop carries ⇒ no transitive walk needed, but
    * computed per survivor). */
  private[graft] def referencedVersions(spark: SparkSession, tableDir: String,
                                        survivors: Seq[Int]): Set[Int] =
    survivors.flatMap(carryTargets(spark, tableDir, _)).toSet

  /** Stage `df` in the spec's layout and commit it as the next version —
    * v=1 for a new table (records `_partspec` + `_partschema.json`), a
    * full materialized rewrite afterwards. */
  def writePartitioned(df: DataFrame, tableDir: String, spec: String): Int = {
    val spark = df.sparkSession
    val declared = df.schema
    val levels = PartitionedWorkspace.levelsOf(spec, declared)
    require(levels.length == 1 && !levels.head.inSchema,
      "partitioned snapshots take exactly one hidden transform " +
        "(days/hours/months/bucket); identity layouts route to the " +
        "partitioned workspace catalog")
    PartitionedWorkspace.validateLevels(declared, levels)
    partSpec(spark, tableDir).foreach(existing => require(existing == spec,
      s"$tableDir is already partitioned as '$existing'"))
    val next = graft.operators.Sinks.snapshotVersions(spark, tableDir)
      .lastOption.getOrElse(0) + 1
    val staging = new Path(tableDir,
      s".psnap_staging_${java.util.UUID.randomUUID().toString.take(8)}")
    val fs = fsOf(spark, staging)
    try {
      val targetRows = spark.conf
        .get("graft.repartition.targetRowsPerFile", "5000000").trim.toLong
      PartitionEvolution.stageLayoutWrite(
        spark, df, declared, levels, staging, targetRows)
      // markers BEFORE the pointer commit: a reader resolving the new
      // version must find the spec/schema (idempotent re-writes)
      writeSmall(spark, specPath(tableDir), spec)
      writeSmall(spark, schemaPath(tableDir), declared.json)
      val dest = new Path(s"$tableDir/v=$next")
      if (!fs.rename(staging, dest))
        throw new IllegalStateException(
          s"partitioned snapshot publish: rename $staging -> $dest failed")
      graft.operators.Sinks.commitSnapshotPointer(spark, tableDir, next)
      next
    } finally if (fs.exists(staging)) fs.delete(staging, true): Unit
  }

  /** ZERO-COPY partition retention: publish the next version as ONE carry
    * manifest naming every surviving partition — no data file is written,
    * no other partition's bytes are touched, and every pinned version
    * keeps serving its own content. `values` are the level's PATH values
    * (epoch days for `days()`, etc. — [[partitionValueOf]] maps a literal).
    * Returns the committed version (unchanged if nothing matched). */
  def dropPartitions(spark: SparkSession, tableDir: String,
                     values: Seq[String]): Int = {
    val committed = graft.operators.Sinks.snapshotCommitted(spark, tableDir)
      .getOrElse(throw new IllegalStateException(
        s"no committed snapshot at $tableDir"))
    val current = resolvedPartitions(spark, tableDir, committed)
    val drop = values.toSet
    if (!current.exists(e => drop.contains(e._1))) return committed
    val keep = current.filterNot(e => drop.contains(e._1))
    val next = graft.operators.Sinks.snapshotVersions(spark, tableDir)
      .lastOption.getOrElse(0) + 1
    // everything this version serves is a CARRY: owned dirs of the base
    // become single-hop refs into the base's folder
    writeCarry(spark, carryPath(tableDir, next), keep)
    graft.operators.Sinks.commitSnapshotPointer(spark, tableDir, next)
    next
  }

  /** The level's path value of a source-column literal (driver-side), for
    * building [[dropPartitions]] inputs from dates/timestamps/keys. */
  def partitionValueOf(spark: SparkSession, tableDir: String,
                       literal: Any): String =
    levelOf(spark, tableDir).valueOfLiteral(literal).getOrElse(
      throw new IllegalArgumentException(
        s"cannot map $literal onto the partition axis of $tableDir"))

  /** O(touched partitions + batch) ingest: the partitions the batch lands
    * in are rewritten (old content ∪ new rows, clustered); every other
    * partition rides a carry entry into wherever it already lives. */
  def appendRows(spark: SparkSession, tableDir: String, df: DataFrame): Int = {
    val committed = graft.operators.Sinks.snapshotCommitted(spark, tableDir)
      .getOrElse(throw new IllegalStateException(
        s"no committed snapshot at $tableDir"))
    val declared = declaredSchema(spark, tableDir)
    val level = levelOf(spark, tableDir)
    val shaped = df.select(declared.fieldNames.map(
      org.apache.spark.sql.functions.col).toIndexedSeq: _*)
    val touched: Set[String] = shaped
      .select(level.deriveColumn(org.apache.spark.sql.functions.col(
        level.sourceCol)).as("__p"))
      .distinct().collect()
      .map(r => PartitionedWorkspace.valueString(r.get(0))).toSet
    val current = resolvedPartitions(spark, tableDir, committed)
    val (old, carried) = current.partition(e => touched.contains(e._1))
    val oldRows =
      if (old.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], declared)
      else spark.read.schema(declared)
        .parquet(old.map(e => s"$tableDir/${e._2}"): _*)
    val next = graft.operators.Sinks.snapshotVersions(spark, tableDir)
      .lastOption.getOrElse(0) + 1
    val staging = new Path(tableDir,
      s".psnap_staging_${java.util.UUID.randomUUID().toString.take(8)}")
    val fs = fsOf(spark, staging)
    try {
      val targetRows = spark.conf
        .get("graft.repartition.targetRowsPerFile", "5000000").trim.toLong
      PartitionEvolution.stageLayoutWrite(spark, oldRows.unionByName(shaped),
        declared, Seq(level), staging, targetRows)
      writeCarry(spark, new Path(staging, "_carry"), carried)
      val dest = new Path(s"$tableDir/v=$next")
      if (!fs.rename(staging, dest))
        throw new IllegalStateException(
          s"partitioned snapshot publish: rename $staging -> $dest failed")
      graft.operators.Sinks.commitSnapshotPointer(spark, tableDir, next)
      next
    } finally if (fs.exists(staging)) fs.delete(staging, true): Unit
  }

  /** Row-level retention WITHIN partitions (r17): publish the next
    * version with the TOUCHED partitions rewritten to their surviving
    * rows and every other partition carried — O(touched partitions)
    * bytes, pinned history intact. Rows matching `cond` are REMOVED.
    * The discovery scan reads the resolved table once (parquet pushdown
    * applies); the WRITE is bounded by the touched partitions. Completes
    * the retention matrix: whole-partition drops are the zero-copy
    * [[dropPartitions]]; keyed O(keys) takedowns route to the flat
    * snapshot catalog's thin deletes. */
  def deleteRowsWhere(spark: SparkSession, tableDir: String,
                      cond: org.apache.spark.sql.Column): Int = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val committed = graft.operators.Sinks.snapshotCommitted(spark, tableDir)
      .getOrElse(throw new IllegalStateException(
        s"no committed snapshot at $tableDir"))
    val declared = declaredSchema(spark, tableDir)
    val level = levelOf(spark, tableDir)
    val full = read(spark, tableDir, Some(committed))
    val touchedVals: Set[String] = full.filter(coalesce(cond, lit(false)))
      .select(level.deriveColumn(col(level.sourceCol)).as("__p"))
      .distinct().collect()
      .map(r => PartitionedWorkspace.valueString(r.get(0))).toSet
    if (touchedVals.isEmpty) return committed
    val current = resolvedPartitions(spark, tableDir, committed)
    val (touched, carried) = current.partition(e => touchedVals(e._1))
    val survivors = spark.read.schema(declared)
      .parquet(touched.map(e => s"$tableDir/${e._2}"): _*)
      .filter(!coalesce(cond, lit(false)))
    val next = graft.operators.Sinks.snapshotVersions(spark, tableDir)
      .lastOption.getOrElse(0) + 1
    val staging = new Path(tableDir,
      s".psnap_staging_${java.util.UUID.randomUUID().toString.take(8)}")
    val fs = fsOf(spark, staging)
    try {
      val targetRows = spark.conf
        .get("graft.repartition.targetRowsPerFile", "5000000").trim.toLong
      PartitionEvolution.stageLayoutWrite(
        spark, survivors, declared, Seq(level), staging, targetRows)
      writeCarry(spark, new Path(staging, "_carry"), carried)
      val dest = new Path(s"$tableDir/v=$next")
      if (!fs.rename(staging, dest))
        throw new IllegalStateException(
          s"partitioned snapshot publish: rename $staging -> $dest failed")
      graft.operators.Sinks.commitSnapshotPointer(spark, tableDir, next)
      next
    } finally if (fs.exists(staging)) fs.delete(staging, true): Unit
  }

  /** INCREMENTAL CHANGES between two versions, computed from METADATA
    * down (r17): a carried partition keeps its exact table-relative path
    * across versions, so the per-step change set is confined to the
    * partitions whose PHYSICAL PATH differs between v-1 and v (rewritten,
    * added, or dropped) — the diff never reads an unchanged partition.
    * Returns `(fromV, toV]` step diffs as rows + `_change_type`
    * ('delete'|'insert') + `_version` (the step that made the change); an
    * UPDATE-shaped rewrite appears as delete+insert of the actually-
    * changed rows (`exceptAll` both ways — carried-over rows cancel).
    * This is the q236-style incremental-consumer contract on VERSIONED
    * date-sharded data: O(sum of changed partitions across the range),
    * never O(table × versions). */
  def changesBetween(spark: SparkSession, tableDir: String,
                     fromV: Int, toV: Int): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val committed = graft.operators.Sinks.snapshotCommitted(spark, tableDir)
      .getOrElse(throw new IllegalStateException(
        s"no committed snapshot at $tableDir"))
    require(fromV >= 1 && toV >= fromV && toV <= committed,
      s"changesBetween range ($fromV, $toV] must be within [1, $committed]")
    val declared = declaredSchema(spark, tableDir)
    def readDirs(rels: Seq[String]): DataFrame =
      if (rels.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], declared)
      else spark.read.schema(declared)
        .parquet(rels.map(r => s"$tableDir/$r"): _*)
    val steps = ((fromV + 1) to toV).map { v =>
      val prev = resolvedPartitions(spark, tableDir, v - 1).toMap
      val cur = resolvedPartitions(spark, tableDir, v).toMap
      val changed = (prev.keySet ++ cur.keySet)
        .filter(k => prev.get(k) != cur.get(k)).toSeq.sorted
      val pre = readDirs(changed.flatMap(prev.get))
      val post = readDirs(changed.flatMap(cur.get))
      pre.exceptAll(post).withColumn(PartitionChangeFeed.ChangeCol, lit("delete"))
        .unionByName(post.exceptAll(pre)
          .withColumn(PartitionChangeFeed.ChangeCol, lit("insert")))
        .withColumn("_version", lit(v))
    }
    if (steps.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        declared.add(PartitionChangeFeed.ChangeCol,
          org.apache.spark.sql.types.StringType)
          .add("_version", org.apache.spark.sql.types.IntegerType))
    else {
      // balanced union (the table_changes discipline): O(log steps) depth
      def fold(xs: Seq[DataFrame]): DataFrame =
        if (xs.lengthCompare(1) == 0) xs.head
        else fold(xs.grouped(2).map {
          case Seq(a, b) => a.unionByName(b)
          case Seq(a) => a
        }.toSeq)
      fold(steps)
    }
  }

  /** Read a version (committed pointer when None): the resolved partition
    * dirs under the declared schema. */
  def read(spark: SparkSession, tableDir: String,
           version: Option[Int] = None): DataFrame = {
    val v = version.orElse(
      graft.operators.Sinks.snapshotCommitted(spark, tableDir)).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $tableDir"))
    val declared = declaredSchema(spark, tableDir)
    val dirs = resolvedPartitions(spark, tableDir, v)
    if (dirs.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], declared)
    else spark.read.schema(declared)
      .parquet(dirs.map(e => s"$tableDir/${e._2}"): _*)
  }
}

/** The SQL face of a partitioned snapshot version: read-only (retention
  * and ingest are the explicit [[PartitionedSnapshot]] maintenance calls;
  * row-level DML routes to the keyed snapshot or partitioned workspace
  * catalogs), served through the pruned scan builder so source-column
  * predicates drop whole partition directories — across version folders —
  * before any footer is read. */
private[graft] class PartitionedSnapshotTable(
    tableName: String,
    spark: SparkSession,
    tableDir: String,
    version: Int)
  extends org.apache.spark.sql.connector.catalog.Table
  with org.apache.spark.sql.connector.catalog.SupportsRead {

  private lazy val declared = PartitionedSnapshot.declaredSchema(spark, tableDir)
  private lazy val level = PartitionedSnapshot.levelOf(spark, tableDir)

  override def name(): String = tableName
  override def schema(): StructType = declared
  override def partitioning():
      Array[org.apache.spark.sql.connector.expressions.Transform] =
    Array(level match {
      case DaysLevel(c, _) => org.apache.spark.sql.connector.expressions.Expressions.days(c)
      case HoursLevel(c) => org.apache.spark.sql.connector.expressions.Expressions.hours(c)
      case MonthsLevel(c, _) => org.apache.spark.sql.connector.expressions.Expressions.months(c)
      case BucketLevel(c, n) => org.apache.spark.sql.connector.expressions.Expressions.bucket(n, c)
      case IdentityLevel(c) => org.apache.spark.sql.connector.expressions.Expressions.identity(c)
    })
  override def capabilities():
      java.util.Set[org.apache.spark.sql.connector.catalog.TableCapability] =
    java.util.Set.of(
      org.apache.spark.sql.connector.catalog.TableCapability.BATCH_READ)

  override def newScanBuilder(
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap):
      org.apache.spark.sql.connector.read.ScanBuilder =
    new org.apache.spark.sql.graftbridge.PrunedParquetScanBuilder(
      tableName, spark, declared, options,
      filters => PartitionedSnapshot
        .resolvedPartitions(spark, tableDir, version)
        .collect { case (v, rel) if filters.forall(level.mayMatch(_, v)) =>
          s"$tableDir/$rel"
        })
}
