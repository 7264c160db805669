package graft.sources

import scala.collection.mutable
import scala.jdk.CollectionConverters._
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.ProjectingInternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.connector.catalog.{SupportsDelete, SupportsRowLevelOperations, TableCapability}
import org.apache.spark.sql.connector.expressions.{Expressions, Literal, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, Scan, ScanBuilder, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, V1Write, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Hadoop `Configuration` is not `java.io.Serializable`; this is the
  * standard 12-line envelope (the same shape Spark uses internally) so a
  * write-task factory can carry the job conf to executors. */
private[sources] class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration)
  extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

private[sources] object PartitionedWorkspace {
  /** Partition value → canonical path fragment value (pre-escaping). */
  def valueString(v: Any): String = v match {
    case u: org.apache.spark.unsafe.types.UTF8String => u.toString
    case other => String.valueOf(other)
  }

  def partDirName(partCol: String, v: String): String =
    s"$partCol=${ExternalCatalogUtils.escapePathName(v)}"

  /** Extract the partition values a runtime group filter pins: the
    * translated V2 runtime filter arrives as `partCol IN (v1..vn)` (or a
    * single `=`). Unparseable input returns None — the scan then keeps
    * every partition, which is always CORRECT (just not minimal). */
  def predicateValues(predicates: Array[Predicate],
                      partCol: String): Option[Seq[String]] = {
    def refOk(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
      e match {
        case r: NamedReference =>
          r.fieldNames().length == 1 &&
            r.fieldNames()(0).equalsIgnoreCase(partCol)
        case _ => false
      }
    val sets = predicates.toSeq.flatMap { p =>
      val ch = p.children()
      p.name() match {
        case "IN" if ch.nonEmpty && refOk(ch.head) &&
            ch.tail.forall(_.isInstanceOf[Literal[_]]) =>
          Some(ch.tail.map(l =>
            valueString(l.asInstanceOf[Literal[_]].value)).toSeq)
        case "=" if ch.length == 2 && refOk(ch(0)) &&
            ch(1).isInstanceOf[Literal[_]] =>
          Some(Seq(valueString(ch(1).asInstanceOf[Literal[_]].value)))
        case _ => None
      }
    }
    if (sets.isEmpty) None
    else Some(sets.reduce((a, b) => a.intersect(b)).distinct)
  }
}

/** A PARTITIONED workspace table — hive layout `<dir>/<col>=<val>/files`,
  * one top-level string/int/long partition column, partition col stored in
  * the directory name (never in data files). What it buys at 100 TB over
  * the flat [[GraftWorkspaceTable]]:
  *
  *  - READS partition-prune for free (Spark's own
  *    `PartitioningAwareFileIndex`; the declared schema rides as the user
  *    schema, so types are exact) — a `WHERE source='x'` scan opens one
  *    directory.
  *  - ROW-LEVEL DML is PARTITION-GRAINED, not table-grained: the COW
  *    operation's scan implements `SupportsRuntimeV2Filtering` on the
  *    partition column, so Spark's own
  *    `RowLevelOperationRuntimeGroupFiltering` runs the group-filter
  *    subquery (matched partitions of the command's condition) and the
  *    rewrite reads, rewrites and republishes ONLY those partitions —
  *    `UPDATE t SET ... WHERE source='x'` rewrites one directory and every
  *    other partition's files keep their mtimes (spec-pinned).
  *  - translatable `DELETE` takes a direct per-partition rewrite (matched
  *    partitions found with a pruned scan; each rewritten independently).
  *  - `INSERT INTO` appends hive-partitioned via the V1 write path
  *    (`partitionBy` + Spark's own dynamic-partition writer).
  *
  * Non-atomicity is the flat table's same single-writer contract, widened
  * honestly: a partitioned publish is per-partition renames (retire read
  * partitions, move staged ones in); a crash mid-publish leaves the staged
  * data intact for hand recovery. ALTER TABLE on partitioned tables is
  * rejected (the declared schema keeps the partition column LAST — the
  * canonical hive order the write path and the file index agree on). */
private[sources] class PartitionedWorkspaceTable(
    tableName: String,
    spark: SparkSession,
    dir: String,
    declaredFull: StructType,
    val partCol: String)
  extends org.apache.spark.sql.connector.catalog.Table
  with org.apache.spark.sql.connector.catalog.SupportsRead
  with org.apache.spark.sql.connector.catalog.SupportsWrite
  with SupportsDelete with SupportsRowLevelOperations {

  require(declaredFull.fieldNames.last == partCol,
    s"declared schema must keep partition column $partCol last (canonical hive order)")
  private val partType = declaredFull(partCol).dataType
  require(Seq(StringType, IntegerType, LongType).contains(partType),
    s"partition column must be string/int/long, got $partType")

  private[sources] def tableDir: String = dir
  private def fsOf(p: Path) = p.getFileSystem(spark.sessionState.newHadoopConf())

  /** Data-file schema: declared minus the partition column (hive layout
    * stores it in the directory name; a copy inside the file would be a
    * duplicate-column read error). */
  private[sources] def fileSchema: StructType =
    StructType(declaredFull.fields.filterNot(_.name == partCol))

  private[sources] def declaredSchemaFull: StructType = declaredFull

  override def name(): String = tableName
  override def schema(): StructType = declaredFull
  override def partitioning():
      Array[org.apache.spark.sql.connector.expressions.Transform] =
    Array(Expressions.identity(partCol))

  /** COMPOSITION, not inheritance, deliberately: Spark's
    * `FallBackFileSourceV2` rule rewrites INSERT on any `FileTable` into a
    * V1 flat-directory insert — which would write root-level files and
    * corrupt the hive layout. A plain `Table` keeps INSERT on the V2 path,
    * where [[newWriteBuilder]]'s `V1Write` runs Spark's own partitioned
    * writer; READS still delegate to a genuine `ParquetTable` scan builder
    * (full pushdown, pruning, vectorization). */
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.Set.of(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.OVERWRITE_BY_FILTER, TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new java.util.HashMap[String, String](options.asCaseSensitiveMap())
    merged.put("spark.sql.parquet.fieldId.read.enabled", "true"): Unit
    val opts = new CaseInsensitiveStringMap(merged)
    ParquetTable(tableName, spark, opts, Seq(dir), Some(declaredFull),
      classOf[ParquetFileFormat]).newScanBuilder(opts)
  }

  /** Full-table DataFrame through the V1 reader (user schema ⇒ exact
    * partition-column type; hive dirs ⇒ partition pruning on filters). */
  private def readFull(): DataFrame =
    spark.read.schema(declaredFull).parquet(dir)

  private[sources] def stagingPath(): Path = {
    val real = new Path(dir)
    new Path(real.getParent,
      s".${real.getName}.__cow_${java.util.UUID.randomUUID().toString.take(8)}")
  }

  private[sources] def dropStaging(staging: Path): Unit = {
    val f = fsOf(staging)
    if (f.exists(staging)) f.delete(staging, true): Unit
  }

  private def partitionDirs(): Seq[Path] = {
    val root = new Path(dir)
    val f = fsOf(root)
    if (!f.exists(root)) Nil
    else f.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"$partCol="))
      .map(_.getPath)
  }

  /** Retired-partition parking spot: a DOT-PREFIXED sibling (invisible to
    * Spark's file index) tagged so [[repairRetiredPartitions]] can map it
    * back to its original directory after a crash. */
  private def retiredPath(pdir: Path, tag: String): Path =
    new Path(pdir.getParent, s".${pdir.getName}.__retired_$tag")

  /** Crash recovery for the rename-based publish: a `.<part>.__retired_*`
    * sibling whose original directory is MISSING marks a crash between
    * retire and publish — rename it back (the table reads its
    * pre-statement content again). One whose original EXISTS marks a crash
    * after the staged replacement moved in — the retired copy is the only
    * leftover step, delete it. Idempotent; invoked on catalog load and at
    * the head of every publish. */
  private[sources] def repairRetiredPartitions(): Unit = {
    val root = new Path(dir)
    val f = fsOf(root)
    if (!f.exists(root)) return
    f.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(".") &&
        st.getPath.getName.contains(".__retired_"))
      .foreach { st =>
        val nm = st.getPath.getName
        val orig = nm.substring(1, nm.lastIndexOf(".__retired_"))
        val dest = new Path(dir, orig)
        if (f.exists(dest)) f.delete(st.getPath, true): Unit
        else if (!f.rename(st.getPath, dest))
          throw new IllegalStateException(
            s"partition repair: could not restore $nm to $orig")
      }
  }

  /** Partition-grained publish: retire the partitions the operation READ
    * (its groups), then move every staged partition directory in — a
    * staged dir for an unread partition (MERGE INSERT rows, an UPDATE
    * moving rows across partitions) APPENDS its files instead (file names
    * are task-unique). Untouched partitions are never listed, never
    * opened, never re-stamped.
    *
    * Crash-safe by construction: retirement is a RENAME aside (never a
    * delete), the staged replacements move in, and the retired copies
    * delete LAST — at no instant does only one copy of a partition's rows
    * exist in a destroyable place. Any failure past the first retire
    * leaves BOTH the staging directory and the retired copies on disk;
    * [[repairRetiredPartitions]] restores the pre-statement table on the
    * next load. `readVals == Some(Nil)` (the runtime group filter matched
    * NO partitions) retires nothing — staged directories, if any, are
    * MERGE INSERT rows for a zero-match target and still append. */
  private[sources] def publishPartitioned(staging: Path,
                                          readVals: Option[Seq[String]]): Unit = {
    val f = fsOf(staging)
    repairRetiredPartitions()
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val toRetire = (readVals match {
      case Some(vs) => vs.map(v =>
        new Path(dir, PartitionedWorkspace.partDirName(partCol, v)))
      case None => partitionDirs()
    }).filter(f.exists)
    val retired = toRetire.map { p =>
      val aside = retiredPath(p, tag)
      if (!f.rename(p, aside))
        throw new IllegalStateException(
          s"partitioned DML commit: could not retire $p (table intact; " +
            s"staging left at $staging)")
      aside
    }
    if (f.exists(staging)) f.listStatus(staging).toSeq
      .filter(_.isDirectory).foreach { st =>
        val dest = new Path(dir, st.getPath.getName)
        if (!f.exists(dest)) {
          if (!f.rename(st.getPath, dest))
            throw new IllegalStateException(
              s"partitioned DML commit: could not publish ${st.getPath} — " +
                s"staging and retired copies left for recovery")
        } else f.listStatus(st.getPath).foreach { file =>
          if (!f.rename(file.getPath, new Path(dest, file.getPath.getName)))
            throw new IllegalStateException(
              s"partitioned DML commit: could not move ${file.getPath} — " +
                s"staging and retired copies left for recovery")
        }
      }
    // point of no return passed: every staged partition is live — retired
    // copies and staging scaffolding delete last (a failure here leaves
    // only ignorable debris that repair/janitors clear)
    retired.foreach(p => f.delete(p, true): Unit)
    f.delete(staging, true): Unit
    spark.catalog.refreshByPath(dir)
  }

  // ---- INSERT (V1 write fallback: Spark's own partitioned writer) ---------

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with org.apache.spark.sql.connector.write.SupportsOverwrite {
      private var overwriteAll = false
      override def truncate(): WriteBuilder = { overwriteAll = true; this }
      override def overwrite(filters: Array[sources.Filter]): WriteBuilder = {
        require(filters.forall(_.isInstanceOf[sources.AlwaysTrue]),
          "partitioned workspace tables support full INSERT OVERWRITE only " +
            "(static mode); partition-grained replacement is the DML path")
        overwriteAll = true; this
      }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = {
              // declared order (partCol last) with declared field-id
              // metadata re-stamped onto every written file. NULL partition
              // values are rejected IN the write pass: Spark would land
              // them in a __HIVE_DEFAULT_PARTITION__ dir that the DML
              // paths can neither match nor rewrite.
              val cols = declaredFull.fields.map { fd =>
                val c =
                  if (fd.name == partCol)
                    when(col(fd.name).isNull, raise_error(lit(
                      s"INSERT into partitioned table: NULL in partition " +
                        s"column $partCol")).cast(fd.dataType))
                      .otherwise(col(fd.name))
                  else col(fd.name)
                c.as(fd.name, fd.metadata)
              }
              val mode = if (overwrite || overwriteAll) "overwrite" else "append"
              data.select(cols.toIndexedSeq: _*)
                .write.partitionBy(partCol).mode(mode).parquet(dir)
              spark.catalog.refreshByPath(dir)
            }
          }
      }
    }

  // ---- translatable DELETE: direct per-partition rewrite ------------------

  override def canDeleteWhere(filters: Array[sources.Filter]): Boolean =
    filters.forall(WorkspaceDml.toColumn(_).isDefined)

  override def deleteWhere(filters: Array[sources.Filter]): Unit = {
    repairRetiredPartitions()
    val cond = filters.flatMap(WorkspaceDml.toColumn)
      .reduceOption(_ && _).getOrElse(lit(true))
    val full = readFull()
    // matched partitions via a PRUNED scan (a partition-column predicate
    // in `cond` never lists the other directories)
    val touched = full.filter(coalesce(cond, lit(false)))
      .select(partCol).distinct().collect()
      .map(r => PartitionedWorkspace.valueString(r.get(0)))
    val fileCols = fileSchema.fieldNames.map(col).toIndexedSeq
    touched.foreach { v =>
      val pdir = new Path(dir, PartitionedWorkspace.partDirName(partCol, v))
      val keep = full
        .filter(col(partCol) === lit(v).cast(partType))
        .filter(!coalesce(cond, lit(false)))
        .select(fileCols: _*)
      val staging = stagingPath()
      val f = fsOf(pdir)
      val aside = retiredPath(pdir,
        java.util.UUID.randomUUID().toString.take(8))
      // survivor copy FIRST, retire by RENAME second, replacement third,
      // retired delete LAST — a failure at any step leaves at least one
      // complete copy of the partition's surviving rows on disk. Staging
      // is dropped ONLY for failures before the retire; past it, staging
      // and the retired copy both stay for recovery
      // ([[repairRetiredPartitions]] restores pre-statement content).
      if (keep.isEmpty) {
        // partition fully deleted — retire, then drop the retired copy
        if (f.exists(pdir)) {
          if (!f.rename(pdir, aside))
            throw new IllegalStateException(s"DELETE: could not retire $pdir")
          f.delete(aside, true): Unit
        }
      } else {
        try keep.write.parquet(staging.toString)
        catch { case e: Throwable => dropStaging(staging); throw e }
        if (f.exists(pdir) && !f.rename(pdir, aside)) {
          dropStaging(staging)
          throw new IllegalStateException(s"DELETE: could not retire $pdir")
        }
        if (!f.rename(staging, pdir))
          throw new IllegalStateException(
            s"DELETE: could not publish $staging — staging and retired " +
              s"copy $aside left for recovery")
        f.delete(aside, true): Unit
      }
    }
    spark.catalog.refreshByPath(dir)
  }

  // ---- group-based COW with partition-grained groups ----------------------

  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    new RowLevelOperationBuilder {
      override def build(): RowLevelOperation =
        new PartitionedCowOperation(PartitionedWorkspaceTable.this, info.command())
    }
}

/** Partition-grained copy-on-write: the scan exposes the partition column
  * for runtime group filtering, the write lands hive-partitioned files in
  * a staging dir (one parquet `OutputWriter` per (task, partition value)),
  * and the commit republishes exactly the partitions the scan read. */
private[sources] class PartitionedCowOperation(
    table: PartitionedWorkspaceTable, cmd: Command) extends RowLevelOperation {

  /** Partition values the runtime group filter pinned; None = the filter
    * never engaged, so the group set is every partition. Written on the
    * driver during scan filtering, read on the driver at commit. */
  @volatile private[sources] var readValues: Option[Seq[String]] = None

  override def command(): Command = cmd
  override def description(): String =
    s"graft partitioned COW $cmd (${table.name})"

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new PartitionScopedScan(table, PartitionedCowOperation.this)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def description(): String =
          s"graft partitioned COW $cmd write (${table.name})"
        override def toBatch: BatchWrite =
          new PartitionedCowBatchWrite(table, PartitionedCowOperation.this, info)
      }
    }
}

/** The operation scan: a full-fidelity parquet scan (vectorized, columnar)
  * over either every partition or — once the runtime group filter calls
  * [[filter]] — only the matched partition directories (`basePath` keeps
  * the partition column alive in the narrowed read). NO data-filter
  * pushdown, deliberately: parquet row-group pruning is inexact, and a
  * dropped survivor row would vanish from the rewritten partition. Path
  * restriction is exact by construction (whole directories). */
private class PartitionScopedScan(table: PartitionedWorkspaceTable,
                                  op: PartitionedCowOperation)
  extends Scan with SupportsRuntimeV2Filtering {

  private def innerScan(paths: Seq[String]): Scan = {
    val opts = new CaseInsensitiveStringMap(
      java.util.Map.of("basePath", table.tableDir,
        "spark.sql.parquet.fieldId.read.enabled", "true"))
    ParquetTable(s"${table.name}__cowscan", SparkSession.active, opts,
      if (paths.isEmpty) Seq(table.tableDir) else paths,
      Some(table.declaredSchemaFull), classOf[ParquetFileFormat])
      .newScanBuilder(opts).build()
  }

  @volatile private var current: Scan = innerScan(Nil)

  override def readSchema(): StructType = current.readSchema()
  override def toBatch: Batch = current.toBatch
  override def description(): String =
    s"${table.name} partition-scoped COW scan"
  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    current.columnarSupportMode()

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column(table.partCol))

  override def filter(predicates: Array[Predicate]): Unit =
    PartitionedWorkspace.predicateValues(predicates, table.partCol).foreach { vs =>
      op.readValues = Some(vs)
      val hconf = SparkSession.active.sessionState.newHadoopConf()
      val existing = vs.map(v => new Path(table.tableDir,
          PartitionedWorkspace.partDirName(table.partCol, v)))
        .filter(p => p.getFileSystem(hconf).exists(p))
        .map(_.toString)
      // an EMPTY pinned set (the command's condition matched no partition,
      // or every pinned directory is already gone) must plan ZERO input —
      // innerScan's paths.isEmpty fallback reads the WHOLE table, and a
      // zero-match UPDATE/MERGE would then restage every row as a "copy"
      // that publishPartitioned APPENDS next to the originals (readVals
      // retires nothing), silently duplicating the table
      current =
        if (existing.isEmpty) new EmptyPartitionScan(table)
        else innerScan(existing)
    }
}

/** The zero-group scan: the runtime group filter pinned NO partitions, so
  * the rewrite's copy side reads nothing at all (MERGE INSERT rows still
  * flow — they come from the source side, not this scan). */
private class EmptyPartitionScan(table: PartitionedWorkspaceTable) extends Scan {
  override def readSchema(): StructType = table.declaredSchemaFull
  override def description(): String =
    s"${table.name} partition-scoped COW scan (zero matched partitions)"
  override def toBatch: Batch = new Batch {
    override def planInputPartitions():
        Array[org.apache.spark.sql.connector.read.InputPartition] = Array.empty
    override def createReaderFactory():
        org.apache.spark.sql.connector.read.PartitionReaderFactory =
      new org.apache.spark.sql.connector.read.PartitionReaderFactory {
        override def createReader(
            p: org.apache.spark.sql.connector.read.InputPartition):
            org.apache.spark.sql.connector.read.PartitionReader[InternalRow] =
          throw new IllegalStateException(
            "zero-partition scan planned no input; nothing to read")
      }
  }
}

private case object PartitionedCowCommit extends WriterCommitMessage

/** Driver-side write: prepare Spark's own parquet `OutputWriterFactory`
  * once (job conf carries the write support schema), fan it out to tasks,
  * and commit by republishing the read partitions from staging. */
private class PartitionedCowBatchWrite(table: PartitionedWorkspaceTable,
                                       op: PartitionedCowOperation,
                                       info: LogicalWriteInfo) extends BatchWrite {
  private val spark = SparkSession.active
  private val staging = table.stagingPath()
  private val writeSchema = info.schema()
  private val partOrdinal = writeSchema.fieldIndex(table.partCol)
  private val fileSchema = WorkspaceDml.mergeFieldIds(
    StructType(writeSchema.filterNot(_.name == table.partCol)),
    Some(table.fileSchema))

  override def createBatchWriterFactory(p: PhysicalWriteInfo): DataWriterFactory = {
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val owf = new ParquetFileFormat()
      .prepareWrite(spark, job, Map.empty, fileSchema)
    new PartitionedCowWriterFactory(staging.toString, table.partCol,
      partOrdinal, writeSchema, fileSchema, owf,
      new SerializableHadoopConf(job.getConfiguration))
  }

  override def commit(msgs: Array[WriterCommitMessage]): Unit =
    table.publishPartitioned(staging, op.readValues)

  override def abort(msgs: Array[WriterCommitMessage]): Unit =
    table.dropStaging(staging)
}

/** Executor-side: route each row to a parquet `OutputWriter` keyed by its
  * partition value (one file per (task, value) — the value set is the
  * touched-partition set, driver-bounded). Rows may arrive tagged with the
  * rewrite's leading `__row_operation` INT (see
  * [[OpStrippingWriterFactory]]'s scaladoc) — stripped the same way. The
  * partition column itself is projected OUT of the stored row. */
private class PartitionedCowWriterFactory(
    stagingDir: String,
    partCol: String,
    partOrdinal: Int,
    writeSchema: StructType,
    fileSchema: StructType,
    owf: OutputWriterFactory,
    conf: SerializableHadoopConf) extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val ctx = new TaskAttemptContextImpl(conf.value,
        new TaskAttemptID(new TaskID(new JobID("graft_cow", 0),
          TaskType.MAP, partitionId), 0))
      private val ext = owf.getFileExtension(ctx)
      private val n = writeSchema.length
      private lazy val tagProj =
        ProjectingInternalRow(writeSchema, (1 to n).toIndexedSeq)
      private val fileProj = ProjectingInternalRow(fileSchema,
        writeSchema.indices.filterNot(_ == partOrdinal).toIndexedSeq)
      private val partType = writeSchema(partOrdinal).dataType
      private val writers = mutable.Map.empty[String, OutputWriter]

      override def write(row: InternalRow): Unit = {
        val r0 =
          if (row.numFields == n) row
          else {
            require(row.numFields == n + 1,
              s"COW write expected $n or ${n + 1} fields, got ${row.numFields}")
            tagProj.project(row)
            tagProj
          }
        require(!r0.isNullAt(partOrdinal),
          s"NULL partition value in $partCol — partitioned workspace tables " +
            "require non-null partition keys")
        val v = partType match {
          case StringType => r0.getUTF8String(partOrdinal).toString
          case IntegerType => r0.getInt(partOrdinal).toString
          case LongType => r0.getLong(partOrdinal).toString
          case other => throw new IllegalStateException(s"unsupported $other")
        }
        val w = writers.getOrElseUpdate(v, {
          val dirName = PartitionedWorkspace.partDirName(partCol, v)
          val file = s"$stagingDir/$dirName/part-$partitionId-$taskId-" +
            s"${java.util.UUID.randomUUID().toString.take(8)}$ext"
          owf.newInstance(file, fileSchema, ctx)
        })
        fileProj.project(r0)
        w.write(fileProj)
      }

      override def commit(): WriterCommitMessage = {
        writers.values.foreach(_.close()); PartitionedCowCommit
      }

      /** A failed attempt must leave NOTHING in the shared staging dir:
        * Spark retries failed/speculative tasks, and the retry writes its
        * own attempt-unique files — orphaned files from this attempt would
        * be published alongside them (silent duplicate rows). */
      override def abort(): Unit = writers.values.foreach { w =>
        try w.close() catch { case scala.util.control.NonFatal(_) => () }
        try {
          val p = new org.apache.hadoop.fs.Path(w.path())
          p.getFileSystem(conf.value).delete(p, false): Unit
        } catch { case scala.util.control.NonFatal(_) => () }
      }
      override def close(): Unit = ()
    }
}
