package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.DataSourceStrategy
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.FileScanBuilder
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Path-pruning scan builder: the pushed predicates first prune the scan's
  * PATH LIST on the driver through the caller-supplied `prune` function
  * (file-manifest stats skipping, hidden-partition day-range pruning),
  * then a genuine `ParquetScanBuilder` is constructed over only the
  * surviving paths and the SAME catalyst filters replay into it — so
  * row-group pushdown, column pruning, vectorization and the
  * `PushedFilters` plan surface are all Spark's own, and every predicate
  * re-applies post-scan exactly as with an unpruned parquet scan. The
  * `prune` contract: drop a path ONLY when the pushed conjunction is
  * provably false for every row under it (skipping is an optimization,
  * never the correctness path).
  *
  * Lives in this bridge package because the catalyst-filter pushdown
  * surface of file sources (`SupportsPushDownCatalystFilters`,
  * `FileScanBuilder.pushFilters`) is `private[sql]` — the same
  * re-exporting escape hatch [[Bridge]] documents; no Spark internals are
  * modified.
  *
  * Ordering contract (matches `V2ScanRelationPushDown`): `pushFilters`
  * runs before `pruneColumns` before `build()`. The inner builder is
  * created on FIRST use so a filter-less scan (no `pushFilters` call, or
  * an empty one) still serves every path. A zero-survivor prune still
  * builds a real scan: the declared schema makes an empty path list
  * plannable (no footer inference) and the scan plans zero partitions. */
class PrunedParquetScanBuilder(
    tableName: String,
    spark: SparkSession,
    declared: StructType,
    options: CaseInsensitiveStringMap,
    prune: Seq[org.apache.spark.sql.sources.Filter] => Seq[String])
  extends ScanBuilder with SupportsPushDownCatalystFilters
  with SupportsPushDownRequiredColumns {

  private var inner: FileScanBuilder = _

  private def ensureInner(filters: Seq[Expression]): FileScanBuilder = {
    if (inner == null) {
      val v1 = filters.flatMap(e =>
        DataSourceStrategy.translateFilter(e, supportNestedPredicatePushdown = true))
      inner = ParquetTable(tableName, spark, options, prune(v1), Some(declared),
        classOf[ParquetFileFormat]).newScanBuilder(options)
    }
    inner
  }

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] =
    ensureInner(filters).pushFilters(filters)

  override def pushedFilters: Array[Predicate] =
    ensureInner(Nil).pushedFilters

  override def pruneColumns(requiredSchema: StructType): Unit =
    ensureInner(Nil).pruneColumns(requiredSchema)

  override def build(): Scan = ensureInner(Nil).build()
}

/** [[PrunedParquetScanBuilder]] specialized to snapshot file manifests:
  * the surviving paths come from [[graft.sources.ManifestPrune.keptFiles]]
  * over `_manifest/v=N`'s per-file min/max stats. DEFENSE IN DEPTH: an
  * unreadable/corrupt manifest falls back to the FULL version directory
  * (unpruned planning, always correct) instead of failing every read —
  * the manifest is an optimization, never the correctness path. */
class ManifestPrunedScanBuilder(
    tableName: String,
    spark: SparkSession,
    tableDir: String,
    version: Int,
    declared: StructType,
    options: CaseInsensitiveStringMap)
  extends PrunedParquetScanBuilder(tableName, spark, declared, options,
    filters =>
      try graft.sources.ManifestPrune
        .keptFiles(spark, tableDir, version, filters)._1
      catch {
        case scala.util.control.NonFatal(e) =>
          org.slf4j.LoggerFactory
            .getLogger(classOf[ManifestPrunedScanBuilder]).warn(
              s"manifest read for $tableDir v=$version failed; serving the " +
                s"FULL version unpruned (delete _manifest/v=$version or " +
                s"rewrite with writeSnapshotWithManifest)", e)
          Seq(s"$tableDir/v=$version")
      })
