package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join materializer — the reference's `pandas_to_features` join core
  * (`/root/reference/smartpy_arc/arc_utils.py:923-953`).
  *
  * Semantics reproduced:
  *  - single equi-key pair, probe side = the feature class, build side = the
  *    incoming dataframe;
  *  - `KEEP_COMMON` = inner, `KEEP_ALL` = left outer (`:936-947`);
  *  - output field names UNQUALIFIED (`TempQualifiedFields(False)`, `:948`):
  *    on name collision the probe side wins and the build-side duplicate is
  *    dropped — matching arcpy's CopyFeatures of a joined layer where the
  *    first-bound field keeps the short name.
  *
  * Scale notes: the reference manually builds an attribute index on the build
  * side (`AddIndex`, `:931`) — the moral equivalent of choosing a hash build
  * side. Here Catalyst/AQE picks broadcast-hash vs sort-merge from size
  * stats; callers can force a broadcast with `broadcast(attrs)` when the
  * build side is a small dimension.
  */
object Joins {
  sealed trait KeepMode { def joinType: String }
  case object KeepCommon extends KeepMode { val joinType = "inner" }
  case object KeepAll extends KeepMode { val joinType = "left" }

  def joinToFeatures(features: DataFrame,
                     attrs: DataFrame,
                     featureKey: String,
                     attrKey: String,
                     mode: KeepMode = KeepCommon): DataFrame = {
    // Unqualified-name policy: probe-side columns keep their names; build-side
    // columns that collide (other than the key) are dropped.
    val collisions = attrs.columns.toSet.intersect(features.columns.toSet) - attrKey
    val build = collisions.foldLeft(attrs)((d, c) => d.drop(c))
    val joined = features.join(build, features(featureKey) === build(attrKey), mode.joinType)
    // The reference's joined output carries both key columns (qualified as the
    // short names of each table); drop the build key if it duplicates a
    // probe-side name, else keep both.
    if (attrKey == featureKey) joined.drop(build(attrKey)) else joined
  }
}
