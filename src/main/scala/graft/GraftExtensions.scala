package graft

import org.apache.spark.sql.SparkSessionExtensions

/** `spark.sql.extensions=graft.GraftExtensions` registers the geometry
  * function surface in every session ([[graft.functions.GraftFunctions
  * .register]] does the function half imperatively) and injects the
  * spatial-filter pushdown rule — st_intersects_bbox filters over graft
  * feature scans become scan-level bbox options served by the format's
  * native index (FGB packed R-tree, shapefile record boxes). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // Function injection happens at session build; reuse the registry list.
    graft.functions.GraftFunctions.injectInto(ext)
    ext.injectOptimizerRule(s => new graft.plans.BboxPushdownRule(s))
  }
}
