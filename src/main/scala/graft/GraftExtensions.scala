package graft

import org.apache.spark.sql.SparkSessionExtensions

/** `spark.sql.extensions=graft.GraftExtensions` registers the geometry
  * function surface in every session; [[graft.functions.GraftFunctions
  * .register]] does the same imperatively. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // Function injection happens at session build; reuse the registry list.
    graft.functions.GraftFunctions.injectInto(ext)
  }
}
