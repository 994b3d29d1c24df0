package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-wide registration of graft's native expressions and
  * optimizer rules:
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * makes `hashed_word_bigrams` / `sorted_intersect_count` available in
  * SQL on every session of the cluster (SURVEY §2.9 custom-expression
  * path (b)) and injects the set-similarity length-filter rule
  * ([[graft.plans.JaccardLengthFilter]] — custom-plan path (c)): any
  * query phrasing a Jaccard threshold in the natural
  * `intersect / union >= t` form gets the AllPairs/PPJoin size-bound
  * prune prepended by the optimizer.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.GraftFunctions.descriptions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.JaccardLengthFilter)
  }
}
