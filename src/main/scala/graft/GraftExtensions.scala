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
/** Also injects the store-procedure SQL surface
  * ([[graft.sql.GraftSqlParser]]): `DESCRIBE HISTORY` / `FSCK REPLICA`
  * / `COMPACT REPLICA` / `CLONE REPLICA … TO …` / `RESTORE REPLICA …
  * TO VERSION n` / `REFRESH CLONE …` run through `spark.sql(...)`
  * as eager commands delegating to the same [[graft.streaming
  * .CdcStream]] entry points as the Scala API; every other statement
  * falls through to Spark's parser unchanged.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.GraftFunctions.descriptions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.JaccardLengthFilter)
    ext.injectParser((_, delegate) => new graft.sql.GraftSqlParser(delegate))
  }
}
