package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-wide registration of graft's native expressions:
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * makes `hashed_word_bigrams` / `sorted_intersect_count` available in
  * SQL on every session of the cluster — the standard
  * `SparkSessionExtensions` injection point (SURVEY §2.9 custom-
  * expression path (b)).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.GraftFunctions.descriptions.foreach(ext.injectFunction)
}
