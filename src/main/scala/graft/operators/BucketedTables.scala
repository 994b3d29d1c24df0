package graft.operators

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.llm.IndexArtifacts

/** Pre-bucketed join tables — the storage-layout half of the brief's
  * "repartition()/bucketing for co-located joins".
  *
  * A fact⋈fact equi-join normally shuffles BOTH sides on the join key
  * every time it runs; at 100 TB that repeated shuffle dominates every
  * pipeline that joins the same tables more than once. The production
  * fix is to pay the shuffle ONCE at ingest: write both tables
  * hash-bucketed (and per-file sorted) by the join key with the same
  * bucket count, so every subsequent join is co-located — each task
  * merge-joins bucket i of one table against bucket i of the other and
  * the plan carries NO exchange on either side (bucket count caps the
  * join parallelism; at scale you bucket into O(cluster cores)).
  *
  * Spark's mechanism for this is the catalog (`bucketBy` +
  * `saveAsTable` — bucketing metadata lives in the table definition,
  * not the parquet files), so unlike the plain-parquet artifacts these
  * register session tables. Built once per (JVM, corpus state) through
  * [[IndexArtifacts.cachedPath]]; a later session reusing the JVM cache
  * re-registers by rebuilding (rare, bounded, recorded in build
  * seconds).
  */
object BucketedTables {

  /** Bench-scale bucket count; at 100 TB this becomes O(cluster cores). */
  val NumBuckets = 16

  private def name(prefix: String, path: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(path.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    s"${prefix}_$h"
  }

  /** Ensure the bucketed `lineitem`/`orders` twins for `dir` exist and
    * return their catalog table names.
    */
  def ensure(s: SparkSession, dir: String): (String, String) = {
    val path = IndexArtifacts.cachedPath(dir, "bucketed-join-tables") { out =>
      build(s, dir, out)
    }
    val (ln, on) =
      (name("graft_bkt_lineitem", path), name("graft_bkt_orders", path))
    // the files exist but this session has never seen the tables (new
    // session on a warm JVM cache): re-register with bucket-spec DDL
    // over the EXISTING files — never a data rewrite (a rewrite would
    // clobber files a live session's registered tables are scanning),
    // and serialized so concurrent late-registering sessions/threads
    // don't interleave the check with the create
    registerLock.synchronized {
      register(s, ln, s"$path/lineitem", "l_orderkey")
      register(s, on, s"$path/orders", "o_orderkey")
    }
    (ln, on)
  }

  private val registerLock = new Object

  private def register(s: SparkSession, table: String, loc: String,
      key: String): Unit =
    if (!s.catalog.tableExists(table)) {
      val schema = s.read.parquet(loc).schema.toDDL
      s.sql(s"CREATE TABLE IF NOT EXISTS $table ($schema) USING parquet " +
        s"CLUSTERED BY ($key) SORTED BY ($key) INTO $NumBuckets BUCKETS " +
        s"LOCATION '$loc'")
    }

  private def build(s: SparkSession, dir: String, out: String): Unit = {
    val t = Tables(s, dir)
    t.lineitem.select("l_orderkey", "l_extendedprice", "l_discount")
      .write.bucketBy(NumBuckets, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$out/lineitem").mode("overwrite")
      .saveAsTable(name("graft_bkt_lineitem", out))
    t.orders.select("o_orderkey", "o_orderstatus")
      .write.bucketBy(NumBuckets, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$out/orders").mode("overwrite")
      .saveAsTable(name("graft_bkt_orders", out))
  }
}
