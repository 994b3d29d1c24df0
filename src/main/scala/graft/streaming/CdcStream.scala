package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Consumer-side surface for the CDC envelope stream: typed expansion
  * of the `value: String` JSON envelopes, and the upsert
  * materialization pattern the reference delegates to delta-plus
  * (README.md:88-99 — `syncType=binlog`, `idCols`).
  */
object CdcStream {

  /** Envelope schema parameterized by the per-table row schema — the
    * pair (`schema` JSON, `rows`) is designed for `from_json`
    * consumption (SURVEY.md §2.7).
    */
  def envelopeSchema(rowSchema: StructType): StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("timestamp", LongType),
    StructField("databaseName", StringType),
    StructField("tableName", StringType),
    StructField("schema", StringType),
    StructField("rows", ArrayType(rowSchema))))

  /** Expand a `value: String` envelope stream into typed columns:
    * op/timestamp/db/table + one output row per changed row. Pure
    * Catalyst (`from_json` + `explode`) — codegen'd, no UDF.
    */
  def parsed(envelopes: DataFrame, rowSchema: StructType): DataFrame = {
    val e = envelopes
      .select(from_json(col("value"), envelopeSchema(rowSchema)).as("e"))
      .select(
        col("e.type").as("op"),
        col("e.timestamp").as("ts_ms"),
        col("e.databaseName").as("databaseName"),
        col("e.tableName").as("tableName"),
        explode(col("e.rows")).as("row"))
    rowSchema.fieldNames.foldLeft(e) { (d, f) => d.withColumn(f, col(s"row.$f")) }
      .drop("row")
  }

  /** Reduce a CDC micro-batch to its net effect: the last op per key in
    * (orderCol, then any total tiebreak already baked into orderCol)
    * order — the reference's per-key MAX(offset) semantics
    * (OriginalSourceServerInExecutor.scala:123-150).
    */
  def lastOpPerKey(batch: DataFrame, idCols: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(idCols.map(col): _*).orderBy(orderCols.map(_.desc): _*)
    batch.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Apply one CDC micro-batch to a parquet-backed replica (idCols
    * upsert + delete) — `foreachBatch` body reproducing the reference's
    * downstream `MERGE` pattern. At production scale the same logic
    * targets a Delta/Iceberg MERGE; the parquet swap here keeps the
    * test environment dependency-free.
    */
  def applyBatchToReplica(
      replicaDir: String,
      batch: DataFrame,
      idCols: Seq[String],
      orderCols: Seq[Column],
      opCol: String = "op"): Unit = {
    val spark = batch.sparkSession
    val net = lastOpPerKey(batch, idCols, orderCols)
    val dataCols = batch.columns.filterNot(_ == opCol)
    val upserts = net.filter(col(opCol) =!= "delete").select(dataCols.map(col): _*)
    val keys = net.select(idCols.map(col): _*)

    val dir = new java.io.File(replicaDir)
    val merged =
      if (dir.exists() && dir.listFiles() != null && dir.listFiles().nonEmpty) {
        val replica = spark.read.parquet(replicaDir)
        replica.join(broadcast(keys), idCols, "left_anti").unionByName(upserts)
      } else upserts

    val tmp = replicaDir + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    // atomic-ish swap: parquet has no MERGE; real deployments use Delta
    val old = new java.io.File(replicaDir)
    def delete(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(delete)
      f.delete()
    }
    delete(old)
    new java.io.File(tmp).renameTo(old)
  }
}
