package graft.llm

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Behavior tests for the chunking and PII-scrub operators: coverage
  * and containment invariants for chunks, and full-redaction proof for
  * the scrub.
  */
class ChunkPiiSpec extends SparkSuite {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("chunks: every token is covered and no chunk is a subset of its predecessor") {
    import graft.SparkSuite.spark.implicits._
    val w = TextAnalysisQueries.ChunkWindow
    val out = TextAnalysisQueries.defs("llm_doc_chunks")(spark, sfDir).collect()
    val n = docs.select($"doc_id", size(split(lower($"text"), " ")).as("n"))
      .collect()
      .map(r => r.getLong(0) -> r.get(1).asInstanceOf[Number].intValue).toMap
    out.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, chunks) =>
      val sorted = chunks.sortBy(_.getAs[Int]("chunk_idx"))
      // dense 0-based chunk ids
      assert(sorted.map(_.getAs[Int]("chunk_idx")).toSeq == sorted.indices)
      // full coverage: the last chunk's window reaches the end
      val last = sorted.last
      assert(last.getAs[Int]("chunk_start") + w - 1 >= n(id))
      assert(last.getAs[Int]("chunk_start") <= n(id))
      // no chunk contained in its predecessor (its window adds tokens)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Int]("chunk_start") + w - 1 >
            a.getAs[Int]("chunk_start") + w - 1)
        case _ =>
      }
      // token counts clamp to the doc end
      sorted.foreach { c =>
        val expect = math.min(w, n(id) - c.getAs[Int]("chunk_start") + 1)
        assert(c.getAs[Int]("n_chunk_tokens") == expect)
      }
      // short docs chunk exactly once
      if (n(id) <= w) assert(sorted.length == 1)
    }
  }

  test("pii scrub: counts track the planted pattern classes") {
    val rows = TextAnalysisQueries.defs("llm_pii_scrub")(spark, sfDir).collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (e, p) = (r.getAs[Int]("n_emails"), r.getAs[Int]("n_phones"))
      (id % 5) match {
        case 1 => assert(e == 1 && p == 0, s"doc $id: e=$e p=$p")
        case 2 => assert(e == 0 && p == 1, s"doc $id: e=$e p=$p")
        case 3 => assert(e == 1 && p == 1, s"doc $id: e=$e p=$p")
        case _ => assert(e == 0 && p == 0, s"doc $id: e=$e p=$p")
      }
    }
  }

  test("pii scrub: redacted text contains no residual matches") {
    import graft.SparkSuite.spark.implicits._
    // recompute the redaction independently and re-scan it
    val suffix =
      when($"doc_id" % 5 === 1,
        concat(lit(" contact user"), $"doc_id", lit("@example.com now")))
      .when($"doc_id" % 5 === 2,
        concat(lit(" call 555-"), lpad(($"doc_id" % 10000).cast("string"), 4, "0"),
          lit(" today")))
      .when($"doc_id" % 5 === 3,
        concat(lit(" mail a"), $"doc_id", lit("@b.org or 555-"),
          lpad(($"doc_id" % 10000).cast("string"), 4, "0")))
      .otherwise(lit(""))
    val clean = regexp_replace(
      regexp_replace(concat($"text", suffix),
        lit(TextAnalysisQueries.EmailPattern), lit("[EMAIL]")),
      lit(TextAnalysisQueries.PhonePattern), lit("[PHONE]"))
    val residual = docs.select(
        (size(regexp_extract_all(clean, lit(TextAnalysisQueries.EmailPattern), lit(0))) +
         size(regexp_extract_all(clean, lit(TextAnalysisQueries.PhonePattern), lit(0))))
          .as("m"))
      .agg(sum(col("m"))).collect().head.getLong(0)
    assert(residual == 0)
    // and the hash the operator reports is the hash of THIS clean text
    val opHashes = TextAnalysisQueries.defs("llm_pii_scrub")(spark, sfDir)
      .select($"doc_id", $"clean_hash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val myHashes = docs.select($"doc_id", TextOps.hash32(clean).as("h")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(opHashes == myHashes)
  }
}
