package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The LLM-training-data-pipeline operator surface (driver brief +
  * SURVEY.md §7.5): deduplication (exact, MinHash-LSH, SimHash,
  * blocked n-gram Jaccard), embedding similarity search (brute top-k,
  * LSH ANN), text analysis (stats, language-ID, token counting,
  * fingerprinting), and multimodal columns.
  */
object LlmQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] =
    DedupQueries.defs ++ TextAnalysisQueries.defs ++
      SimilarityQueries.defs ++ MultimodalQueries.defs ++
      ContaminationQueries.defs ++ RetrievalQueries.defs ++
      SketchQueries.defs

  val oracles: Map[String, String] =
    DedupQueries.oracles ++ TextAnalysisQueries.oracles ++
      SimilarityQueries.oracles ++ MultimodalQueries.oracles ++
      ContaminationQueries.oracles ++ RetrievalQueries.oracles ++
      SketchQueries.oracles
}
