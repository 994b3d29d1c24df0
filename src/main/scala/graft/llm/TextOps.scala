package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable text primitives shared by the LLM
  * data-pipeline operators (dedup / analysis) and their DuckDB oracle
  * twins.
  *
  * Every primitive is chosen so the SAME value is computable in DuckDB
  * SQL: tokenisation is a plain single-space split (the fixture corpus
  * is clean ASCII, single-spaced — verified), token hashes derive from
  * md5 hex (bit-identical across engines), and all arithmetic stays in
  * exact signed 64-bit ranges (no overflow, no engine-specific
  * promotion). Where a ratio is emitted it is ONE IEEE double division
  * of two exact integers — bitwise reproducible everywhere.
  *
  * Scale notes (100 TB): everything here is per-row Catalyst expression
  * work — no shuffle, no UDF, no driver participation. Shuffles happen
  * only in the consuming operators (groupBy/join), which are
  * banded/bucketed by design (see [[DedupQueries]]): candidate
  * generation is always a bucket equi-join, never an all-pairs cross
  * join.
  */
object TextOps {

  /** Mersenne prime 2^31-1 — modulus for MinHash permutations. Both
    * factors of `a * h` stay < 2^31, so products stay < 2^62 and 64-bit
    * signed arithmetic is exact in Spark and DuckDB alike.
    */
  val P: Long = 2147483647L

  val NumHashes = 16
  val Bands = 4
  val RowsPerBand: Int = NumHashes / Bands

  /** MinHash permutation coefficients `(a_i, b_i)`, fixed LCG-derived so
    * the oracle SQL embeds identical literals. `a_i` is never 0 mod P.
    */
  val perms: IndexedSeq[(Long, Long)] = (0 until NumHashes).map { i =>
    val a = (1664525L * (i + 1) + 1013904223L) % P
    val b = (22695477L * (i + 1) + 7L) % P
    (if (a == 0L) 1L else a, b)
  }

  // ---------------------------------------------------------------- Spark

  /** lower + single-space split. */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** The document-term matrix `(doc_id, source, lang, term, c)` — one
    * row per distinct (doc, token) with its occurrence count, built
    * once per corpus state ([[IndexArtifacts.cachedIndex]]). This is
    * the tokenize-once production shape: every bag-of-words consumer
    * (co-occurrence, CMS sketches, df/tf statistics) derives from this
    * table instead of re-running the corpus-wide occurrence explode +
    * count shuffle per query. Order-sensitive consumers (bigram LM,
    * collocations) cannot use it and keep their own positional pass.
    */
  def docTermCounts(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    IndexArtifacts.cachedIndex(s, dir, "doc-term-counts",
      Seq(s"$dir/documents.parquet"))(
      graft.Tables(s, dir).documents
        .select(col("doc_id"), col("source"), col("lang"),
          explode(tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("source"), col("lang"), col("term"))
        .agg(count(lit(1)).as("c")))

  /** Distinct word-bigram shingles; empty array for <2 tokens (Spark's
    * `sequence(1, 0)` would produce a DESCENDING range, hence the guard).
    */
  def bigramShingles(text: Column): Column = {
    val t = tokens(text)
    when(size(t) >= 2,
      array_distinct(transform(sequence(lit(1), size(t) - 1),
        i => concat(element_at(t, i), lit(" "), element_at(t, i + 1)))))
      .otherwise(array().cast("array<string>"))
  }

  /** First 8 hex chars of md5 → 32-bit value as long — the shared token
    * hash both engines compute identically (`conv` here,
    * `CAST('0x…' AS BIGINT)` in DuckDB).
    */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** 60-bit md5-prefix hash (15 hex chars): wide enough for HLL's
    * register-index + rho split, and always positive in a signed long
    * so `>>>`/`%` agree between engines.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** SORTED distinct bigram shingles hashed to longs — the form every
    * dedup operator consumes. Backed by the native single-pass
    * [[graft.functions.HashedWordBigrams]] expression: the equivalent
    * higher-order-function formulation
    * (`array_sort(array_distinct(transform(bigramShingles(text), hash32)))`)
    * is interpreted per element and dominated the dedup bench ~15×.
    * Values are the same engine-portable md5 prefixes, so the DuckDB
    * oracles are unaffected.
    */
  def hashedShingles(text: Column): Column = hashedNgrams(text, 2)

  /** SORTED distinct word-n-gram shingles hashed to longs — the n=3
    * (trigram) form backs [[DedupQueries]]' n-gram Jaccard operator:
    * trigram noise Jaccard between unrelated fixture docs maxes ~0.04
    * (bigram: ~0.2), so a 0.1 threshold sits cleanly above noise.
    */
  def hashedNgrams(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.HashedWordBigrams(
        org.apache.spark.sql.GraftColumnBridge.expression(lower(text)), n))

  /** Exact Jaccard of two pre-distinct arrays — |A∩B| / |A∪B| as one
    * double division of two exact ints.
    */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** BPE-ish subword cost: each word costs ceil(len/4) units, summed
    * with a sequential left-fold. THE shared cost model of
    * `llm_token_count` and `llm_seq_pack` — change it here and in
    * [[subwordCostSql]] together or oracle parity breaks.
    */
  def subwordCost(text: Column): Column =
    org.apache.spark.sql.functions.expr(
      """aggregate(
        |  transform(split(lower(text), ' '),
        |            t -> (length(t) + 3) div 4),
        |  0L, (acc, x) -> acc + x)""".stripMargin)

  // --------------------------------------------------- DuckDB oracle twins
  // Keep in lockstep with the Column builders above.

  /** `string_split(lower(text), ' ')` */
  val toksSql: String = "string_split(lower(text), ' ')"

  /** Distinct word-bigram shingles over a tokens-list expression `t`. */
  def shinglesSql(t: String): String = ngramsSql(t, 2)

  /** Distinct word-n-gram shingles over a tokens-list expression `t`
    * (1-based DuckDB list indexing; empty for < n tokens via an empty
    * range).
    */
  def ngramsSql(t: String, n: Int): String = {
    val elem = (0 until n)
      .map(k => if (k == 0) s"$t[i]" else s"$t[i+$k]").mkString(" || ' ' || ")
    s"list_distinct([$elem for i in range(1, len($t) - ${n - 2})])"
  }

  /** 32-bit md5-prefix hash of expression `e`. */
  def hash32Sql(e: String): String =
    s"CAST(('0x' || substr(md5($e), 1, 8)) AS BIGINT)"

  /** DuckDB twin of [[hash60]]. */
  def hash60Sql(e: String): String =
    s"CAST(('0x' || substr(md5($e), 1, 15)) AS BIGINT)"

  /** Hashed distinct shingles over a tokens-list expression `t`. */
  def hashedShinglesSql(t: String): String = hashedNgramsSql(t, 2)

  /** Hashed distinct n-gram shingles over a tokens-list expression. */
  def hashedNgramsSql(t: String, n: Int): String =
    s"list_distinct(list_transform(${ngramsSql(t, n)}, s -> ${hash32Sql("s")}))"

  /** Exact Jaccard of two pre-distinct list expressions. */
  def jaccardSql(a: String, b: String): String =
    s"len(list_intersect($a, $b))::DOUBLE / len(list_distinct(list_concat($a, $b)))"

  /** DuckDB twin of [[subwordCost]] (identical sequential fold). */
  val subwordCostSql: String =
    s"""list_reduce(
       |      list_prepend(CAST(0 AS BIGINT),
       |        list_transform($toksSql, t -> (length(t) + 3) // 4)),
       |      (acc, x) -> acc + x)""".stripMargin
}
