package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `hashed_word_bigrams(text)` (n=2) and its word-n-gram
  * generalization: sorted distinct 32-bit md5-prefix hashes of the
  * word n-grams of a single-space-tokenized string — one native pass
  * per document.
  *
  * Semantically IDENTICAL to the composable formulation
  * `array_sort(array_distinct(transform(shingles(text), t ->
  * conv(substr(md5(t),1,8),16,10))))` — and to the DuckDB oracle's
  * `list_distinct(list_transform([t[i]||' '||t[i+1] …], md5-prefix))`
  * — but ~15× faster: Spark's higher-order lambdas are interpreted
  * per element (non-codegen Invoke chains dominated the dedup bench),
  * while this walks the string once and hashes byte ranges directly.
  *
  * The hash is the md5 prefix on purpose (not xxhash): both engines
  * must compute identical values for the oracle gate.
  */
case class HashedWordBigrams(child: Expression, n: Int = 2)
    extends UnaryExpression with CodegenFallback {
  require(n >= 2, s"n-gram size must be >= 2, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String =
    if (n == 2) "hashed_word_bigrams" else s"hashed_word_${n}grams"

  // one digest per thread: in local mode the same expression instance
  // can be evaluated by many tasks concurrently
  @transient private lazy val md5Local =
    ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  override def nullSafeEval(input: Any): Any = {
    val md5 = md5Local.get()
    val s = input.asInstanceOf[UTF8String].toString
    // limit -1 keeps trailing empty segments — Spark's split(text, ' ')
    // and DuckDB's string_split both keep them (Scala's split(Char)
    // default would drop them and diverge from the oracle)
    val toks = s.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Long])
    val cnt = toks.length - n + 1
    val out = new Array[Long](cnt)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < cnt) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      md5.reset()
      val d = md5.digest(sb.toString.getBytes("UTF-8"))
      // first 8 hex chars == first 4 bytes, big-endian, unsigned
      out(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    java.util.Arrays.sort(out)
    // unique in place
    var w = 0
    i = 0
    while (i < cnt) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  override protected def withNewChildInternal(newChild: Expression): HashedWordBigrams =
    copy(child = newChild)
}
