package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst GENERATOR (the UDTF machinery): one input row →
  * many output rows, planned through the same `Generate` physical node
  * as the built-in explode/posexplode — completing the extension
  * triptych beside the scalar Expression (CosineSimilarity) and the
  * typed Aggregator (GeometricMean).
  *
  * `graft_ngrams(tokens, n)` emits (pos, ngram) for every window of n
  * consecutive tokens — the shingling primitive q45/q95 build from
  * composed transform/concat lambdas, here as a single generator that
  * allocates one StringBuilder per output row instead of intermediate
  * arrays. Null or short token arrays generate zero rows (explode
  * semantics, not a null row).
  */
case class NGramGenerator(tokens: Expression, nExpr: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(tokens, nExpr)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NGramGenerator =
    copy(tokens = newChildren(0), nExpr = newChildren(1))

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  override def prettyName: String = "graft_ngrams"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = tokens.eval(input)
    if (arr == null) return Iterator.empty
    val a = arr.asInstanceOf[ArrayData]
    val nv = nExpr.eval(input)
    if (nv == null) return Iterator.empty
    val n = nv.asInstanceOf[Int]
    val total = a.numElements() - n + 1
    if (n <= 0 || total <= 0) return Iterator.empty
    // windows containing a NULL token are SKIPPED (the generator's
    // output fields are declared non-nullable; appending a null would
    // NPE the whole query) — position `pos` still names the window's
    // start index in the original array
    (0 until total).iterator.flatMap { i =>
      val sb = new java.lang.StringBuilder
      var j = 0
      var hasNull = false
      while (j < n && !hasNull) {
        val t = a.getUTF8String(i + j)
        if (t == null) hasNull = true
        else {
          if (j > 0) sb.append(' ')
          sb.append(t.toString)
          j += 1
        }
      }
      if (hasNull) Iterator.empty
      else Iterator.single(InternalRow(i, UTF8String.fromString(sb.toString)))
    }
  }
}

object NGramGenerator {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_ngrams",
      exprs => NGramGenerator(exprs(0), exprs(1)),
      "built-in")
}
