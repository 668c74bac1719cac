package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `ngram_set_hits(gram_hashes)` — membership-count of a document's gram
  * hashes against a FIXED sorted set that rides inside the expression (and
  * therefore inside the broadcast task binary, once per stage — the same
  * distribution cost class as a broadcast-join hash relation, but with no
  * explode, no join, and no aggregation afterwards).
  *
  * This is the join-free evaluation shape of benchmark decontamination: the
  * eval-suite gram set is small and fixed by definition, so the 10^12-doc
  * train side stays a pure narrow map over the scan. Returns
  * `(n_grams, hits)` in ONE pass so no consumer evaluates the (expensive)
  * gram-hash child twice. Binary search per gram over a primitive long
  * array — no boxing, cache-friendly, ~log2(|set|) probes. */
case class NgramSetHits(child: Expression, sortedSet: Array[Long])
    extends UnaryExpression {

  override def dataType: DataType = NgramSetHits.schema
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "ngram_set_hits"

  def evalInput(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    var i = 0
    var hits = 0
    while (i < n) {
      if (java.util.Arrays.binarySearch(sortedSet, arr.getLong(i)) >= 0) hits += 1
      i += 1
    }
    val r = new GenericInternalRow(2)
    r.update(0, n)
    r.update(1, hits)
    r
  }

  override protected def nullSafeEval(input: Any): Any =
    evalInput(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramSetHits", this, classOf[NgramSetHits].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.evalInput($c);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): NgramSetHits =
    copy(child = newChild)
}

object NgramSetHits {
  val schema: StructType = StructType(Seq(
    StructField("n_grams", IntegerType, nullable = false),
    StructField("hits", IntegerType, nullable = false)))
}

/** `ngram_bloom_hits(gram_hashes)` — counts a document's gram hashes that a
  * FIXED Bloom filter (Spark's `util.sketch.BloomFilter`, built once over the
  * benchmark gram stream) might contain. The filter ships as its serialized
  * bytes (the sketch's own stable `writeTo`/`readFrom` format) and is
  * deserialized once per task, so the expression is a pure narrow map.
  *
  * A Bloom filter has NO false negatives, so `bloom_hits = 0` proves the
  * document shares zero grams with the benchmark — that is the contract
  * [[graft.textops.CorpusOps.decontaminateBloom]] builds on: the (tiny)
  * bloom-positive slice is re-verified exactly, everything else is
  * definitively clean without ever reaching a join. Returns
  * `(n_grams, bloom_hits)` in one pass over the (expensive) gram-hash child. */
case class NgramBloomHits(child: Expression, bfBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = NgramBloomHits.schema
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "ngram_bloom_hits"

  @transient private lazy val bf =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bfBytes))

  def evalInput(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    var i = 0
    var hits = 0
    while (i < n) {
      if (bf.mightContainLong(arr.getLong(i))) hits += 1
      i += 1
    }
    val r = new GenericInternalRow(2)
    r.update(0, n)
    r.update(1, hits)
    r
  }

  override protected def nullSafeEval(input: Any): Any =
    evalInput(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramBloomHits", this, classOf[NgramBloomHits].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.evalInput($c);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): NgramBloomHits =
    copy(child = newChild)
}

object NgramBloomHits {
  val schema: StructType = StructType(Seq(
    StructField("n_grams", IntegerType, nullable = false),
    StructField("bloom_hits", IntegerType, nullable = false)))
}
