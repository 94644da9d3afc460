package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst pieces (SURVEY.md §7.4: justified only where built-ins
  * can't express the shape or profiling demands it).
  *
  *  - [[Slug]]: the COIN URI-mint normalizer
  *    (/root/reference/ferenda/thirdparty/coin.py:57-98) as a codegen'd
  *    scalar expression — minting runs per emitted entity at 10^12-row
  *    scale, so it must stay inside whole-stage codegen rather than exit
  *    to a Scala UDF.
  *  - [[MinHashSig]]: MinHash signature as a native
  *    TypedImperativeAggregate — aggregates (doc → shingles) straight into
  *    a fixed 64-slot buffer with map-side partial aggregation, instead of
  *    collect_list-ing every shingle set onto the heap first. At corpus
  *    scale the collect_list variant materializes O(doc length) arrays per
  *    row; this one is O(perms) per group no matter the document size.
  *
  * Registered as SQL functions (`graft_slug`, `minhash_sig`) by
  * [[graft.GraftExtensions]].
  */
object Expressions {

  /** Static slug implementation shared by interpreted + codegen paths. */
  def slugify(s: UTF8String): UTF8String = {
    val in = s.toString.toLowerCase
    val sb = new java.lang.StringBuilder(in.length)
    var i = 0
    var pendingSpace = false // space runs emit ONE '-', never at the ends
    while (i < in.length) {
      val c = in.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '-') {
        if (pendingSpace && sb.length > 0) sb.append('-')
        sb.append(c)
        pendingSpace = false
      } else if (c == ' ') pendingSpace = true
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** splitmix64 remix of a base hash for permutation i (same scheme as
    * TextOps.minhashSignatures — the two paths must agree). */
  def remix(base: Long, i: Int): Long = {
    var z = base + i * 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

/** COIN-style slug: lowercase, alnum kept, space-runs → '-', everything
  * else dropped (coin.py:57-98). Null-safe unary; full codegen. */
case class Slug(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_slug requires STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_slug"

  override protected def nullSafeEval(input: Any): Any =
    Expressions.slugify(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Expressions.slugify($c)")

  override protected def withNewChildInternal(newChild: Expression): Slug =
    copy(child = newChild)
}

/** MinHash signature aggregate: `minhash_sig(shingle)` grouped per doc
  * yields array<bigint> of length `perms`. Partial aggregation =
  * element-wise min merge, so the shuffle carries 64 longs per group, not
  * the shingle set. */
case class MinHashSig(
    child: Expression,
    perms: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires STRING, got ${child.dataType.catalogString}")
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_sig"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(perms)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      // same base hash as TextOps.hash64(s, 0x5eed)
      val base = graft.text.TextOps.hash64(s.toString, 0x5eed)
      var i = 0
      while (i < perms) {
        val h = Expressions.remix(base, i)
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < perms) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * perms)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(perms)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSig =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSig =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSig =
    copy(child = newChildren.head)
}
