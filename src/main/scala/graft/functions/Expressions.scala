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

  /** util.relurl (/root/reference/ferenda/util.py:172-191): relative URL
    * from `start` to `url` — os.path.relpath for URLs. Different
    * scheme+authority → `url` unchanged; same → posix relpath of the
    * paths (query+fragment carried over). Static impl shared by the
    * interpreted and codegen paths of [[graft.functions.RelUrl]]. */
  def relurl(url: UTF8String, start: UTF8String): UTF8String =
    UTF8String.fromString(relurlStr(url.toString, start.toString))

  def relurlStr(url: String, start: String): String = {
    def split(u: String): (String, String, String) = {
      val re = "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)([^?#]*)(.*)$".r
      u match {
        case re(d, p, r) => (d, p, r)
        case _ => ("", u.takeWhile(c => c != '?' && c != '#'),
          u.dropWhile(c => c != '?' && c != '#'))
      }
    }
    val (ud, up, ur) = split(url)
    val (sd, sp, _) = split(start)
    if (ud.isEmpty || ud != sd) return url // no relative url possible
    val startDir = {
      val idx = sp.lastIndexOf('/')
      if (idx <= 0) "/" else sp.substring(0, idx) // posixpath.dirname
    }
    val p = up.split("/").filter(_.nonEmpty)
    val s = startDir.split("/").filter(_.nonEmpty)
    val common = p.zip(s).takeWhile { case (a, b) => a == b }.length
    val segs = Seq.fill(s.length - common)("..") ++ p.drop(common)
    (if (segs.isEmpty) "." else segs.mkString("/")) + ur
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

/** `relurl(url, start)` — util.relurl (util.py:172-191) as a codegen'd
  * binary expression (VERDICT r2 "Missing" #5). Null-safe; full codegen
  * via the shared static. */
case class RelUrl(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"relurl requires (STRING, STRING), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType = StringType
  override def prettyName: String = "relurl"

  override protected def nullSafeEval(url: Any, start: Any): Any =
    Expressions.relurl(url.asInstanceOf[UTF8String],
      start.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (u, s) => s"graft.functions.Expressions.relurl($u, $s)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RelUrl =
    copy(left = newLeft, right = newRight)
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
