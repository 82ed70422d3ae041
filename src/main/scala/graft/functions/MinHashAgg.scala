package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** All-permutations minhash as ONE aggregate: buffer = nPerms running
  * minima, update = one tight JVM loop per input hash.
  *
  * The declarative alternative (nPerms separate `min(pmod(a*h+b, p))`
  * aggregate columns) generates an enormous codegen unit — measured 30s
  * of janino compilation for 128 permutations — while this typed
  * aggregate is a fixed ~40-line class at any nPerms. Map-side partial
  * aggregation still applies (TypedImperativeAggregate merges buffers),
  * so the shuffle stays nPerms longs per (group × partition).
  *
  * Permutations are seeded (a,b) pairs over the Mersenne prime 2^31-1;
  * inputs are first reduced mod p so a*h+b never overflows a long.
  */
case class MinHashAgg(
    child: Expression,
    nPerms: Int,
    seed: Long = 42L,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val P = 2147483647L // 2^31 - 1

  @transient private lazy val (permA, permB) = MinHashAgg.perms(nPerms, seed)

  override def prettyName: String = "minhash"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = Array.fill(nPerms)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = ((v.asInstanceOf[Long] % P) + P) % P
      var j = 0
      while (j < nPerms) {
        val x = (permA(j) * h + permB(j)) % P
        if (x < buf(j)) buf(j) = x
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var j = 0
    while (j < nPerms) { if (other(j) < buf(j)) buf(j) = other(j); j += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MinHashAgg {
  /** Seeded permutation parameters, shared with any verifier. */
  def perms(nPerms: Int, seed: Long): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    (Array.fill(nPerms)(1L + rnd.nextInt(Int.MaxValue - 1)),
     Array.fill(nPerms)(rnd.nextInt(Int.MaxValue).toLong))
  }

  def minhash(h: Column, nPerms: Int): Column =
    ColumnBridge.column(
      MinHashAgg(ColumnBridge.expression(h), nPerms).toAggregateExpression())
}
