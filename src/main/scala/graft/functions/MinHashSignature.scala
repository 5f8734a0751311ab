package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All `numHashes` MinHash signature slots in ONE aggregate: per input
  * shingle hash, a tight JVM loop takes `min(XXH64.hashLong(h, seed_i))`
  * into a primitive `Array[Long]` buffer.
  *
  * Why not `agg(min(xxhash64(lit(0), h)), ..., min(xxhash64(lit(95), h)))`
  * (the previous [[graft.llm.Dedup.bandRows]] shape): 96 separate agg
  * expressions codegen into one enormous update method that blows the
  * JIT's method-size budget, so the hot loop runs in the bytecode
  * interpreter — measured ~19 s CPU for 260k shingle rows at sf0.1, ~15×
  * slower than this loop. Same per-row work, compiled this time.
  *
  * Bit-exactness: `xxhash64(lit(i), h)` evaluates
  * `XXH64.hashLong(h, XXH64.hashLong(i, 42L))` — so seeding the loop with
  * `XXH64.hashLong(i, 42L)` reproduces the EXACT slot values the old form
  * produced; persisted [[graft.llm.MinHashIndex]] fingerprints stay
  * compatible across the change.
  */
case class MinHashSignature(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashLong(i.toLong, 42L))

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val x = XXH64.hashLong(h, seeds(i))
        if (x < buf(i)) buf(i) = x
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSignature =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSignature =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSignature =
    copy(child = newChildren.head)
}
