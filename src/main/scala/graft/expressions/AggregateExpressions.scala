package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native UPPER-TRIANGLE OUTER-PRODUCT SUM aggregate over an ARRAY<BIGINT>
  * column (`graft_trisum(qv, dim)`): accumulates Σ qv[i]·qv[j] for every
  * 0 ≤ i ≤ j < dim into ONE flat long[dim(dim+1)/2] buffer per partition —
  * the second-moment accumulator q124's covariance table needs.
  *
  * Why an aggregate and not `posexplode(flatten(transform(...)))`: the
  * explode form pays per-OUTPUT-row iterator overhead — N·D(D+1)/2 rows
  * through Generate + hash-aggregate (~250 ns each dominates the actual
  * multiply) — where this aggregate pays a tight JVM loop per INPUT row
  * and shuffles only one ≤ 17 KB buffer per partition (classic
  * map-combine: the product stream never exists as rows). This is the
  * SURVEY §7.4 preference order at work: compose built-ins first (the
  * explode form remains the spec cross-check twin), drop to a custom
  * aggregate where the measured win is real (~2.6 s → ~0.4 s at sf0.1).
  *
  * Determinism: integer adds are associative/commutative, so the result
  * is partitioning-independent — same value under any parallelism, and
  * identical to the HUGEINT sums the DuckDB oracle computes. Overflow
  * fails LOUDLY (`Math.addExact`): with |q| ≤ 2 000 milli-units per
  * component, saturation needs ~2.3e12 vectors — beyond a 100 TB corpus
  * (~4e11 64-dim float32 vectors) but checked anyway, never wrapped.
  * Malformed input (null / wrong-dim array) throws with the q124 message
  * contract rather than skewing a silent moment. */
case class TriangleSumAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ImplicitCastInputTypes {

  private val triLen = dim * (dim + 1) / 2

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](triLen)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null)
      throw new IllegalArgumentException(
        "graft_trisum: null vector — moments would silently skew; guard arrivals upstream")
    val q = v.asInstanceOf[ArrayData].toLongArray()
    if (q.length != dim)
      throw new IllegalArgumentException(
        s"graft_trisum: expected dim=$dim, got ${q.length} — ragged vector")
    var k = 0
    var i = 0
    while (i < dim) {
      val qi = q(i)
      var j = i
      while (j < dim) {
        buffer(k) = Math.addExact(buffer(k), Math.multiplyExact(qi, q(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var k = 0
    while (k < triLen) { b1(k) = Math.addExact(b1(k), b2(k)); k += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(triLen * 8)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](triLen)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TriangleSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TriangleSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TriangleSumAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_trisum"
}
