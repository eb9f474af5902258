package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k heap the aggregate threads through update/merge.
  *
  * A plain binary min-heap over `InternalRow`s: the head is the SMALLEST
  * retained row, so a candidate only displaces it when strictly larger —
  * rows that can't make the cut are rejected with one comparison and zero
  * allocation (no copy of the incoming UnsafeRow view). */
final class TopKHeap(val k: Int, val ord: Ordering[InternalRow]) {
  val heap = new java.util.PriorityQueue[InternalRow](math.max(k, 1), ord)
  def insert(row: InternalRow): Unit =
    if (heap.size < k) heap.add(row.copy())
    else if (ord.compare(row, heap.peek()) > 0) { heap.poll(); heap.add(row.copy()) }
  /** insert() for rows this heap may take ownership of (merge/deserialize
    * sources) — skips the defensive copy. */
  def insertOwned(row: InternalRow): Unit =
    if (heap.size < k) heap.add(row)
    else if (ord.compare(row, heap.peek()) > 0) { heap.poll(); heap.add(row) }
  /** Retained rows, LARGEST first. */
  def sortedDesc: Array[InternalRow] = {
    val arr = heap.toArray(new Array[InternalRow](heap.size))
    java.util.Arrays.sort(arr, ord.reverse)
    arr
  }
}

/** Native top-k aggregate: keeps the `k` largest struct values of `child`
  * per group, by the struct's lexicographic ordering (field 1, then field
  * 2, ...), and returns them as an array sorted descending.
  *
  * WHEN TO USE: since 3.5, Spark's own `InferWindowGroupLimit` already
  * bounds the `row_number() OVER (...) <= k` window idiom — a Partial
  * WindowGroupLimit runs before the exchange, so that pattern shuffles
  * ≤ k rows per key per map partition too (verified on 4.1; see
  * SCALE.md). Reach for this aggregate where the optimizer rule can't:
  * top-k computed ALONGSIDE other aggregates in the same groupBy pass
  * (a window would cost a second stage + join), an array-per-key result
  * consumed as a nested column, or rank-filter shapes the inference rule
  * doesn't match (rank used in expressions, k not a literal adjacent
  * filter). Versus the window plan it trades the two full-width local
  * sorts for one hash aggregation — heap updates are O(log k) per row
  * with a codegen'd comparator.
  *
  * Ordering note: struct ordering is ascending per field with nulls
  * smallest, so "largest" = last by (f1 ASC, f2 ASC, ...) — callers wanting
  * "top by value, ties broken by id" order fields as (value, id) and read
  * the result as ORDER BY value DESC NULLS LAST, id DESC. Memory: each
  * buffer holds ≤ k rows (caller-capped), merge is k log k — bounded
  * executor state by construction.
  *
  * `ascendingFields(i) = true` flips field i so the RESULT reads ascending
  * for it (mixed-direction rankings like "score DESC, token ASC" that a
  * string field can't express by negation). Missing/extra entries default
  * to the descending-result behavior above; nulls still rank last either
  * way (they only surface when a group is smaller than k).
  */
case class TopKStructs(
    child: Expression,
    k: Int,
    ascendingFields: Seq[Boolean] = Nil,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeap] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType
        if org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(s) =>
      if (k >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"k must be >= 1, got $k")
    case dt =>
      TypeCheckResult.TypeCheckFailure(s"graft_top_k expects an orderable struct, got ${dt.sql}")
  }

  private lazy val structType = child.dataType.asInstanceOf[StructType]
  // codegen'd comparator over the struct fields (ascending, nulls first —
  // identical order to the interpreted struct ordering, ~5x cheaper per
  // comparison); transient: regenerated lazily on each executor
  @transient private lazy val ordering: Ordering[InternalRow] = {
    import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference, Descending, NullsFirst, SortOrder}
    val sortOrders = structType.fields.toIndexedSeq.zipWithIndex.map { case (f, i) =>
      val ref = BoundReference(i, f.dataType, f.nullable)
      // The heap keeps the k GREATEST rows under this comparator and emits
      // them comparator-descending, so a result-ASC field needs the
      // comparator direction flipped; NullsFirst under Descending makes
      // nulls "least" — ranked last in the output, same as the default.
      if (ascendingFields.lift(i).getOrElse(false))
        SortOrder(ref, Descending, NullsFirst, Seq.empty)
      else SortOrder(ref, Ascending)
    }
    org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering.generate(sortOrders)
  }

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_top_k"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k, ordering)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val v = child.eval(input)
    if (v != null) buffer.insert(v.asInstanceOf[InternalRow])
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    // rows in `other` are already private copies — transfer ownership,
    // don't copy again
    val it = other.heap.iterator()
    while (it.hasNext) buffer.insertOwned(it.next())
    buffer
  }

  override def eval(buffer: TopKHeap): Any =
    new GenericArrayData(buffer.sortedDesc.asInstanceOf[Array[Any]])

  // hoisted: serialize runs once per GROUP at partial output — creating a
  // projection (codegen + instantiation) per call would dominate it
  @transient private lazy val serializeProjection: UnsafeProjection =
    UnsafeProjection.create(structType)

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val project = serializeProjection
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.heap.size)
    val it = buffer.heap.iterator()
    while (it.hasNext) {
      val bytes = project(it.next()).getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buffer = new TopKHeap(k, ordering)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(structType.length)
      row.pointTo(rowBytes, len)
      buffer.insertOwned(row) // row owns its freshly-read bytes
      i += 1
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStructs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStructs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKStructs =
    copy(child = newChild)
}
