package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native top-k frequent-items aggregate — a `TypedImperativeAggregate` over
  * a bounded Misra-Gries / space-saving summary (Metwally, Agrawal, El
  * Abbadi, "Efficient computation of frequent and top-k elements in data
  * streams", ICDT 2005).
  *
  * Why custom: Spark has no native bounded top-k-by-frequency aggregate — the
  * usual `groupBy(key).count().orderBy.limit(k)` shuffles EVERY distinct key;
  * at 100 TB of mention surfaces that's a vocabulary-sized shuffle per group.
  * This aggregate keeps an O(capacity) sketch per group, merges partial
  * sketches map-side, and guarantees exact results whenever the number of
  * distinct items per group is under the capacity (and ε-approximate counts
  * above it, the standard MG bound).
  *
  * Buffer = HashMap[String, Long], capped at `capacity` by the MG decrement
  * step. Output: array<struct<item string, cnt long>> ordered by
  * (cnt desc, item asc) — deterministic.
  */
case class TopKFreq(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("cnt", LongType))))

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  private def add(
      buf: mutable.HashMap[String, Long],
      item: String,
      cnt: Long
  ): Unit = {
    buf.update(item, buf.getOrElse(item, 0L) + cnt)
    if (buf.size > capacity) {
      // Misra-Gries decrement: subtract the minimum count from everyone,
      // dropping keys that reach zero — bounds the buffer at `capacity`
      val min = buf.valuesIterator.min
      val dead = buf.iterator.filter(_._2 <= min).map(_._1).toList
      buf.mapValuesInPlace((_, v) => v - min)
      dead.foreach(buf.remove)
    }
  }

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow
  ): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.toString, 1L)
    buf
  }

  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]
  ): mutable.HashMap[String, Long] = {
    other.foreach { case (item, cnt) => add(buf, item, cnt) }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val top = buf.toSeq.sortBy { case (item, cnt) => (-cnt, item) }.take(k)
    new GenericArrayData(top.map { case (item, cnt) =>
      InternalRow(UTF8String.fromString(item), cnt)
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, c) =>
      val b = s.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKFreq =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKFreq =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKFreq =
    copy(child = newChildren.head)
  override def prettyName: String = "top_k_freq"
}

object TopKFreq {
  /** Column API: top-k frequent values of `c` (exact when distinct values
    * per group <= capacity).
    */
  def top_k_freq(c: Column, k: Int, capacity: Int = 1024): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(
      TopKFreq(GraftBridge.expression(c), k, capacity)
        .toAggregateExpression())
  }
}
