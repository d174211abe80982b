package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Grouped top-k as a CUSTOM AGGREGATE (the UDAF surface —
  * `TypedImperativeAggregate`): keep the k best (score desc, token asc)
  * `(token, tf, df, score)` items per group, with map-side PARTIAL
  * buffers that merge — the window-free form of the per-group top-k.
  *
  * Why this beats `row_number().over(partitionBy(group))` at scale: the
  * window form shuffles EVERY input row to its group's partition and
  * sorts there — the non-survivors (all but k per group) pay the full
  * exchange + sort. The aggregate form compacts to ≤ k items per group
  * per MAP task before the exchange, so only `k × #groups × #tasks`
  * items ever shuffle and nothing sorts but the k-element buffers.
  * (Spark's WindowGroupLimit pushdown recovers part of this for
  * row_number windows; the aggregate gets all of it, on any Spark, and
  * composes with other aggregates in the same pass.)
  *
  * Determinism contract: the comparison (score desc, token asc) must be
  * a TOTAL order over the group's items — tokens are unique within a
  * group in every registered use. Compaction at any boundary is then
  * order-independent: an item outside the running top-k can never
  * re-enter.
  */
case class TopKByScore(
    score: Expression,
    token: Expression,
    tf: Expression,
    df: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[TopKByScore.Item]] {

  import TopKByScore.Item

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(score, token, tf, df)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by_score"

  // Reject wrong argument types at ANALYSIS time — without this, SQL misuse
  // of the registered function surfaces as a runtime ClassCastException in
  // update()'s asInstanceOf casts.
  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq(
      ("score", score.dataType, DoubleType),
      ("token", token.dataType, StringType),
      ("tf", tf.dataType, LongType),
      ("df", df.dataType, LongType))
    expected.collectFirst {
      case (name, actual, want) if actual != want =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName: argument '$name' must be $want, got $actual")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType),
    StructField("tf", LongType),
    StructField("df", LongType),
    StructField("raw_score", DoubleType))), containsNull = false)

  override def createAggregationBuffer(): ArrayBuffer[Item] = ArrayBuffer.empty

  private def compact(buf: ArrayBuffer[Item]): ArrayBuffer[Item] =
    if (buf.length <= k) buf
    else {
      val kept = buf.sorted(Item.ordering).take(k)
      buf.clear()
      buf ++= kept
    }

  override def update(buf: ArrayBuffer[Item], input: InternalRow): ArrayBuffer[Item] = {
    val s = score.eval(input)
    val t = token.eval(input)
    val tfv = tf.eval(input)
    val dfv = df.eval(input)
    // a null in any argument means the row carries no rankable candidate —
    // skip it rather than coerce null tf/df to 0
    if (s != null && t != null && tfv != null && dfv != null) {
      buf += Item(
        s.asInstanceOf[Double],
        t.asInstanceOf[UTF8String].clone(),
        tfv.asInstanceOf[Long],
        dfv.asInstanceOf[Long])
      // amortized: compact when the buffer holds 4 candidate generations
      if (buf.length >= 4 * k) compact(buf)
    }
    buf
  }

  override def merge(a: ArrayBuffer[Item], b: ArrayBuffer[Item]): ArrayBuffer[Item] = {
    a ++= b
    compact(a)
  }

  override def eval(buf: ArrayBuffer[Item]): Any = {
    val top = buf.sorted(Item.ordering).take(k)
    new GenericArrayData(top.map(it => InternalRow(it.token, it.tf, it.df, it.score)).toArray[Any])
  }

  override def serialize(buf: ArrayBuffer[Item]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val items = compact(buf)
    out.writeInt(items.length)
    items.foreach { it =>
      out.writeDouble(it.score)
      out.writeLong(it.tf)
      out.writeLong(it.df)
      val b = it.token.getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Item] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = ArrayBuffer.empty[Item]
    var i = 0
    while (i < n) {
      val s = in.readDouble()
      val tfv = in.readLong()
      val dfv = in.readLong()
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf += Item(s, UTF8String.fromBytes(b), tfv, dfv)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), token = newChildren(1),
      tf = newChildren(2), df = newChildren(3))
}

object TopKByScore {
  /** One buffered candidate. `token` must be an immutable copy (the
    * incoming UTF8String may view a reused buffer — update() clones). */
  case class Item(score: Double, token: UTF8String, tf: Long, df: Long)

  object Item {
    /** score desc, token asc — the window form's exact order. */
    val ordering: Ordering[Item] = new Ordering[Item] {
      def compare(a: Item, b: Item): Int = {
        val c = java.lang.Double.compare(b.score, a.score)
        if (c != 0) c else a.token.compareTo(b.token)
      }
    }
  }

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnShim

  /** Column-API surface: `groupBy(g).agg(TopKByScore(score, tok, tf, df, k))`. */
  def apply(score: Column, token: Column, tf: Column, df: Column, k: Int): Column =
    ColumnShim.column(TopKByScore(
      ColumnShim.expression(score), ColumnShim.expression(token),
      ColumnShim.expression(tf), ColumnShim.expression(df), k)
      .toAggregateExpression())
}
