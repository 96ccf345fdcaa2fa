package graft.sqlext

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The reference's grouped-aggregate calculus as ONE SQL aggregate:
  * `cs_hash_sum(x, grp)` returns map<grp, Σx> — the same shape the
  * reference's cs_hash_* family returns as a paired (agg_val, group_by)
  * series (func.c:5113-5447, imcs--1.1.sql:518-560). `cs_project_agg`
  * then explodes the map back to rows, which is how the reference's
  * tpch.sql cs_* form (tpch.sql:60-89) runs verbatim on Spark SQL.
  *
  * Distribution note: this is a TypedImperativeAggregate, so Spark runs it
  * partial/final like any hash aggregate — each task folds its partition
  * into a small map, and only the per-group maps shuffle. Group
  * cardinality must be small enough for one map (the reference makes the
  * SAME assumption: its hash-agg dictionary lives in one backend). The
  * general high-cardinality path is the native groupBy, which every
  * operator here also has.
  *
  * Group keys are strings (the cs_* form builds compound keys with `||`);
  * NULL group or NULL value rows are skipped — matching both SQL
  * aggregate semantics and the reference's cs_filter composition, where
  * filtered-out elements simply don't reach the aggregate.
  */
case class CsHashAgg(
    op: String,
    value: Expression,
    group: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, (Double, Double, Long)]] {

  override def children: Seq[Expression] = Seq(value, group)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!group.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(
        s"cs_hash_$op group key must be a string (use || to pack compound keys), " +
          s"got ${group.dataType.sql}")
    else if (!value.dataType.isInstanceOf[NumericType] ||
      value.dataType.isInstanceOf[DecimalType])
      TypeCheckResult.TypeCheckFailure(
        s"cs_hash_$op value must be a non-decimal numeric (the buffer " +
          s"folds primitive doubles), got ${value.dataType.sql}")
    else if (CsHashAgg.bitOps(op) && !CsHashAgg.integral(value.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"cs_hash_$op is a bitwise reduction over integral values, got ${value.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType =
    MapType(StringType,
      if (op == "count" || CsHashAgg.bitOps(op)) LongType else DoubleType,
      valueContainsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = s"cs_hash_$op"

  override def createAggregationBuffer(): mutable.HashMap[String, (Double, Double, Long)] =
    mutable.HashMap.empty

  /** Fail-loud bound on distinct groups per aggregate: the map-valued
    * form assumes a bounded group dictionary (exactly like the reference's
    * hash-agg dictionary, imcs.h:35); past this, a silent buffer is an
    * executor OOM in disguise — the error names the native groupBy as the
    * high-cardinality route.
    */
  private val maxGroups = 1 << 20

  private def checkSize(n: Int): Unit =
    if (n > maxGroups)
      throw new IllegalStateException(
        s"cs_hash_$op exceeded $maxGroups distinct groups: the map-valued " +
          "aggregate assumes a bounded group dictionary; use a native " +
          "groupBy for high-cardinality keys")

  override def update(
      buf: mutable.HashMap[String, (Double, Double, Long)],
      input: InternalRow): mutable.HashMap[String, (Double, Double, Long)] = {
    val g = group.eval(input)
    if (g != null) {
      val v = value.eval(input)
      if (v != null) {
        checkSize(buf.size)
        val k = g.toString // UTF8String → immutable JVM string (buffer-safe copy)
        val x = v.asInstanceOf[Number].doubleValue()
        // bitwise any/all ride the Long slot at full 64-bit width
        // (func.c:5385-5447); count is unused for them
        val (s, m, n) = buf.getOrElse(k,
          (0.0, if (op == "min") Double.PositiveInfinity else Double.NegativeInfinity,
            if (op == "all") -1L else 0L))
        val m2 = op match {
          case "min" => math.min(m, x)
          case "max" => math.max(m, x)
          case _ => m
        }
        val n2 = op match {
          case "any" => n | v.asInstanceOf[Number].longValue()
          case "all" => n & v.asInstanceOf[Number].longValue()
          case _ => n + 1
        }
        buf.update(k, (s + x, m2, n2))
      }
    }
    buf
  }

  override def merge(
      a: mutable.HashMap[String, (Double, Double, Long)],
      b: mutable.HashMap[String, (Double, Double, Long)]): mutable.HashMap[String, (Double, Double, Long)] = {
    b.foreach { case (k, (s2, m2, n2)) =>
      checkSize(a.size)
      a.get(k) match {
        case Some((s1, m1, n1)) =>
          val m = op match {
            case "min" => math.min(m1, m2)
            case "max" => math.max(m1, m2)
            case _ => m1
          }
          val n = op match {
            case "any" => n1 | n2
            case "all" => n1 & n2
            case _ => n1 + n2
          }
          a.update(k, (s1 + s2, m, n))
        case None => a.update(k, (s2, m2, n2))
      }
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, (Double, Double, Long)]): Any = {
    // sorted keys: deterministic map order regardless of partition merge order
    val ks = buf.keys.toArray.sorted
    val keys = new GenericArrayData(ks.map(k => UTF8String.fromString(k): Any))
    val vals = new GenericArrayData(ks.map { k =>
      val (s, m, n) = buf(k)
      (op match {
        case "sum" => s
        case "avg" => s / n
        case "min" | "max" => m
        case "count" | "any" | "all" => n
      }): Any
    })
    new ArrayBasedMapData(keys, vals)
  }

  override def serialize(buf: mutable.HashMap[String, (Double, Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, (s, m, n)) =>
      CsHashAgg.writeStr(out, k); out.writeDouble(s); out.writeDouble(m); out.writeLong(n)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, (Double, Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, (Double, Double, Long)]
    (0 until n).foreach { _ =>
      val k = CsHashAgg.readStr(in)
      buf.update(k, (in.readDouble(), in.readDouble(), in.readLong()))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CsHashAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): CsHashAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CsHashAgg =
    copy(value = newChildren(0), group = newChildren(1))
}

object CsHashAgg {
  /** Length-prefixed raw UTF-8, not DataOutputStream.writeUTF: writeUTF
    * hard-fails past 65535 encoded bytes, and the API steers users into
    * packing compound keys with `||`, which can legitimately exceed that.
    */
  private[sqlext] def writeStr(out: java.io.DataOutputStream, s: String): Unit = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    out.writeInt(b.length); out.write(b)
  }
  private[sqlext] def readStr(in: java.io.DataInputStream): String = {
    val n = in.readInt()
    val b = new Array[Byte](n)
    in.readFully(b)
    new String(b, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** cs_hash_any / cs_hash_all: per-group bitwise OR / AND reductions
    * (func.c:5385-5447) — the grouped twins of cs_any / cs_all.
    */
  val bitOps: Set[String] = Set("any", "all")
  private[sqlext] def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
}

/** cs_hash_dup_count(value, grp, min_occ) — per group, the number of
  * DISTINCT values occurring at least min_occ times (the reference's
  * nested per-group hash, func.c:5750-6215), as map<grp, count>. SQL twin
  * of the frame-level Aggs.hashDupCount (whose two-phase groupBy remains
  * the high-cardinality route); the buffer carries one occurrence counter
  * per distinct (group, value) pair, partial/final merged like any
  * TypedImperativeAggregate.
  */
case class CsHashDupCount(
    value: Expression,
    group: Expression,
    minOccExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, mutable.HashMap[Double, Long]]] {

  override def children: Seq[Expression] = Seq(value, group, minOccExpr)

  private lazy val minOcc: Long = minOccExpr.eval(InternalRow.empty) match {
    case n: Number => n.longValue()
    case other => throw new IllegalArgumentException(
      s"cs_hash_dup_count min_occ must be an integer literal, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!group.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(
        s"cs_hash_dup_count group key must be a string, got ${group.dataType.sql}")
    else if (!value.dataType.isInstanceOf[NumericType] ||
      value.dataType.isInstanceOf[DecimalType])
      TypeCheckResult.TypeCheckFailure(
        s"cs_hash_dup_count value must be a non-decimal numeric, got ${value.dataType.sql}")
    else if (!minOccExpr.foldable || !CsHashAgg.integral(minOccExpr.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"cs_hash_dup_count min_occ must be an integer literal")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "cs_hash_dup_count"

  override def createAggregationBuffer(): mutable.HashMap[String, mutable.HashMap[Double, Long]] =
    mutable.HashMap.empty

  /** Same fail-loud dictionary bound as CsHashAgg, over distinct
    * (group, value) PAIRS — the quantity the buffer actually stores.
    */
  private val maxPairs = 1 << 20
  private def checkSize(n: Int): Unit =
    if (n > maxPairs)
      throw new IllegalStateException(
        s"cs_hash_dup_count exceeded $maxPairs distinct (group, value) pairs; " +
          "use the frame-level two-phase groupBy (Aggs.hashDupCount) for " +
          "high-cardinality inputs")

  override def update(
      buf: mutable.HashMap[String, mutable.HashMap[Double, Long]],
      input: InternalRow): mutable.HashMap[String, mutable.HashMap[Double, Long]] = {
    val g = group.eval(input)
    if (g != null) {
      val v = value.eval(input)
      if (v != null) {
        // bound BOTH dimensions: many groups of one value each would
        // never trip a per-group check and OOM the outer map silently
        checkSize(buf.size)
        val inner = buf.getOrElseUpdate(g.toString, mutable.HashMap.empty)
        checkSize(inner.size)
        val x = v.asInstanceOf[Number].doubleValue()
        inner.update(x, inner.getOrElse(x, 0L) + 1L)
      }
    }
    buf
  }

  override def merge(
      a: mutable.HashMap[String, mutable.HashMap[Double, Long]],
      b: mutable.HashMap[String, mutable.HashMap[Double, Long]]): mutable.HashMap[String, mutable.HashMap[Double, Long]] = {
    b.foreach { case (k, inner2) =>
      checkSize(a.size)
      val inner1 = a.getOrElseUpdate(k, mutable.HashMap.empty)
      inner2.foreach { case (x, n2) =>
        checkSize(inner1.size)
        inner1.update(x, inner1.getOrElse(x, 0L) + n2)
      }
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, mutable.HashMap[Double, Long]]): Any = {
    val ks = buf.keys.toArray.sorted
    val keys = new GenericArrayData(ks.map(k => UTF8String.fromString(k): Any))
    val vals = new GenericArrayData(ks.map { k =>
      buf(k).valuesIterator.count(_ >= minOcc).toLong: Any
    })
    new ArrayBasedMapData(keys, vals)
  }

  override def serialize(buf: mutable.HashMap[String, mutable.HashMap[Double, Long]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, inner) =>
      CsHashAgg.writeStr(out, k)
      out.writeInt(inner.size)
      inner.foreach { case (x, n) => out.writeDouble(x); out.writeLong(n) }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, mutable.HashMap[Double, Long]] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val ng = in.readInt()
    val buf = mutable.HashMap.empty[String, mutable.HashMap[Double, Long]]
    (0 until ng).foreach { _ =>
      val k = CsHashAgg.readStr(in)
      val nv = in.readInt()
      val inner = mutable.HashMap.empty[Double, Long]
      (0 until nv).foreach(_ => inner.update(in.readDouble(), in.readLong()))
      buf.update(k, inner)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CsHashDupCount =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CsHashDupCount =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CsHashDupCount =
    copy(value = newChildren(0), group = newChildren(1), minOccExpr = newChildren(2))
}
