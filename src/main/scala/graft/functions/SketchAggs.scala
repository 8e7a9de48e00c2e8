package graft.functions

import org.apache.datasketches.common.SketchesStateException
import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, Intersection, SetOperation, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Mergeable-sketch aggregate functions beyond Spark's built-in HLL
  * family: KLL quantile sketches and Theta set-operation sketches, both
  * Apache DataSketches blobs (readable by any DataSketches binding), both
  * implemented as native Catalyst `TypedImperativeAggregate`s — the same
  * execution contract as Spark's own `hll_sketch_agg` (SPARK-16484
  * family): an arbitrary on-heap sketch object rides the aggregation
  * buffer and is serialized ONLY at partial/final shuffle boundaries,
  * so per-row update cost is the sketch update, not a deserialize cycle
  * (which an `Aggregator`-with-binary-buffer formulation would pay on
  * every row).
  *
  * Why these two complete the story ([[graft.ops.Sketches]] holds the
  * query surface):
  *  - HLL answers distinct-count rollups but cannot answer quantiles;
  *    KLL gives mergeable rank/quantile state with a priori error bounds
  *    (±1.65% rank error at k=200, independent of data size).
  *  - HLL unions but cannot intersect; Theta sketches support full set
  *    algebra (A ∩ B, A ∖ B) over pre-aggregated segment sketches — the
  *    "customers in BOTH segments" question that otherwise needs a rescan.
  */
object SketchAggs {

  // ---------------------------------------------------------------- KLL

  /** Aggregates a double column into a KLL(k) quantile sketch blob. */
  case class KllSketchAgg(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] {

    override def createAggregationBuffer(): KllDoublesSketch =
      KllDoublesSketch.newHeapInstance(k)

    override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
      val v = child.eval(input)
      if (v != null) buf.update(v.asInstanceOf[Double])
      buf
    }

    override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
      buf.merge(other); buf
    }

    override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

    override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
    override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
      KllDoublesSketch.heapify(Memory.wrap(bytes))

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def children: Seq[Expression] = Seq(child)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(child = c.head)
    override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
      copy(inputAggBufferOffset = o)
    override def prettyName: String = "kll_sketch_agg"
  }

  /** Merges pre-aggregated KLL blobs (the rollup side: day → month). */
  case class KllMergeAgg(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] {

    override def createAggregationBuffer(): KllDoublesSketch =
      KllDoublesSketch.newHeapInstance(k)

    override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
      val v = child.eval(input)
      if (v != null)
        buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
      buf
    }

    override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
      buf.merge(other); buf
    }

    override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
    override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
    override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
      KllDoublesSketch.heapify(Memory.wrap(bytes))

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def children: Seq[Expression] = Seq(child)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(child = c.head)
    override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
      copy(inputAggBufferOffset = o)
    override def prettyName: String = "kll_merge_agg"
  }

  /** Scalar: quantile estimate at rank `q` from a KLL blob. Evaluated on
    * rolled-up rows (one per group), so the per-row heapify is off the
    * hot path by construction. */
  case class KllQuantile(child: Expression, q: Double)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullSafeEval(input: Any): Any = {
      val sk = KllDoublesSketch.heapify(Memory.wrap(input.asInstanceOf[Array[Byte]]))
      if (sk.isEmpty) null else sk.getQuantile(q)
    }
    override protected def withNewChildInternal(c: Expression): KllQuantile =
      copy(child = c)
    override def prettyName: String = "kll_quantile"
  }

  // -------------------------------------------------------------- Theta

  /** Aggregates a long column into a Theta sketch blob (lgK nominal
    * entries; exact below 2^lgK distinct values, unbiased sample above). */
  case class ThetaSketchAgg(
      child: Expression,
      lgK: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] {

    // a theta Union accepts raw updates through its internal gadget and
    // merges other sketches — one buffer type serves both phases
    override def createAggregationBuffer(): Union =
      SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

    override def update(buf: Union, input: InternalRow): Union = {
      val v = child.eval(input)
      if (v != null) buf.update(v.asInstanceOf[Long])
      buf
    }

    override def merge(buf: Union, other: Union): Union = {
      buf.union(other.getResult); buf
    }

    override def eval(buf: Union): Any = buf.getResult.toByteArray

    override def serialize(buf: Union): Array[Byte] = buf.toByteArray
    override def deserialize(bytes: Array[Byte]): Union =
      SetOperation.heapify(Memory.wrap(bytes)).asInstanceOf[Union]

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def children: Seq[Expression] = Seq(child)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(child = c.head)
    override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
      copy(inputAggBufferOffset = o)
    override def prettyName: String = "theta_sketch_agg"
  }

  /** Unions pre-aggregated Theta blobs. */
  case class ThetaUnionAgg(
      child: Expression,
      lgK: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] {

    override def createAggregationBuffer(): Union =
      SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

    override def update(buf: Union, input: InternalRow): Union = {
      val v = child.eval(input)
      if (v != null)
        buf.union(CompactSketch.wrap(Memory.wrap(v.asInstanceOf[Array[Byte]])))
      buf
    }

    override def merge(buf: Union, other: Union): Union = {
      buf.union(other.getResult); buf
    }

    override def eval(buf: Union): Any = buf.getResult.toByteArray
    override def serialize(buf: Union): Array[Byte] = buf.toByteArray
    override def deserialize(bytes: Array[Byte]): Union =
      SetOperation.heapify(Memory.wrap(bytes)).asInstanceOf[Union]

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def children: Seq[Expression] = Seq(child)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(child = c.head)
    override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg =
      copy(inputAggBufferOffset = o)
    override def prettyName: String = "theta_union_agg"
  }

  /** Intersects pre-aggregated Theta blobs — the set operation HLL cannot
    * express. The identity of intersection is the universal set, which has
    * no sketch representation: the buffer starts in a "no input yet"
    * state ([[Intersection.hasResult]] false) and an empty group
    * evaluates to SQL null. */
  case class ThetaIntersectAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Intersection] {

    override def createAggregationBuffer(): Intersection =
      SetOperation.builder().buildIntersection()

    override def update(buf: Intersection, input: InternalRow): Intersection = {
      val v = child.eval(input)
      if (v != null)
        buf.intersect(CompactSketch.wrap(Memory.wrap(v.asInstanceOf[Array[Byte]])))
      buf
    }

    override def merge(buf: Intersection, other: Intersection): Intersection = {
      if (other.hasResult) buf.intersect(other.getResult)
      buf
    }

    override def eval(buf: Intersection): Any =
      if (buf.hasResult) buf.getResult.toByteArray else null

    override def serialize(buf: Intersection): Array[Byte] = buf.toByteArray
    override def deserialize(bytes: Array[Byte]): Intersection =
      SetOperation.heapify(Memory.wrap(bytes)).asInstanceOf[Intersection]

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def children: Seq[Expression] = Seq(child)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(child = c.head)
    override def withNewMutableAggBufferOffset(o: Int): ThetaIntersectAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): ThetaIntersectAgg =
      copy(inputAggBufferOffset = o)
    override def prettyName: String = "theta_intersect_agg"
  }

  /** Scalar: intersection of two Theta blobs (for pairwise overlap over
    * window-lagged sketch columns; group-wise intersection is
    * [[ThetaIntersectAgg]]). */
  case class ThetaPairIntersect(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def nullSafeEval(l: Any, r: Any): Any = {
      val inter = SetOperation.builder().buildIntersection()
      inter.intersect(CompactSketch.wrap(Memory.wrap(l.asInstanceOf[Array[Byte]])))
      inter.intersect(CompactSketch.wrap(Memory.wrap(r.asInstanceOf[Array[Byte]])))
      inter.getResult.toByteArray
    }
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): ThetaPairIntersect =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "theta_pair_intersect"
  }

  /** Scalar: distinct-count estimate from a Theta blob. Exact (an
    * integer) while every input sketch stayed below its nominal entry
    * count — the property the oracled query relies on at fixture scale. */
  case class ThetaEstimate(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullSafeEval(input: Any): Any =
      CompactSketch.wrap(Memory.wrap(input.asInstanceOf[Array[Byte]])).getEstimate
    override protected def withNewChildInternal(c: Expression): ThetaEstimate =
      copy(child = c)
    override def prettyName: String = "theta_estimate"
  }

  // -------------------------------------------------- Frequent items

  // stateless — one shared instance, not one per (de)serialized blob
  private val stringSerDe = new org.apache.datasketches.common.ArrayOfStringsSerDe()

  /** Aggregates a string column into a Misra-Gries frequent-items sketch
    * (DataSketches `ItemsSketch`): mergeable heavy-hitter state with a
    * deterministic error bound (≤ streamLength / maxMapSize), EXACT while
    * the distinct-item count stays under the map size — the frequency leg
    * of the sketch family (HLL=distinct, KLL=quantiles, Theta=set algebra,
    * FI=heavy hitters). */
  case class FreqSketchAgg(
      child: Expression,
      lgMaxMapSize: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[org.apache.datasketches.frequencies.ItemsSketch[String]] {
    import org.apache.datasketches.frequencies.ItemsSketch

    override def createAggregationBuffer(): ItemsSketch[String] =
      new ItemsSketch[String](1 << lgMaxMapSize)

    override def update(buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
      val v = child.eval(input)
      if (v != null) buf.update(v.toString)
      buf
    }

    override def merge(buf: ItemsSketch[String], other: ItemsSketch[String]): ItemsSketch[String] = {
      buf.merge(other); buf
    }

    override def eval(buf: ItemsSketch[String]): Any = buf.toByteArray(stringSerDe)
    override def serialize(buf: ItemsSketch[String]): Array[Byte] = buf.toByteArray(stringSerDe)
    override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
      ItemsSketch.getInstance(Memory.wrap(bytes), stringSerDe)

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def children: Seq[Expression] = Seq(child)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(child = c.head)
    override def withNewMutableAggBufferOffset(o: Int): FreqSketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): FreqSketchAgg =
      copy(inputAggBufferOffset = o)
    override def prettyName: String = "freq_sketch_agg"
  }

  /** Merges pre-aggregated frequent-items blobs (the rollup side). */
  case class FreqMergeAgg(
      child: Expression,
      lgMaxMapSize: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[org.apache.datasketches.frequencies.ItemsSketch[String]] {
    import org.apache.datasketches.frequencies.ItemsSketch

    override def createAggregationBuffer(): ItemsSketch[String] =
      new ItemsSketch[String](1 << lgMaxMapSize)

    override def update(buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
      val v = child.eval(input)
      if (v != null)
        buf.merge(ItemsSketch.getInstance(
          Memory.wrap(v.asInstanceOf[Array[Byte]]), stringSerDe))
      buf
    }

    override def merge(buf: ItemsSketch[String], other: ItemsSketch[String]): ItemsSketch[String] = {
      buf.merge(other); buf
    }

    override def eval(buf: ItemsSketch[String]): Any = buf.toByteArray(stringSerDe)
    override def serialize(buf: ItemsSketch[String]): Array[Byte] = buf.toByteArray(stringSerDe)
    override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
      ItemsSketch.getInstance(Memory.wrap(bytes), stringSerDe)

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def children: Seq[Expression] = Seq(child)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(child = c.head)
    override def withNewMutableAggBufferOffset(o: Int): FreqMergeAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): FreqMergeAgg =
      copy(inputAggBufferOffset = o)
    override def prettyName: String = "freq_merge_agg"
  }

  /** Scalar: the sketch's frequent items (no-false-positives policy) as
    * array<struct<term, est, lb, ub>> for DataFrame-side explode;
    * evaluated on rolled-up rows, off the hot path by construction. */
  case class FreqItems(child: Expression)
      extends UnaryExpression with CodegenFallback {
    import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("term", StringType),
      StructField("est", LongType),
      StructField("lb", LongType),
      StructField("ub", LongType))))
    override def nullable: Boolean = true
    override def nullSafeEval(input: Any): Any = {
      val sk = ItemsSketch.getInstance(
        Memory.wrap(input.asInstanceOf[Array[Byte]]), stringSerDe)
      val rows = sk.getFrequentItems(ErrorType.NO_FALSE_POSITIVES).map { r =>
        InternalRow(org.apache.spark.unsafe.types.UTF8String.fromString(r.getItem),
          r.getEstimate, r.getLowerBound, r.getUpperBound)
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(rows.asInstanceOf[Array[Any]])
    }
    override protected def withNewChildInternal(c: Expression): FreqItems =
      copy(child = c)
    override def prettyName: String = "freq_items"
  }

  /** Scalar: total stream length recorded by a frequent-items blob. */
  case class FreqStreamLength(child: Expression)
      extends UnaryExpression with CodegenFallback {
    import org.apache.datasketches.frequencies.ItemsSketch
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def nullSafeEval(input: Any): Any =
      ItemsSketch.getInstance(
        Memory.wrap(input.asInstanceOf[Array[Byte]]), stringSerDe).getStreamLength
    override protected def withNewChildInternal(c: Expression): FreqStreamLength =
      copy(child = c)
    override def prettyName: String = "freq_stream_length"
  }

  // --------------------------------------------------------- Count-Min

  /** Count-Min parameters and hashing shared by the aggregate and the
    * estimate expression. Depth×width counters; ONE md5 per term yields
    * all four row hashes (the 128-bit digest splits into four independent
    * 32-bit words — row i reads hex chars [8i, 8i+8)) — JVM-deterministic
    * AND engine-portable, so sketches built on any executor topology are
    * bit-identical for the same multiset (counter updates are integer
    * adds: fully order-independent, unlike any float sketch) and the
    * DuckDB oracle can rebuild the ENTIRE table from
    * `CAST('0x' || substring(md5(term), 8r+1, 8) AS BIGINT) % width`
    * (round-9 flip of q_cms_freq from rows-only to hash-green). Not in
    * the bundled DataSketches 6.2.0 (no countmin package), hence
    * native. */
  private[graft] object Cm {
    val Depth = 4
    val Width = 256
    private val md = new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }
    /** Lowercase hex md5 of the UTF-8 term — the same string DuckDB's
      * md5() returns. */
    private def md5hex(term: String): String = {
      val d = md.get()
      d.reset()
      val bytes = d.digest(term.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val sb = new java.lang.StringBuilder(32)
      bytes.foreach(b => sb.append(f"${b & 0xff}%02x"))
      sb.toString
    }
    /** All Depth cell indices of a term off one digest. */
    def idxAll(term: String): Array[Int] = {
      val h = md5hex(term)
      Array.tabulate(Depth)(r =>
        r * Width + (java.lang.Long.parseLong(h.substring(8 * r, 8 * r + 8), 16) % Width).toInt)
    }
    def idx(row: Int, term: String): Int = idxAll(term)(row)
    def toBytes(a: Array[Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(a.length * 8)
      a.foreach(bb.putLong); bb.array()
    }
    def fromBytes(b: Array[Byte]): Array[Long] = {
      val bb = java.nio.ByteBuffer.wrap(b)
      Array.fill(b.length / 8)(bb.getLong)
    }
  }

  /** Aggregates a string column into a Count-Min frequency sketch: a
    * Depth×Width Long table where row i increments cell hᵢ(term) mod W.
    * The point-estimate (min over rows) NEVER undercounts and overshoots
    * by at most εN with probability 1−δ (ε = e/W ≈ 1.1%, δ = e^−Depth ≈
    * 1.8% at 4×256) — the frequency companion to Misra-Gries with the
    * opposite trade: MG tracks only the top items exactly-ish, CMS
    * answers ANY point query with bounded overcount. Merging is
    * elementwise addition — associative, commutative, partition-order
    * independent. 8 KiB fixed state regardless of stream length. */
  case class CountMinAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

    override def createAggregationBuffer(): Array[Long] =
      new Array[Long](Cm.Depth * Cm.Width)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val ix = Cm.idxAll(v.toString) // one md5 feeds all Depth rows
        var i = 0
        while (i < Cm.Depth) { buf(ix(i)) += 1; i += 1 }
      }
      buf
    }

    override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
      var i = 0
      while (i < buf.length) { buf(i) += other(i); i += 1 }
      buf
    }

    override def eval(buf: Array[Long]): Any = Cm.toBytes(buf)
    override def serialize(buf: Array[Long]): Array[Byte] = Cm.toBytes(buf)
    override def deserialize(bytes: Array[Byte]): Array[Long] = Cm.fromBytes(bytes)

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def children: Seq[Expression] = Seq(child)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(child = c.head)
    override def withNewMutableAggBufferOffset(o: Int): CountMinAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): CountMinAgg =
      copy(inputAggBufferOffset = o)
    override def prettyName: String = "countmin_agg"
  }

  /** Merges pre-aggregated Count-Min blobs (the rollup side: per-lang →
    * corpus). Elementwise Long addition — exact at any rollup depth. */
  case class CountMinMergeAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

    override def createAggregationBuffer(): Array[Long] =
      new Array[Long](Cm.Depth * Cm.Width)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val other = Cm.fromBytes(v.asInstanceOf[Array[Byte]])
        var i = 0
        while (i < buf.length) { buf(i) += other(i); i += 1 }
      }
      buf
    }

    override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
      var i = 0
      while (i < buf.length) { buf(i) += other(i); i += 1 }
      buf
    }

    override def eval(buf: Array[Long]): Any = Cm.toBytes(buf)
    override def serialize(buf: Array[Long]): Array[Byte] = Cm.toBytes(buf)
    override def deserialize(bytes: Array[Byte]): Array[Long] = Cm.fromBytes(bytes)

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def children: Seq[Expression] = Seq(child)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(child = c.head)
    override def withNewMutableAggBufferOffset(o: Int): CountMinMergeAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): CountMinMergeAgg =
      copy(inputAggBufferOffset = o)
    override def prettyName: String = "countmin_merge_agg"
  }

  /** Point estimate min over rows — evaluated on rolled-up rows (one blob
    * per group × a bounded probe list), so per-call deserialization is off
    * the hot path by construction. */
  case class CmEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def nullSafeEval(blob: Any, term: Any): Any = {
      val a = Cm.fromBytes(blob.asInstanceOf[Array[Byte]])
      val ix = Cm.idxAll(term.toString)
      var best = Long.MaxValue
      var i = 0
      while (i < Cm.Depth) {
        val v = a(ix(i)); if (v < best) best = v; i += 1
      }
      best
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): CmEstimate =
      copy(left = l, right = r)
    override def prettyName: String = "cm_estimate"
  }

  /** Stream length N — any single row of the table sums to N. */
  case class CmTotal(child: Expression)
    extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def nullSafeEval(input: Any): Any = {
      val a = Cm.fromBytes(input.asInstanceOf[Array[Byte]])
      var s = 0L
      var i = 0
      while (i < Cm.Width) { s += a(i); i += 1 }
      s
    }
    override protected def withNewChildInternal(c: Expression): CmTotal =
      copy(child = c)
    override def prettyName: String = "cm_total"
  }

  // ------------------------------------------------------- Column sugar

  private def agg(e: TypedImperativeAggregate[_]): Column =
    Bridge.column(e.toAggregateExpression())

  def kllAgg(c: Column, k: Int = 200): Column =
    agg(KllSketchAgg(Bridge.expression(c), k))
  def kllMergeAgg(c: Column, k: Int = 200): Column =
    agg(KllMergeAgg(Bridge.expression(c), k))
  def kllQuantile(c: Column, q: Double): Column =
    Bridge.column(KllQuantile(Bridge.expression(c), q))

  def thetaAgg(c: Column, lgK: Int = 16): Column =
    agg(ThetaSketchAgg(Bridge.expression(c), lgK))
  def thetaUnionAgg(c: Column, lgK: Int = 16): Column =
    agg(ThetaUnionAgg(Bridge.expression(c), lgK))
  def thetaIntersectAgg(c: Column): Column =
    agg(ThetaIntersectAgg(Bridge.expression(c)))
  def thetaPairIntersect(a: Column, b: Column): Column =
    Bridge.column(ThetaPairIntersect(Bridge.expression(a), Bridge.expression(b)))
  def thetaEstimate(c: Column): Column =
    Bridge.column(ThetaEstimate(Bridge.expression(c)))

  def cmAgg(c: Column): Column = agg(CountMinAgg(Bridge.expression(c)))
  def cmMergeAgg(c: Column): Column = agg(CountMinMergeAgg(Bridge.expression(c)))
  def cmEstimate(sk: Column, term: Column): Column =
    Bridge.column(CmEstimate(Bridge.expression(sk), Bridge.expression(term)))
  def cmTotal(c: Column): Column = Bridge.column(CmTotal(Bridge.expression(c)))

  def freqAgg(c: Column, lgMaxMapSize: Int = 10): Column =
    agg(FreqSketchAgg(Bridge.expression(c), lgMaxMapSize))
  def freqMergeAgg(c: Column, lgMaxMapSize: Int = 10): Column =
    agg(FreqMergeAgg(Bridge.expression(c), lgMaxMapSize))
  def freqItems(c: Column): Column =
    Bridge.column(FreqItems(Bridge.expression(c)))
  def freqStreamLength(c: Column): Column =
    Bridge.column(FreqStreamLength(Bridge.expression(c)))
}
