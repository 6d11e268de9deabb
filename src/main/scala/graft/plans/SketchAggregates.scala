package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * bottom_k_md5(value, k) — the k lexicographically-smallest DISTINCT md5-hex
 * digests of a string column, as a sorted array<string>: a one-permutation
 * bottom-k MinHash sketch of a SET (KMV — k minimum values).
 *
 * This is the SURVEY §2.8 "MinHash TypedImperativeAggregate": where the
 * per-row `minhash_sig` expression sketches one document, this AGGREGATE
 * sketches a whole corpus slice (a source, a day, a shard) in one pass.
 * The state is O(k) per group and MERGEABLE, so partial aggregation runs
 * map-side and the exchange carries ≤ k digests per (partition, group) —
 * never the shingle stream. The SQL twin (`row_number() OVER (ORDER BY
 * md5(x))` ≤ k over distinct values) shuffles every distinct shingle to one
 * partition per group; at a web-corpus vocabulary that is the difference
 * between a bounded sketch exchange and a vocabulary-wide sort.
 *
 * Two sketches estimate the Jaccard similarity of the underlying sets:
 * est = |bottomK(A ∪ B) ∩ sigA ∩ sigB| / k — the classic KMV estimator.
 * md5 (not xxhash) is deliberate: DuckDB's md5() replays the exact digests,
 * so the sketch itself is oracle-checkable, not just its downstream use.
 */
case class BottomKMd5(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[String]]
  with UnaryLike[Expression] {

  require(k > 0, s"k must be positive, got $k")

  override def prettyName: String = "bottom_k_md5"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bottom_k_md5 needs a string input, got ${child.dataType.catalogString}")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[String] =
    new java.util.TreeSet[String]()

  override def update(buf: java.util.TreeSet[String], input: InternalRow): java.util.TreeSet[String] = {
    val v = child.eval(input)
    if (v != null) {
      val hex = SketchOps.md5Hex(v.asInstanceOf[UTF8String].toString)
      // bounded insert: skip values already past the current k-th smallest
      if (buf.size < k || hex.compareTo(buf.last()) < 0) {
        buf.add(hex)
        if (buf.size > k) buf.pollLast()
      }
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[String], other: java.util.TreeSet[String]): java.util.TreeSet[String] = {
    val it = other.iterator()
    var continue = true
    while (continue && it.hasNext) {
      val hex = it.next()
      if (buf.size < k || hex.compareTo(buf.last()) < 0) {
        buf.add(hex)
        if (buf.size > k) buf.pollLast()
      } else continue = false // `other` is sorted: the rest is even larger
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[String]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  // digests are fixed-width lowercase hex — newline-joined UTF-8 is a
  // trivially correct wire format for the shuffle
  override def serialize(buf: java.util.TreeSet[String]): Array[Byte] =
    String.join("\n", buf).getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[String] = {
    val buf = new java.util.TreeSet[String]()
    if (bytes.nonEmpty) {
      val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      s.split("\n", -1).foreach(buf.add)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKMd5 =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKMd5 =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BottomKMd5 =
    copy(child = newChild)
}

/**
 * hll_md5(value, p) — HyperLogLog distinct-count estimate over a string
 * column: m = 2^p one-byte registers, hash = the corpus-wide 48-bit md5 draw
 * (first 12 hex chars — the same `hash48` every sampling operator shares, so
 * DuckDB replays the hash EXACTLY). THE mergeable distinct sketch of a
 * 100 TB pipeline: where `count(distinct token)` shuffles every distinct
 * value to one partition per group, the HLL state is a fixed 2^p bytes per
 * (partition, group), merges by elementwise max (map-side partials, a
 * 256-byte exchange at p=8), and unions across corpus slices for free —
 * per-shard sketches roll up to the corpus cardinality without touching the
 * token stream again.
 *
 * Everything downstream of the hash is integer/power-of-two arithmetic, so
 * the SQL oracle replays the ESTIMATE bit-for-bit, not just approximately:
 *  - register j = hash >> (48-p); rho = leading zeros of the remaining
 *    (48-p)-bit field + 1 = (48-p) + 1 - bitLength(rest) (rest = 0 → max);
 *  - Z = Σ 2^-M[j] sums exact binary fractions spanning < 53 bits — the sum
 *    is order-independent in IEEE double, so partial-agg order can't flip it
 *    (the q9 lesson applied at design time);
 *  - E = α_m·m²/Z, with the standard small-range correction
 *    E ≤ 2.5m ∧ V>0 → m·ln(m/V) (V = empty registers). The one
 *    transcendental (ln) rounds to 4dp — the weighted-sample discipline.
 *
 * Flajolet–Fuss–Gandouet–Meunier 2007 constants: α_16=.673, α_32=.697,
 * α_64=.709, else .7213/(1+1.079/m). 48 hash bits bound the no-collision
 * range to ~2^24 distinct per group — far above any per-source vocabulary
 * here; the 100 TB variant swaps in 16 hex chars (64-bit) unchanged.
 */
/**
 * cms_md5(value, d, w) — Count–Min frequency sketch over a string column:
 * d independent hash rows of w counters, returned as one array<long> of
 * length d·w (row-major). The frequency twin of [[HllMd5]]: where an exact
 * per-key frequency table shuffles every (group, key) pair, the CMS state
 * is a FIXED d·w longs per (partition, group), merges by elementwise sum
 * (map-side partials — a 1 KB exchange at d=4, w=16, any corpus size), and
 * answers point-frequency queries for ANY key after the fact:
 * est(key) = min_i sketch[i·w + h_i(key)], with est ≥ exact always and
 * P[est > exact + εN] ≤ (1/2)^d at w = e/ε (Cormode–Muthukrishnan 2005).
 * Complements the Misra–Gries pass (X13, exact top-k identities): MG names
 * the heavy hitters, the CMS bounds the frequency of every key it was
 * never asked about — the pair a mixing/contamination pass wants.
 *
 * Row hashes stay inside the corpus-wide md5 discipline so DuckDB replays
 * the sketch BIT-FOR-BIT, counters and all: h_i(v) = the 48-bit draw of
 * the salted string "i:v" (first 12 hex chars of md5), mod w. Counter
 * arithmetic is integer end-to-end — the oracle rebuilds every (row,
 * bucket) counter with a GROUP BY and takes the same min.
 */
case class CmsMd5(
    child: Expression,
    d: Int,
    w: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(d >= 1 && d <= 8, s"depth d must be in [1, 8], got $d")
  require(w >= 2 && w <= 65536, s"width w must be in [2, 65536], got $w")

  override def prettyName: String = "cms_md5"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_md5 needs a string input, got ${child.dataType.catalogString}")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      var i = 0
      while (i < d) {
        val hex = SketchOps.md5Hex(i.toString + ":" + s)
        val hash = java.lang.Long.parseLong(hex.substring(0, 12), 16)
        buf(i * w + (hash % w).toInt) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var j = 0
    while (j < buf.length) { buf(j) += other(j); j += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMd5 =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMd5 =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsMd5 =
    copy(child = newChild)
}

case class HllMd5(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  require(p >= 4 && p <= 12, s"p must be in [4, 12], got $p")
  private val m = 1 << p
  private val restBits = 48 - p
  private val restMask = (1L << restBits) - 1

  override def prettyName: String = "hll_md5"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_md5 needs a string input, got ${child.dataType.catalogString}")
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val hex = SketchOps.md5Hex(v.asInstanceOf[UTF8String].toString)
      val hash = java.lang.Long.parseLong(hex.substring(0, 12), 16)
      val j = (hash >>> restBits).toInt
      val rest = hash & restMask
      val rho = if (rest == 0L) restBits + 1
        else restBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
      if (rho > buf(j)) buf(j) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < m) { if (other(j) > buf(j)) buf(j) = other(j); j += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    var z = 0.0
    var v = 0
    var j = 0
    while (j < m) {
      val r = buf(j).toInt
      if (r == 0) v += 1
      z += 1.0 / (1L << r).toDouble // 2^-r exactly; r=0 contributes 1.0
      j += 1
    }
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    val e = alpha * m * m / z
    val corrected =
      if (e <= 2.5 * m && v > 0) m * math.log(m.toDouble / v) else e
    // one transcendental may differ across libm — 4dp absorbs it
    math.rint(corrected * 1e4) / 1e4
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMd5 =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMd5 =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllMd5 =
    copy(child = newChild)
}

/**
 * hist_quantile(value, p100, width, buckets) — X60: mergeable FIXED-GRID
 * histogram quantile sketch, the QUANTILE member of the sketch family next
 * to X47's HLL (cardinality) and X51's CMS (frequency). The exact
 * `percentile` the profiling rows use shuffles EVERY value into a per-group
 * sort — correct, but at 100 TB the per-group exchange is the corpus; this
 * sketch's state is `buckets` long counters (1 KB at 128), merge is
 * elementwise sum (map-side partials, bounded exchange per (partition,
 * group)), and the answer carries a DETERMINISTIC absolute error bound:
 * the estimate is the inclusive upper edge of the bucket where the
 * cumulative count first reaches the rank, so |est − exact| < width always.
 *
 * Everything is integer arithmetic — bucket = min(v / width, buckets−1),
 * rank test = 100·cum ≥ p100·total (no float rank, no interpolation) — so
 * a DuckDB GROUP BY + window cumsum rebuilds the sketch AND the estimate
 * bit-for-bit; the exact percentile rides along in the oracle row as the
 * accuracy certificate. Values below zero clamp to bucket 0, values past
 * the grid clamp to the overflow bucket (its edge reports as
 * buckets·width − 1 — size the grid to the domain, which profiling rows
 * know by construction).
 */
case class HistQuantile(
    child: Expression,
    p100: Int,
    width: Int,
    buckets: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(p100 >= 1 && p100 <= 100, s"p100 must be in [1, 100], got $p100")
  require(width >= 1, s"width must be positive, got $width")
  require(buckets >= 2 && buckets <= 65536, s"buckets must be in [2, 65536], got $buckets")

  override def prettyName: String = "hist_quantile"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.ShortType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hist_quantile needs an integral input, got ${other.catalogString}")
  }
  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Long] = new Array[Long](buckets)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Number].longValue()
      val b = if (x < 0L) 0 else math.min(x / width, (buckets - 1).toLong).toInt
      buf(b) += 1L
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var j = 0
    while (j < buf.length) { buf(j) += other(j); j += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    var total = 0L
    var j = 0
    while (j < buf.length) { total += buf(j); j += 1 }
    if (total == 0L) null
    else {
      var cum = 0L
      var b = 0
      var out = -1L
      while (b < buf.length && out < 0L) {
        cum += buf(b)
        if (100L * cum >= p100.toLong * total) out = (b + 1).toLong * width - 1L
        b += 1
      }
      out
    }
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HistQuantile =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistQuantile =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HistQuantile =
    copy(child = newChild)
}

/**
 * top_k_by(score, id, k) — X61: mergeable per-group TOP-K aggregate.
 * State is a bounded heap of ≤ k (score, id) pairs per (partition, group),
 * merge = heap union, so partials run map-side and the exchange carries
 * ≤ k pairs per (partition, group) no matter how hot the group — the
 * segmentDedup groupBy-MIN move generalized from k = 1 to any k.
 *
 * Honest accounting vs the `row_number() OVER (...) <= k` window form:
 * since Spark 3.5 the WindowGroupLimit rewrite also caps that plan's
 * exchange at k rows per (partition, group) — X34's weightedSample leans
 * on exactly that — so on pure shuffle volume the two are PEERS, not the
 * naive full-sort-per-group story. What the aggregate form adds:
 * (a) it COMPOSES — top-k ids, count, sum, and any other aggregate over
 *     the same groupBy compute in ONE pass (the window form needs a second
 *     pass or a self-join to attach group-level stats);
 * (b) no per-partition sort — the heap is O(rows·log k) with no Sort node,
 *     and the plan stays inside ObjectHashAggregate with the other sketch
 *     aggregates (HLL/CMS/hist) it shares a pass with;
 * (c) the rewrite is fragile — WindowGroupLimit only fires on the exact
 *     rank-filter idiom, while an aggregate's partials are structural.
 *
 * Deterministic total order: score DESC, id ASC on ties — the result is a
 * function of the SET of inputs (partitioning-invariant) and a SQL
 * `row_number` window replays it exactly (on unique ids; identical
 * (score, id) duplicates collapse — set semantics). Returns the winning
 * ids as an ordered array (rank = position + 1); posexplode scalarizes it.
 */
case class TopKBy(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Long, Long)]]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  require(k >= 1 && k <= 65536, s"k must be in [1, 65536], got $k")

  override def prettyName: String = "top_k_by"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_k_by needs (bigint score, bigint id), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // order: better-first = (score DESC, id ASC); the TreeSet keeps the k best
  private val ord: Ordering[(Long, Long)] =
    Ordering.by[(Long, Long), (Long, Long)] { case (s, i) => (-s, i) }

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Long)] =
    new java.util.TreeSet[(Long, Long)](ord)

  private def add(buf: java.util.TreeSet[(Long, Long)], e: (Long, Long)): Unit = {
    buf.add(e)
    if (buf.size > k) buf.remove(buf.last)
  }

  override def update(buf: java.util.TreeSet[(Long, Long)], input: InternalRow)
      : java.util.TreeSet[(Long, Long)] = {
    val s = left.eval(input)
    val i = right.eval(input)
    if (s != null && i != null)
      add(buf, (s.asInstanceOf[Long], i.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: java.util.TreeSet[(Long, Long)],
      other: java.util.TreeSet[(Long, Long)]): java.util.TreeSet[(Long, Long)] = {
    other.forEach(e => add(buf, e))
    buf
  }

  override def eval(buf: java.util.TreeSet[(Long, Long)]): Any = {
    val out = new Array[Any](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { out(i) = it.next()._2; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Long, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.forEach { case (s, i) => bb.putLong(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.add((bb.getLong, bb.getLong)))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): TopKBy = copy(left = newLeft, right = newRight)
}
