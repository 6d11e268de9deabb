package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
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
