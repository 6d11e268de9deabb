package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/**
 * §2.8 — Hive type-string introspection. The reference treats the type
 * strings inside StorageDescriptor columns as opaque payload (it never
 * parses them; see the deeply nested `struct<...>` blobs in
 * src/test/resources/sample_table_schema.json:9-72). This optional module
 * parses them, which buys two things the reference can't do:
 *
 *  - `toSparkType`: materialize a replicated table's schema as a Spark
 *    StructType — the bridge from catalog metadata to an actual
 *    `spark.read.schema(...)` over the table's data;
 *  - structural introspection (kind/depth/leaf-count) for schema-drift
 *    queries over the catalog plane.
 *
 * Grammar (Hive LanguageManual DDL types):
 *   type      := primitive | array<type> | map<type,type>
 *              | struct<name:type,...> | uniontype<type,...>
 *   primitive := ident [ '(' digits [, digits] ')' ]   -- decimal/char/varchar
 *
 * Parsing is driver- or executor-side Scala on metadata-scale strings
 * (thousands of columns, not billions of rows), so plain Scala UDFs are the
 * right tool here — this is not a data-plane hot path.
 */
object HiveTypes {

  sealed trait HType
  final case class HPrimitive(name: String, params: Seq[Int] = Seq.empty) extends HType
  final case class HArray(elem: HType) extends HType
  final case class HMap(key: HType, value: HType) extends HType
  final case class HStruct(fields: Seq[(String, HType)]) extends HType
  final case class HUnion(alts: Seq[HType]) extends HType

  /** Parse a Hive type string; Left(error) on malformed input (never throws —
    * catalog metadata is untrusted wire content). */
  def parse(s: String): Either[String, HType] = {
    val p = new Parser(s)
    try {
      val t = p.parseType()
      p.skipWs()
      if (p.pos != s.length) Left(s"trailing input at ${p.pos}: '${s.drop(p.pos)}'")
      else Right(t)
    } catch {
      case e: ParseError => Left(e.getMessage)
    }
  }

  private final class ParseError(msg: String) extends RuntimeException(msg)

  private final class Parser(s: String) {
    var pos = 0
    def skipWs(): Unit = while (pos < s.length && s.charAt(pos).isWhitespace) pos += 1
    private def fail(msg: String) = throw new ParseError(s"$msg at $pos in '$s'")
    private def expect(c: Char): Unit = {
      skipWs()
      if (pos >= s.length || s.charAt(pos) != c) fail(s"expected '$c'")
      pos += 1
    }
    private def ident(): String = {
      skipWs()
      val start = pos
      while (pos < s.length && (s.charAt(pos).isLetterOrDigit || s.charAt(pos) == '_')) pos += 1
      if (pos == start) fail("expected identifier")
      s.substring(start, pos)
    }

    def parseType(): HType = {
      val name = ident().toLowerCase
      name match {
        case "array" => expect('<'); val e = parseType(); expect('>'); HArray(e)
        case "map" => expect('<'); val k = parseType(); expect(','); val v = parseType(); expect('>'); HMap(k, v)
        case "struct" =>
          expect('<')
          val fields = Seq.newBuilder[(String, HType)]
          var first = true
          while ({ skipWs(); pos < s.length && s.charAt(pos) != '>' }) {
            if (!first) expect(',')
            first = false
            val fname = ident()
            expect(':')
            fields += fname -> parseType()
          }
          expect('>')
          HStruct(fields.result())
        case "uniontype" =>
          expect('<')
          val alts = Seq.newBuilder[HType]
          var first = true
          while ({ skipWs(); pos < s.length && s.charAt(pos) != '>' }) {
            if (!first) expect(',')
            first = false
            alts += parseType()
          }
          expect('>')
          HUnion(alts.result())
        case p =>
          skipWs()
          if (pos < s.length && s.charAt(pos) == '(') {
            pos += 1
            val params = Seq.newBuilder[Int]
            var first = true
            while ({ skipWs(); pos < s.length && s.charAt(pos) != ')' }) {
              if (!first) expect(',')
              first = false
              val d = ident()
              if (!d.forall(_.isDigit)) fail(s"expected digits, got '$d'")
              params += d.toInt
            }
            expect(')')
            HPrimitive(p, params.result())
          } else HPrimitive(p)
      }
    }
  }

  // ---------------------------------------------------------- introspection

  /** Top-level constructor: primitive | array | map | struct | uniontype. */
  def kind(t: HType): String = t match {
    case _: HPrimitive => "primitive"
    case _: HArray => "array"
    case _: HMap => "map"
    case _: HStruct => "struct"
    case _: HUnion => "uniontype"
  }

  /** Max nesting depth; a bare primitive is 1. */
  def depth(t: HType): Int = t match {
    case _: HPrimitive => 1
    case HArray(e) => 1 + depth(e)
    case HMap(k, v) => 1 + math.max(depth(k), depth(v))
    case HStruct(fs) => 1 + (if (fs.isEmpty) 0 else fs.map(f => depth(f._2)).max)
    case HUnion(as) => 1 + (if (as.isEmpty) 0 else as.map(depth).max)
  }

  /** Number of primitive leaves (map keys count — they are data). */
  def leafCount(t: HType): Int = t match {
    case _: HPrimitive => 1
    case HArray(e) => leafCount(e)
    case HMap(k, v) => leafCount(k) + leafCount(v)
    case HStruct(fs) => fs.map(f => leafCount(f._2)).sum
    case HUnion(as) => as.map(leafCount).sum
  }

  /** Hive type → Spark DataType (the schema bridge; unions — which Spark
    * lacks — widen to string, the conventional lossy mapping). */
  def toSparkType(t: HType): DataType = t match {
    case HPrimitive("tinyint", _) => ByteType
    case HPrimitive("smallint", _) => ShortType
    case HPrimitive("int", _) | HPrimitive("integer", _) => IntegerType
    case HPrimitive("bigint", _) => LongType
    case HPrimitive("float", _) => FloatType
    case HPrimitive("double", _) => DoubleType
    case HPrimitive("boolean", _) => BooleanType
    case HPrimitive("binary", _) => BinaryType
    case HPrimitive("date", _) => DateType
    case HPrimitive("timestamp", _) => TimestampType
    case HPrimitive("decimal", Seq(p, sc)) => DecimalType(p, sc)
    case HPrimitive("decimal", Seq(p)) => DecimalType(p, 0)
    case HPrimitive("decimal", _) => DecimalType(10, 0)
    case HPrimitive("string", _) | HPrimitive("char", _) | HPrimitive("varchar", _) => StringType
    case HPrimitive(other, _) => StringType // unknown primitives degrade to string, never throw
    case HArray(e) => ArrayType(toSparkType(e))
    case HMap(k, v) => MapType(toSparkType(k), toSparkType(v))
    case HStruct(fs) => StructType(fs.map { case (n, ft) => StructField(n, toSparkType(ft)) })
    case HUnion(_) => StringType
  }

  /** Register the introspection surface as session UDFs (metadata-plane use;
    * see scaladoc on why UDFs are acceptable here). Null-safe: null/malformed
    * input → null outputs. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("hive_type_kind",
      (s: String) => Option(s).flatMap(x => parse(x).toOption).map(kind).orNull)
    spark.udf.register("hive_type_depth",
      (s: String) => Option(s).flatMap(x => parse(x).toOption).map(depth))
    spark.udf.register("hive_type_leaves",
      (s: String) => Option(s).flatMap(x => parse(x).toOption).map(leafCount))
    spark.udf.register("hive_type_to_ddl",
      (s: String) => Option(s).flatMap(x => parse(x).toOption)
        .map(t => toSparkType(t).catalogString).orNull)
  }
}
