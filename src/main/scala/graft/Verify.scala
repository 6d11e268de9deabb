package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, only) = (args(0), args(1), args.drop(2).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val declared = SparkEntry.queries.keys.toList
      .filter(name => only.isEmpty || only(name)).sorted
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // The driver's pandas comparator sorts/hashes every output column;
        // array/map/struct columns crash it (round-10 s7_activity_tws).
        // Reject them at the source so the failure is a loud builder error,
        // never a silent driver-side comparator crash.
        import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
        val complex = df.schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] => f.name
        }
        if (complex.nonEmpty)
          throw new IllegalStateException(
            s"non-atomic output columns ${complex.mkString("[", ",", "]")} — " +
              "canonicalize to scalars (e.g. array_join) before returning")
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        errors(name) = s"${e.getClass.getName}: ${e.getMessage}"
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Declared-vs-checked contract (round-8 lesson: the driver's CORRECTNESS
    // sheet silently OMITS rows whose output is missing, so 82/82 read as a
    // clean sheet when 10 of 92 queries failed at analysis). The declared
    // list lets any checker fail loudly on a query that produced nothing —
    // tools/check_oracle.py treats every name here with no output dir as a
    // failure, oracle or not.
    Files.writeString(Paths.get(s"$outDir/declared_queries.json"),
      declared.map(q).mkString("[", ",", "]"))
    Files.writeString(Paths.get(s"$outDir/verify_errors.json"),
      errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    if (errors.nonEmpty) {
      System.err.println(s"[verify] ${errors.size} of ${declared.size} queries FAILED: " +
        errors.keys.mkString(", "))
    }
    spark.stop()
  }
}
