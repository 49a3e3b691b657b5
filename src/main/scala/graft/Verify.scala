package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // Optional 3rd arg (builder-side only; the driver passes 2): a
    // comma-separated query-name filter for fast single-query re-checks.
    val (sfDir, outDir, only) = args match {
      case Array(s, o)    => (s, o, None)
      case Array(s, o, q) => (s, o, Some(q.split(",").toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val selected = only match {
      case Some(names) => SparkEntry.queries.view.filterKeys(names).toMap
      case None        => SparkEntry.queries
    }
    // Driver-comparator constraint: its pandas hash gate crashes on
    // array/map/struct values ("unhashable type"), so an oracle-checked
    // query with a non-scalar column can never pass — refuse to dump it
    // and fail loudly rather than ship a result the gate will choke on.
    def nonScalar(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.schema.fields.collect {
        case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] ||
          f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType] ||
          f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType] => f.name
      }.toSeq
    selected.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val bad = if (SparkEntry.oracleSql.contains(name)) nonScalar(df) else Nil
        if (bad.nonEmpty) {
          System.err.println(s"[verify] $name REJECTED: oracle-checked query " +
            s"emits non-scalar columns ${bad.mkString(",")} — the driver's " +
            "comparator cannot hash these; stringify on both engines")
          // a previous run's dump must not survive the rejection: the
          // comparator would read the stale parquet and report PASS,
          // masking exactly the regression this guard exists to surface
          graft.util.Fs.deleteRecursively(s"$outDir/$name")
        } else df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
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
    val oracles = only match {
      case Some(names) => SparkEntry.oracleSql.view.filterKeys(names).toMap
      case None        => SparkEntry.oracleSql
    }
    val json = oracles
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
