package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name filter (local iteration
    // only — the driver always calls with 2 args and gets the full dump)
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.muteBoundedWindowWarning() // setLogLevel rewrites all logger configs
    // queries may reference graft SQL functions by name (nfc_normalize
    // in the canonical-dedup digest); register on the running session
    functions.GraftExtensions.register(spark)
    new java.io.File(outDir).mkdirs()
    val failed = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      // repartition(1), not coalesce(1): coalesce removes the barrier and
      // computes the whole query on one core; repartition keeps upstream
      // parallelism and still writes a single file.
      try {
        fn(spark, sfDir).repartition(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        System.err.println(f"[verify] $name ok in ${(System.nanoTime() - t0) / 1e9}%.1fs")
      } catch { case e: Throwable =>
        // A broken query must read as FAILED downstream, not as "not
        // registered": dump a one-row marker frame under the query's own
        // name so the driver's DuckDB compare reports a loud
        // schema/hash mismatch instead of silently skipping the key.
        failed += name -> String.valueOf(e.getMessage).take(500)
        System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
        try {
          import spark.implicits._
          Seq(failed.last._2).toDF("_verify_error")
            .write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case _: Throwable => () }
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
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Independent accounting (ADVICE r8): registered-vs-dumped counts come
    // from the registry itself, never back-computed from the dump, so a
    // silent failure cannot hide in the arithmetic.
    val failJson = failed.map { case (n, m) => s"${q(n)}: ${q(m)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_status.json"),
      s"""{"registered": ${SparkEntry.queries.size}, "failed": $failJson}""")
    if (failed.nonEmpty)
      System.err.println(s"[verify] ${failed.size}/${SparkEntry.queries.size} queries FAILED: " +
        failed.map(_._1).mkString(", "))
    spark.stop()
  }
}
