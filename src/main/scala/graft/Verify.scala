package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg (local dev only): comma-separated query-name prefixes
    val prefixes = if (args.length > 2) args(2).split(",").toSeq else Seq("")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Delete each query's previous output BEFORE running it: a failure
    // that fires before the write executes must leave NO output behind,
    // or a reused outDir would let the compare pass on stale results.
    def deleteRecursively(f: java.io.File): Unit = {
      // listFiles() returns null on I/O error — warn, or one bad dir NPEs
      // the whole verify run; a SILENT skip would leave stale output behind,
      // which is exactly the stale-results-pass-compare hazard above
      if (f.isDirectory) {
        val children = f.listFiles()
        if (children == null)
          System.err.println(s"[verify] WARNING: cannot list $f — stale children may survive")
        Option(children).getOrElse(Array.empty[java.io.File]).foreach(deleteRecursively)
      }
      if (!f.delete() && f.exists())
        System.err.println(s"[verify] WARNING: could not delete stale $f")
    }
    SparkEntry.queries
      .filter { case (name, _) => prefixes.exists(name.startsWith) }
      .foreach { case (name, fn) =>
      deleteRecursively(new java.io.File(s"$outDir/$name"))
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
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
    spark.stop()
  }
}
