package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Golden oracles for the KG pipeline queries: the INDEPENDENT
    * single-threaded Scala oracle's triples (graft.kg.Oracle — naive
    * algorithms, no shared code with the pipeline) dumped as parquet; the
    * driver's DuckDB oracle SQL reads these files, upgrading the flagship
    * KG queries from rows-only to a full hash compare. Each golden is
    * pinned by (name, version, content hash) in GOLDEN_HASH — Verify fails
    * loudly on silent generator/oracle co-drift (graft.kg.Golden.check). */
  def writeGoldens(spark: SparkSession): Unit = {
    import graft.kg.{Golden, KgConfig, Oracle, SyntheticCorpus}
    import spark.implicits._
    val corpus = SyntheticCorpus.generate(nPages = 100, seed = 42L)
    Golden.variants.foreach { case (name, version, cfg) =>
      val golden = corpus.pages.flatMap { p =>
        Oracle.processDoc(p, corpus.aliases, corpus.patterns,
          corpus.wdEntities, cfg)._2
          .map(t => (p.url, t.subject, t.predicate, t.obj, t.inferred))
      }
      // \u0001 field separator: unambiguous even if a field ever contains
      // another field's prefix (must match GoldenHashTool exactly)
      val canonical = golden.sorted.map(_.productIterator.mkString("\u0001"))
        .mkString("\n")
      Golden.check(name, version, Golden.sha1(canonical))
      golden.toDF("url", "subject", "predicate", "object", "inferred")
        .coalesce(1).write.mode("overwrite").parquet(Golden.path(name))
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val _ = new java.io.File(outDir).mkdirs()
    writeGoldens(spark)
    SparkEntry.queries.foreach { case (name, fn) =>
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
