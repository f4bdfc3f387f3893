package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // reap truncated-lineage shuffle files between query phases —
      // peak scratch = max-over-phases, not sum-over-job (see BenchOne)
      .config("spark.cleaner.periodicGC.interval", "60s")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // developer knob for large-SF audit reruns: skip queries whose
    // output already committed (the driver never sets it, so gate runs
    // always recompute everything)
    val skipExisting = sys.env.get("SPARK_GRAFT_VERIFY_SKIP_EXISTING").contains("1")
    // developer knob: restrict to a comma-separated query subset (the
    // driver never sets it, so gate runs always cover the catalog)
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // developer knob for the large-SF evidence sweeps: run the WHOLE
    // catalog EXCEPT a named exclusion list — "catalog minus named
    // exclusions" is structurally complete (a new query runs by
    // default; forgetting it is impossible), unlike a hand-maintained
    // ONLY list which silently misses additions (the r15 q117 lesson).
    // Excluded names are logged loudly so the evidence file records
    // them; names not in the catalog fail fast (a stale exclusion is
    // a typo, not a request).
    val except = sys.env.get("SPARK_GRAFT_VERIFY_EXCEPT")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    val staleExcept = except -- SparkEntry.queries.keySet
    if (staleExcept.nonEmpty)
      sys.error(s"SPARK_GRAFT_VERIFY_EXCEPT names not in the catalog: " +
        staleExcept.mkString(", "))
    except.toSeq.sorted.foreach(n =>
      System.err.println(s"[verify] $n EXCLUDED by SPARK_GRAFT_VERIFY_EXCEPT"))
    var ran, skipped, failed = 0
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .filter { case (name, _) => !except.contains(name) }
      .foreach { case (name, fn) =>
      // repartition(1), NOT coalesce(1): both yield the single part
      // file the gate reads, but coalesce collapses the query's whole
      // final stage (often a large hash aggregate) into one task —
      // at audit scales that serializes minutes of parallel work.
      // The extra exchange moves only the (small) result rows.
      val t0 = System.nanoTime()
      if (skipExisting && Files.exists(Paths.get(s"$outDir/$name/_SUCCESS"))) {
        skipped += 1
        System.err.println(s"[verify] $name skipped (exists)")
      } else try {
        fn(spark, sfDir).repartition(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        ran += 1
        System.err.println(f"[verify] $name ok ${(System.nanoTime() - t0) / 1e9}%.1fs")
      } catch { case e: Throwable =>
        failed += 1
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // query boundary: release the query's staged one-shot checkpoints
      // so a 139-query gate run doesn't accumulate pinned blocks
      graft.core.StagingScope.drain()
    }
    // completeness footer: the evidence file must account for every
    // catalog entry — run + skipped-existing + excluded-by-name must
    // sum to the catalog (when no ONLY restriction is active)
    System.err.println(s"[verify] catalog=${SparkEntry.queries.size} " +
      s"ran=$ran skipped_existing=$skipped failed=$failed " +
      s"excluded=${except.size}" +
      (if (only.isDefined) " (ONLY restriction active)" else ""))
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
