package graft.tools
import org.apache.spark.sql.SparkSession
import graft.SparkEntry
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // multi-phase similarity plans truncate lineage at staged
      // checkpoints; a 60s periodic driver GC lets the ContextCleaner
      // reap each phase's shuffle files BEFORE the next phase writes —
      // peak scratch becomes max-over-phases instead of sum-over-job
      // (the default 30min interval never fires inside one query)
      .config("spark.cleaner.periodicGC.interval", "60s")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    import scala.jdk.CollectionConverters._
    def gcMillis: Long =
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    def storageBytes: Long =
      spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum
    (1 to reps).foreach { r =>
      val g0 = gcMillis
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"rep$r: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n " +
        f"gc=${(gcMillis - g0) / 1000.0}%.1fs cachedRdds=${spark.sparkContext.getPersistentRDDs.size} " +
        f"storage=${storageBytes / 1e6}%.0fMB")
      // query boundary, mirroring graft.Bench: release staged one-shot
      // checkpoints deterministically (the storage print above shows
      // the PRE-drain footprint the query accumulated)
      graft.core.StagingScope.drain()
    }
    spark.stop()
  }
}
