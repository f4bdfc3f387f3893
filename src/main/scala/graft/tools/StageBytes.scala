package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev-only: run one catalog query with a listener printing each
  * stage's shuffle read/write and spill bytes — pinpoints which stage
  * of a multi-phase plan eats a box's scratch disk at audit scales.
  */
object StageBytes {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.cleaner.periodicGC.interval", "60s")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        def gb(b: Long) = f"${b / 1e9}%.2f"
        val durMs = (for {
          sub <- s.stageInfo.submissionTime
          done <- s.stageInfo.completionTime
        } yield done - sub).getOrElse(-1L)
        println(f"stage ${s.stageInfo.stageId} ${durMs / 1000.0}%.2fs " +
          s"tasks=${s.stageInfo.numTasks} " +
          s"write=${gb(m.shuffleWriteMetrics.bytesWritten)}GB/" +
          s"${m.shuffleWriteMetrics.recordsWritten / 1000000}M " +
          s"read=${gb(m.shuffleReadMetrics.remoteBytesRead + m.shuffleReadMetrics.localBytesRead)}GB/" +
          s"${m.shuffleReadMetrics.recordsRead / 1000000}M " +
          s"spillDisk=${gb(m.diskBytesSpilled)}GB " +
          s"in=${gb(m.inputMetrics.bytesRead)}GB : " +
          s.stageInfo.name.take(90))
      }
    })
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, sfDir)
    val n = df.count()
    println(f"done: ${(System.nanoTime() - t0) / 1e9}%.1fs rows=$n")
    // GRAFT_STAGEBYTES_PLAN=1: print the FINAL adaptive plan (post-
    // execution), where AQE's join rewrites and coalescing are visible
    if (sys.env.get("GRAFT_STAGEBYTES_PLAN").contains("1"))
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
