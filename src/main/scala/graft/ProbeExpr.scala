package graft
import org.apache.spark.scheduler._
import scala.collection.mutable
object ProbeExpr {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = mutable.ArrayBuffer[(Int, Long, Int, Long, Long, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        val tm = si.taskMetrics
        stages += ((si.stageId, ms, si.numTasks, tm.executorRunTime,
          tm.executorDeserializeTime, tm.jvmGCTime, si.name.split("\n")(0).take(50)))
      }
    })
    val fn = SparkEntry.queries(sys.env.getOrElse("PROBE_Q", "q84_interval_jaccard"))
    (1 to 3).foreach { i =>
      stages.clear()
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      Thread.sleep(400)
      println(f"=== run $i total ${(System.nanoTime()-t0)/1e9}%.2fs")
      if (i == 3) stages.sortBy(_._1).foreach { case (id, ms, nt, rt, dt, gc, nm) =>
        println(f"  stage $id%3d wall=${ms}%5d tasks=$nt%3d run=${rt}%5d deser=${dt}%4d gc=${gc}%4d  $nm") }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
