package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round tooling: dump `explain("formatted")` for named
  * bench/gate queries to files, so before/after plan evidence can be
  * committed (plans/rNN/<query>_<tag>.txt).
  *
  * Usage: runMain graft.PlanDump <outDir> <tag> <name1,name2,...>
  * Env: SPARK_GRAFT_SF_DIR (data dir), SPARK_GRAFT_CPUS (local cores).
  * Names resolve against SparkEntry.queries plus the reader-bench
  * closures via graft.Bench is not linked here — b-family shapes are
  * reproduced by the equivalent SparkEntry-visible operators when
  * needed; q/x gate rows cover the declared surface.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: PlanDump <outDir> <tag> <name1,name2,...>")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val tag = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries
    names.foreach { n =>
      qs.get(n) match {
        case Some(fn) =>
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(outDir.resolve(s"${n}_$tag.txt"),
            txt.getBytes("UTF-8"))
          println(s"[plandump] wrote ${n}_$tag.txt")
        case None =>
          System.err.println(s"[plandump] unknown query: $n")
      }
    }
    spark.stop()
  }
}
