package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` for named queries into one file each —
  * the per-round plan artifacts (plans/rNN/<query>_{before,after}.txt).
  * Usage:
  *   sbt -batch "runMain graft.PlanDump <dataDir> <outDir> <suffix> q1 q2..."
  * Plans are generated WITHOUT executing the query (explainString on the
  * built DataFrame); streaming-drain queries run their pipeline as a side
  * effect of building the read-back frame, so pass sf0.001 for speed —
  * plan shapes are scale-invariant.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3).toSeq
    Files.createDirectories(Paths.get(outDir))
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val out = Paths.get(outDir, s"${name}_$suffix.txt")
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        Files.writeString(out, df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        System.err.println(s"[plandump] wrote $out")
      } catch {
        case e: Throwable =>
          Files.writeString(out, s"ERROR: $e")
          System.err.println(s"[plandump] FAILED $name: $e")
      }
    }
    spark.stop()
  }
}
