package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.window.WindowExec

/**
 * Catalog-wide single-partition-window audit (the q606/q610/q679 scale
 * hazard, measured instead of guessed): runs every SparkEntry query, walks
 * the EXECUTED plan, and for each WindowExec with an EMPTY partitionSpec
 * records the actual row count that flowed through it (child's
 * numOutputRows metric). An unpartitioned window over a bounded aggregate
 * (daily series, top-k report, bin table) is fine; one over a
 * key-cardinality relation is a global single-partition sort at scale.
 *
 * Usage: WindowAudit <sfDir> [rowThreshold=10000] — prints one line per
 * (query, window) above the threshold, then a summary.
 */
object WindowAudit {
  def main(args: Array[String]): Unit = {
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val threshold = args.drop(1).headOption.map(_.toLong).getOrElse(10000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.init(spark)

    // unwrap AQE / query-stage shells so WindowExec children are reachable
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val here = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec        => walk(q.plan)
        case other                    => Seq(other)
      }
      here ++ here.flatMap(_.children.flatMap(walk))
    }
    def rowsOf(p: SparkPlan): Long =
      p.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)

    var flagged = List.empty[(String, Long)]
    val names = graft.SparkEntry.queries.toSeq.sortBy(_._1)
    for ((name, fn) <- names) {
      try {
        val df = fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        val plans = walk(df.queryExecution.executedPlan).distinct
        val bad = plans.collect {
          case w: WindowExec if w.partitionSpec.isEmpty =>
            // the row count that entered the single partition
            val childRows = w.children.map(rowsOf).max
            math.max(childRows, rowsOf(w))
        }.filter(_ >= threshold)
        if (bad.nonEmpty) {
          val worst = bad.max
          flagged ::= (name, worst)
          println(f"[window-audit] $name%-28s unpartitioned window rows=$worst")
        }
      } catch {
        case e: Throwable =>
          System.err.println(s"[window-audit] $name failed: ${e.getMessage}")
      }
    }
    println(s"[window-audit] ${flagged.size} queries with an unpartitioned " +
      s"window over >= $threshold rows (sf=$sfDir)")
    flagged.sortBy(-_._2).foreach { case (n, r) => println(f"  $n%-28s $r") }
    spark.stop()
  }
}
