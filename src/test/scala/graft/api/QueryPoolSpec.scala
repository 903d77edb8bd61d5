package graft.api

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/**
 * Guards the pooled Verify/Bench execution mode (SPARK_GRAFT_POOL): running
 * catalog queries CONCURRENTLY on one shared SparkSession must produce
 * row-identical results to running them sequentially. The hazards this pins:
 * createOrReplaceTempView of the shared table views from several threads,
 * query-private temp views (q627's __so_*, q418's __rh_*) racing the
 * catalog, and the one-time function/strategy registration (SparkEntry.init
 * is called once up front by the mains; here every thread calls the query fn
 * directly, which exercises the per-query idempotent init path).
 */
class QueryPoolSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // a mix that covers private-temp-view queries, geo, dedup, and plain SQL
  private val names = Seq(
    "q1_agg", "q20_spatial_join", "q32_dedup_prefix_groups", "q35_minhash_lsh",
    "q418_rec_holdout", "q627_slope_one", "q455_qini", "q8_topk_per_group")

  private def run(name: String): Seq[String] =
    graft.SparkEntry.queries(name)(spark, dir)
      .collect().map(_.toString).sorted.toSeq

  test("concurrent execution matches sequential results") {
    val sequential = names.map(n => n -> run(n)).toMap
    // 4 threads, 2 passes each, work-stealing over the shuffled list — the
    // private-view queries co-run with everything else both times
    val queue = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    (names ++ names.reverse).foreach(queue.add)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (1 to 4).map { _ =>
      val t = new Thread(() => {
        var n = queue.poll()
        while (n != null) {
          try {
            val got = run(n)
            if (got != sequential(n))
              failures.add(s"$n: pooled result differs (${got.size} vs ${sequential(n).size} rows)")
          } catch {
            case e: Throwable => failures.add(s"$n: ${e.getMessage}")
          }
          n = queue.poll()
        }
      })
      t.start(); t
    }
    threads.foreach(_.join())
    assert(failures.isEmpty, failures.toArray.mkString("; "))
  }
}
