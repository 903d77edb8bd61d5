package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class PlanUtilSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("widenIfNarrow repartitions a 1-partition frame to default parallelism") {
    val narrow = (1 to 100).toDF("x").coalesce(1).localCheckpoint()
    assert(narrow.rdd.getNumPartitions == 1)
    val wide = PlanUtil.widenIfNarrow(narrow)
    assert(wide.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    assert(wide.collect().map(_.getInt(0)).sorted.toSeq == (1 to 100))
  }

  test("widenIfNarrow is a no-op on an already-wide frame") {
    val p = spark.sparkContext.defaultParallelism
    val wideIn = (1 to 100).toDF("x").repartition(p).localCheckpoint()
    val out = PlanUtil.widenIfNarrow(wideIn)
    // same object back: no extra exchange inserted for production-wide inputs
    assert(out eq wideIn)
  }

  test("widenIfNarrow no-op threshold is half the default parallelism") {
    val p = spark.sparkContext.defaultParallelism
    assume(p >= 2)
    // ceil(p/2): with ODD p, floor(p/2)*2 < p sits BELOW the documented
    // no-op condition (numPartitions*2 >= p) and would legitimately widen
    val half = (1 to 100).toDF("x").repartition((p + 1) / 2).localCheckpoint()
    assert(PlanUtil.widenIfNarrow(half) eq half)
  }
}
