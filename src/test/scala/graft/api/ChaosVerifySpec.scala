package graft.api

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.TestSpark

/**
 * Environment-chaos correctness gate: the full SparkEntry catalog, run at
 * sf0.001 under a REFERENCE environment and again under a PERTURBED one,
 * must produce canonically identical results per query. This pins, in-repo,
 * the class of env sensitivity the driver's foreign box keeps finding
 * (rounds 4/6 hash-FAILed queries that passed every local replica):
 *
 *   - JVM default TimeZone (UTC vs America/New_York): ORC wall-clock
 *     semantics, java.sql.Date materialization, any formatter fallback.
 *   - JVM default Locale (ROOT vs tr — the upper/lower-case-i trap and
 *     decimal-comma formatting).
 *   - spark.sql.shuffle.partitions (4 vs 2): partition-count-sensitive
 *     aggregation/window/limit orderings.
 *   - pool (sequential vs 4 concurrent threads): the Verify default.
 *
 * Values are canonicalized structurally (epoch-day ints for dates, UTC
 * instants for timestamps, plain strings for decimals) so the comparison
 * itself cannot be fooled by env-dependent toString rendering.
 */
class ChaosVerifySpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  private def canon(v: Any): String = v match {
    case null => "␀"
    case d: java.sql.Date => "d" + d.toLocalDate.toEpochDay
    case d: java.time.LocalDate => "d" + d.toEpochDay
    case t: java.sql.Timestamp => "t" + t.toInstant.toString
    case t: java.time.Instant => "t" + t.toString
    case t: java.time.LocalDateTime => "n" + t.toString
    case b: java.math.BigDecimal => "m" + b.stripTrailingZeros.toPlainString
    case b: BigDecimal => "m" + b.underlying.stripTrailingZeros.toPlainString
    case f: Float => "f" + java.lang.Float.toString(f)
    case x: Double => "f" + java.lang.Double.toString(x)
    case a: Array[Byte] => "x" + a.map(b => f"$b%02x").mkString
    case s: Seq[_] => s.map(canon).mkString("[", ",", "]")
    case a: Array[_] => a.map(canon).mkString("[", ",", "]")
    case m: Map[_, _] =>
      m.toSeq.map { case (k, x) => canon(k) + "->" + canon(x) }
        .sorted.mkString("{", ",", "}")
    case r: org.apache.spark.sql.Row =>
      (0 until r.length).map(i => canon(r.get(i))).mkString("(", ",", ")")
    case s: String => "s" + s
    case other => other.toString
  }

  /** name -> canonical result (sorted column names + sorted canon rows). */
  private def snapshot(session: SparkSession, pool: Int): Map[String, String] = {
    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1)
    val (confMut, pooled) = qs.partition(kv => graft.SparkEntry.confMutating(kv._1))
    val out = new java.util.concurrent.ConcurrentHashMap[String, String]()
    def run(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      try {
        val df = fn(session, dir)
        val names = df.schema.fieldNames
        val order = names.indices.sortBy(names(_)).toArray
        val rows = df.collect()
          .map(r => order.map(i => canon(r.get(i))).mkString("|"))
          .sorted
        out.put(name, order.map(names(_)).mkString(",") + "\n" + rows.mkString("\n"))
      } catch {
        case e: Throwable => out.put(name, s"ERROR:${e.getClass.getName}:${e.getMessage}")
      }
    if (pool <= 1) pooled.foreach { case (n, f) => run(n, f) }
    else {
      val next = new java.util.concurrent.atomic.AtomicInteger(0)
      val threads = (1 to pool).map { _ =>
        val t = new Thread(() => {
          var i = next.getAndIncrement()
          while (i < pooled.size) {
            val (n, f) = pooled(i); run(n, f); i = next.getAndIncrement()
          }
        })
        t.start(); t
      }
      threads.foreach(_.join())
    }
    confMut.foreach { case (n, f) => run(n, f) }
    import scala.jdk.CollectionConverters._
    out.asScala.toMap
  }

  test("full catalog is invariant under TZ/locale/shuffle-partition/pool chaos") {
    val tz0 = java.util.TimeZone.getDefault
    val loc0 = java.util.Locale.getDefault
    try {
      // reference pass: pinned UTC/ROOT (what Verify/Bench now set),
      // shuffle.partitions=4 (TestSpark). Pooled like the chaos pass —
      // pooled==sequential is QueryPoolSpec's separately-guarded invariant,
      // and the sequential reference pass costs ~20 min vs ~5 pooled.
      java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
      java.util.Locale.setDefault(java.util.Locale.ROOT)
      val ref = snapshot(TestSpark.spark, pool = 4)

      // chaos pass: non-UTC JVM TZ, Turkish locale, 2 shuffle partitions,
      // 4-way pooled — all on a derived session (shared SparkContext)
      java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("America/New_York"))
      java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
      val chaosSession = TestSpark.spark.newSession()
      chaosSession.conf.set("spark.sql.shuffle.partitions", "2")
      chaosSession.conf.set("spark.sql.session.timeZone", "UTC")
      graft.functions.GeoRegistry.register(chaosSession)
      graft.pipeline.TextRegistry.register(chaosSession)
      val chaos = snapshot(chaosSession, pool = 4)

      val missing = ref.keySet.diff(chaos.keySet) ++ chaos.keySet.diff(ref.keySet)
      assert(missing.isEmpty, s"query sets differ: $missing")
      val errs = (ref ++ chaos).collect { case (k, v) if v.startsWith("ERROR:") => s"$k ${v.take(160)}" }
      assert(errs.isEmpty, s"${errs.size} queries errored:\n${errs.toSeq.sorted.take(10).mkString("\n")}")
      val diffs = ref.keys.filter(k => ref(k) != chaos(k)).toSeq.sorted
      assert(diffs.isEmpty,
        s"${diffs.size} env-sensitive queries: ${diffs.take(20).mkString(", ")}\n" +
          diffs.headOption.map { k =>
            val (a, b) = (ref(k).linesIterator.toSeq, chaos(k).linesIterator.toSeq)
            val firstDiff = a.zipAll(b, "<none>", "<none>").find { case (x, y) => x != y }
            s"first diff in $k: ref=${firstDiff.map(_._1).getOrElse("")}\n" +
              s"              chaos=${firstDiff.map(_._2).getOrElse("")}"
          }.getOrElse(""))
    } finally {
      java.util.TimeZone.setDefault(tz0)
      java.util.Locale.setDefault(loc0)
    }
  }
}
