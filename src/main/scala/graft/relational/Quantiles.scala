package graft.relational

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/**
 * EXACT grouped percentiles that scale: Spark's built-in `percentile`
 * aggregate is an ObjectHashAggregate whose per-group state is a counts
 * map over every DISTINCT value — on a mostly-distinct measure the state
 * is the data itself, shipped through the shuffle and merged on one
 * reducer per group (the 100 TB OOM shape). This operator never holds a
 * group in memory:
 *
 *  1. range-repartition + sort by (keys, value) — Spark's disk-backed
 *     external sort, parallel WITHIN a group when a group spans range
 *     partitions;
 *  2. per-(partition, key) row counts (one tiny pass) -> running offsets
 *     via a window over the #partitions x #groups count table;
 *  3. each row's global rank inside its group = partition offset + local
 *     index (TaskContext partition id pins the offset lookup);
 *  4. only the <= 2 x |ps| ranks a percentile actually reads survive a
 *     broadcast semi-join; interpolation runs on that tiny set with
 *     bit-identical arithmetic to Spark's `percentile`
 *     ((hi - pos) * vLo + (pos - lo) * vHi, pos = p * (n-1)).
 *
 * Differentially tested against the built-in for exact double equality
 * (QuantilesSpec), so swapping it into an oracle-checked query keeps the
 * hash. Shuffle budget: ONE full-data range exchange (the sort) plus
 * metadata-sized aggregations — vs the built-in's hash exchange of a
 * distinct-values map that can exceed the input.
 */
object Quantiles {

  /**
   * Below this input size (rows, limit-probed — early-exit scan, never a
   * full count) the built-in `percentile` aggregate is used instead of
   * the range-sort plan: its per-group distinct-value map state is
   * bounded by the probed input, so the OOM shape the sort path exists
   * for cannot occur, and one hash aggregation beats the sort path's
   * multi-job pipeline by ~5x at catalog scale. The two paths are
   * differentially tested for exact double equality (QuantilesSpec), so
   * the dispatch never changes a result — same discipline as
   * AsOfJoin.broadcastLookup / SpatialJoin.autoJoin. Tune with
   * spark.graft.quantiles.builtinMaxRows (0 disables the built-in path).
   */
  val BuiltinMaxRowsKey = "spark.graft.quantiles.builtinMaxRows"
  val DefaultBuiltinMaxRows = 16000000L

  /**
   * Per-group exact percentiles of `valueCol` (nulls ignored, like the
   * built-in). Returns one row per group: keys ++ p0..p{n-1} double
   * columns in `ps` order (null for empty groups, which cannot occur —
   * a group exists only if it has at least one non-null row).
   */
  def exactPercentiles(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      ps: Seq[Double]): DataFrame = {
    require(keys.nonEmpty, "at least one grouping key")
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1), "ps in [0,1]")
    val spark = df.sparkSession

    val kCols = keys.map(col)
    val proj = df
      .select(kCols :+ col(valueCol).cast("double").as("__v"): _*)
      .filter(col("__v").isNotNull)

    // ---- adaptive dispatch: small input -> built-in hash aggregate ----
    val builtinMax = spark.conf.getOption(BuiltinMaxRowsKey)
      .map(_.toLong).getOrElse(DefaultBuiltinMaxRows)
    if (builtinMax > 0 && builtinMax < Int.MaxValue.toLong &&
        proj.limit((builtinMax + 1).toInt).count() <= builtinMax) {
      // identical arithmetic: `percentile` interpolates at pos = p*(n-1),
      // exactly what the sort path reproduces rank-by-rank
      val arr = proj.groupBy(kCols: _*)
        .agg(percentile(col("__v"), lit(ps.toArray)).as("__ps"))
      return arr.select(kCols ++ ps.indices.map(j =>
        col("__ps").getItem(j).as(s"p$j")): _*)
    }

    val sorted = proj
      .repartitionByRange(kCols :+ col("__v"): _*)
      .sortWithinPartitions(kCols :+ col("__v"): _*)

    // ---- rank assignment: partition offsets + local index ----
    val withPid = {
      val schema = StructType(sorted.schema.fields :+ StructField("__pid", LongType, nullable = false)
        :+ StructField("__lidx", LongType, nullable = false))
      implicit val enc = RowEncoder.encoderFor(schema)
      val nk = keys.length
      sorted.mapPartitions { it =>
        val pid = TaskContext.getPartitionId().toLong
        var lastKey: Seq[Any] = null
        var idx = -1L
        it.map { r =>
          val k = (0 until nk).map(r.get)
          if (k != lastKey) { lastKey = k; idx = 0L } else idx += 1
          Row.fromSeq(r.toSeq :+ pid :+ idx)
        }
      }
    }
    // one tiny pass for the (pid, key) -> count table; cache the ranked
    // rows so the count pass and the final semi-join read one sort
    val ranked0 = withPid.localCheckpoint()
    val partCounts = ranked0.groupBy((col("__pid") +: kCols): _*).agg(count(lit(1)).as("__c"))
    val offW = org.apache.spark.sql.expressions.Window
      .partitionBy(kCols: _*).orderBy(col("__pid"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = partCounts
      .withColumn("__off", coalesce(sum(col("__c")).over(offW), lit(0L)))
      .select((col("__pid") +: kCols) :+ col("__off"): _*)

    val ranked = ranked0
      .join(broadcast(offsets), ("__pid" +: keys).toSeq)
      .withColumn("__rank", col("__off") + col("__lidx"))

    // ---- which ranks does each percentile read? ----
    val totals = partCounts.groupBy(kCols: _*).agg(sum(col("__c")).as("__n"))
    val pExprs = ps.zipWithIndex.map { case (p, j) =>
      struct(lit(j).as("j"), lit(p).as("p")).as(s"__p$j")
    }
    val wanted = totals
      .select(kCols :+ explode(array(pExprs: _*)).as("__pp") :+ col("__n"): _*)
      .withColumn("__pos", col("__pp.p") * (col("__n") - 1).cast("double"))
      .withColumn("__lo", floor(col("__pos")))
      .withColumn("__hi", ceil(col("__pos")))
    val neededRanks = wanted
      .select(kCols :+ explode(array(col("__lo"), col("__hi"))).as("__rank"): _*)
      .distinct()

    val picked = ranked
      .join(broadcast(neededRanks), keys :+ "__rank")
      .select(kCols :+ col("__rank") :+ col("__v"): _*)

    // ---- interpolate (exactly the built-in's arithmetic) ----
    // picked is <= 2|ps| rows per group — localCheckpoint so the two
    // interpolation joins below read it once instead of re-running the
    // (big) semi-join per branch, then broadcast both probe sides
    val pickedSmall = picked.localCheckpoint()
    val byP = wanted.join(broadcast(pickedSmall.withColumnRenamed("__rank", "__lo")), keys :+ "__lo")
      .withColumnRenamed("__v", "__vlo")
      .join(broadcast(pickedSmall.withColumnRenamed("__rank", "__hi").withColumnRenamed("__v", "__vhi")),
        keys :+ "__hi")
      .withColumn("__r",
        when(col("__lo") === col("__hi"), col("__vlo"))
          .otherwise((col("__hi").cast("double") - col("__pos")) * col("__vlo") +
            (col("__pos") - col("__lo").cast("double")) * col("__vhi")))

    val agg = byP.groupBy(kCols: _*)
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("__pp.j").as("j"), col("__r").as("r"))))).as("__m"))
    agg.select(kCols ++ ps.indices.map(j => col("__m").getItem(j).as(s"p$j")): _*)
  }

  /**
   * Several measure columns in ONE sort: melts `specs` (valueCol -> its
   * percentiles) into long format and runs [[exactPercentiles]] with the
   * measure name as an extra key — one range exchange over the stacked
   * rows instead of one per measure. Returns keys :+ `__col` (measure
   * name) :+ p0..p{n-1} over the SORTED DISTINCT UNION of all requested
   * percentiles (callers pick the entries they asked for; the extra
   * ranks ride the same scan for free).
   */
  def exactPercentilesStacked(
      df: DataFrame,
      keys: Seq[String],
      specs: Seq[(String, Seq[Double])]): (Seq[Double], DataFrame) = {
    require(specs.nonEmpty, "at least one measure")
    val allPs = specs.flatMap(_._2).distinct.sorted
    val stackArgs = specs.map { case (c, _) => s"'$c', cast(`$c` as double)" }.mkString(", ")
    val melted = df.select(keys.map(col) :+
      expr(s"stack(${specs.length}, $stackArgs)").as(Seq("__col", "__v")): _*)
    (allPs, exactPercentiles(melted, keys :+ "__col", "__v", allPs))
  }

  /** Convenience: single percentile as a column named `alias`. */
  def exactPercentile(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      p: Double,
      alias: String): DataFrame = {
    val kCols = keys.map(col)
    exactPercentiles(df, keys, valueCol, Seq(p))
      .select(kCols :+ col("p0").as(alias): _*)
  }
}
