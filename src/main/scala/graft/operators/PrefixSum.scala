package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{ByteType, DecimalType, IntegerType, LongType, ShortType, StructField, StructType}

/** Distributed global running aggregate (keyless Reduce,
  * /root/reference/wf/basic.hpp:284-302 empty_key_t path).
  *
  * A naive `Window.orderBy(...)` with no partition key collapses the whole
  * dataset into ONE task — correct, and fine at test scale, but a
  * non-starter at 100 TB. This is the classic two-pass prefix scan
  * instead:
  *
  *   1. range-partition by the ordering key (Spark's `repartitionByRange`,
  *      sampled splits), cumulative-sum *within* each partition;
  *   2. compute each partition's total, prefix-sum those totals on the
  *      driver (#partitions values, trivially small), and broadcast-join
  *      each partition's offset back on `__pid` — a tiny (pid, offset)
  *      dim table, so the plan stays narrow at any partition count (a
  *      literal `when`-chain here would be a 10k-deep expression tree on
  *      a 10k-partition scan).
  *
  * Wall-clock becomes two narrow passes + one tiny collect, with every
  * partition processed in parallel. Result is identical to the
  * single-partition window (asserted in spec).
  */
object PrefixSum {

  /** Adds `running_<valueCol>` = cumulative sum of `valueCol` over rows
    * ordered by `orderCols` (must be a total order). `valueCol` must be an
    * exactly-summable type: integral (sums as LONG) or DECIMAL. Floating
    * types are rejected — partial sums would be order-dependent.
    */
  def runningSum(df: DataFrame, valueCol: String, orderCols: Seq[String],
      numPartitions: Int = 0): DataFrame =
    runningSums(df, Seq(valueCol), orderCols, numPartitions)

  /** [[runningSum]] over SEVERAL value columns in one pass — one range
    * repartition, one per-partition cumsum stage and ONE totals collect
    * shared by all columns (a caller needing cumulative (cnt, pos) —
    * e.g. the PR-curve sweep — would otherwise pay the two-pass scan per
    * column). Adds `running_<c>` for each `c` in `valueCols`.
    */
  def runningSums(df: DataFrame, valueCols: Seq[String],
      orderCols: Seq[String], numPartitions: Int = 0): DataFrame = {
    require(valueCols.nonEmpty, "runningSums needs at least one value column")
    val parts = if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // Pass 1, integral columns (every declared consumer): range exchange +
    // within-partition sort, then the per-partition cumsum as a NARROW
    // stateful projection (graft PartitionRunningSum). The previous
    // rendering computed it with Window.partitionBy(spark_partition_id()),
    // whose ClusteredDistribution(__pid) the range exchange cannot satisfy
    // — Catalyst inserted a SECOND full-data hash Exchange just to group
    // by a column that was the partition id already, and that exchange
    // destroyed the range order so a downstream orderBy on the same keys
    // paid a THIRD (r17, guide §2.4). Now the scan's only wide op is the
    // range exchange, and the output stays range-partitioned + sorted —
    // the caller's determinism orderBy reduces to a no-op local sort.
    // DECIMAL columns keep the window path (the stateful kernel sums as
    // LONG, the integral window-sum contract).
    val integral = valueCols.forall(vc => df.schema(vc).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    })
    val local = graft.Caches.track(
      if (integral) {
        val ranged = df.repartitionByRange(parts, orderCols.map(col): _*)
          .sortWithinPartitions(orderCols.map(col): _*)
          .withColumn("__pid", spark_partition_id())
        valueCols.foldLeft(ranged)((d, vc) =>
          d.withColumn(s"__local_$vc",
            graft.functions.expressions.PartitionRunningSum(col(vc))))
      } else {
        val ranged = df.repartitionByRange(parts, orderCols.map(col): _*)
          .withColumn("__pid", spark_partition_id())
        val w = Window.partitionBy("__pid").orderBy(orderCols.map(col): _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        valueCols.foldLeft(ranged)((d, vc) =>
          d.withColumn(s"__local_$vc", sum(col(vc)).over(w)))
      })
    val sumTypes = valueCols.map(vc => vc -> local.schema(s"__local_$vc").dataType)
    // per-partition totals → driver-side exclusive prefix (#partitions
    // rows of longs/decimals — this collect moves counters, not data)
    def asBig(v: Any, vc: String): BigDecimal = v match {
      case null                    => BigDecimal(0)
      case l: java.lang.Long       => BigDecimal(l.longValue())
      case d: java.math.BigDecimal => BigDecimal(d)
      case other => throw new IllegalArgumentException(
        s"runningSums needs exactly-summable value columns " +
          s"(integral or decimal); sum($vc) yielded ${other.getClass}")
    }
    val totals: Map[Int, Seq[BigDecimal]] =
      local.groupBy("__pid")
        .agg(sum(col(valueCols.head)).as("__tot_0"),
          valueCols.tail.zipWithIndex
            .map { case (vc, i) => sum(col(vc)).as(s"__tot_${i + 1}") }: _*)
        .collect()
        .map(r => r.getInt(0) ->
          valueCols.indices.map(i => asBig(r.get(i + 1), valueCols(i))))
        .toMap
    val pids = totals.keys.toSeq.sorted
    val zero = Seq.fill(valueCols.size)(BigDecimal(0))
    val offsets = pids.scanLeft(zero)((acc, p) =>
      acc.zip(totals(p)).map { case (a, t) => a + t }).init
    val spark = df.sparkSession
    val offRows = pids.zip(offsets).map { case (p, os) =>
      val vs: Seq[Any] = sumTypes.zip(os).map {
        case ((_, _: LongType), o)     => o.toLongExact
        case ((_, dt: DecimalType), o) => o.setScale(dt.scale).bigDecimal
        case ((_, other), _) => throw new IllegalArgumentException(
          s"unsupported running-sum type $other")
      }
      Row.fromSeq(p +: vs)
    }
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1),
      StructType(StructField("__pid", IntegerType, nullable = false) +:
        valueCols.zip(sumTypes).map { case (vc, (_, t)) =>
          StructField(s"__off_$vc", t) }))
    val joined = local.join(broadcast(offDf), Seq("__pid"), "left")
    valueCols.zip(sumTypes).foldLeft(joined) { case (d, (vc, (_, t))) =>
        d.withColumn(s"running_$vc",
          col(s"__local_$vc") + coalesce(col(s"__off_$vc"), lit(0).cast(t)))
          .drop(s"__local_$vc", s"__off_$vc")
      }
      .drop("__pid")
  }
}
