package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, IntegerType, LongType, StructField, StructType}

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
      numPartitions: Int = 0): DataFrame = {
    val parts = if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df.repartitionByRange(parts, orderCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy("__pid").orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = graft.Caches.track(
      ranged.withColumn("__local", sum(col(valueCol)).over(w)))
    val sumType = local.schema("__local").dataType
    // per-partition totals → driver-side exclusive prefix (#partitions
    // values — this collect moves longs, not data)
    val totals: Map[Int, BigDecimal] =
      local.groupBy("__pid").agg(sum(col(valueCol)).as("__tot")).collect()
        .map { r =>
          val tot = r.get(1) match {
            case null                      => BigDecimal(0)
            case l: java.lang.Long         => BigDecimal(l.longValue())
            case d: java.math.BigDecimal   => BigDecimal(d)
            case other => throw new IllegalArgumentException(
              s"runningSum needs an exactly-summable value column " +
                s"(integral or decimal); sum(${valueCol}) yielded ${other.getClass}")
          }
          r.getInt(0) -> tot
        }.toMap
    val pids = totals.keys.toSeq.sorted
    val offsets = pids.scanLeft(BigDecimal(0))((acc, p) => acc + totals(p)).init
    val spark = df.sparkSession
    val offRows = pids.zip(offsets).map { case (p, o) =>
      val v: Any = sumType match {
        case _: LongType    => o.toLongExact
        case dt: DecimalType => o.setScale(dt.scale).bigDecimal
        case other => throw new IllegalArgumentException(
          s"unsupported running-sum type $other")
      }
      Row(p, v)
    }
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1),
      StructType(Seq(StructField("__pid", IntegerType, nullable = false),
        StructField("__off", sumType))))
    local.join(broadcast(offDf), Seq("__pid"), "left")
      .withColumn(s"running_$valueCol",
        col("__local") + coalesce(col("__off"), lit(0).cast(sumType)))
      .drop("__pid", "__local", "__off")
  }
}
