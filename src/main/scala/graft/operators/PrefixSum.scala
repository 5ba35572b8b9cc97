package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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
  *      driver (#partitions values, trivially small), and add each
  *      partition's offset back.
  *
  * Wall-clock becomes two narrow passes + one tiny collect, with every
  * partition processed in parallel. Result is identical to the
  * single-partition window (asserted in spec).
  */
object PrefixSum {

  /** Adds `running_<valueCol>` = cumulative sum of `valueCol` over rows
    * ordered by `orderCols` (must be a total order). `valueCol` must be an
    * exactly-summable type (long / decimal).
    */
  def runningSum(df: DataFrame, valueCol: String, orderCols: Seq[String],
      numPartitions: Int = 0): DataFrame = {
    val parts = if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df.repartitionByRange(parts, orderCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy("__pid").orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn("__local", sum(col(valueCol)).over(w))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-partition totals → driver-side exclusive prefix (tiny)
    val totals = local.groupBy("__pid").agg(sum(col(valueCol)).as("__tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pids = totals.keys.toSeq.sorted
    val offsets = pids.scanLeft(0L)((acc, p) => acc + totals(p)).init
    val offsetMap = pids.zip(offsets).toMap
    val offsetExpr = offsetMap.foldLeft(lit(0L)) { case (acc, (p, o)) =>
      when(col("__pid") === p, lit(o)).otherwise(acc)
    }
    local.withColumn(s"running_$valueCol", col("__local") + offsetExpr)
      .drop("__pid", "__local")
  }
}
