package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom generator streaming source — the reference's defining `Source`
  * surface: a user loop pushing tuples with explicit timestamps
  * (/root/reference/wf/source_shipper.hpp:171-335), run with `parallelism`
  * replica loops, under EVENT_TIME (user-supplied ts,
  * source_shipper.hpp:248) or INGRESS_TIME (arrival-stamped,
  * source_shipper.hpp:255-256) policy.
  *
  * Spark rendering: a DataSourceV2 `MicroBatchStream`. Each replica is an
  * `InputPartition`, so the generator loops run ON THE EXECUTORS, one per
  * replica — the distribution model of the reference's Source_Replica
  * fleet, and the reason this scales past `MemoryStream` (which funnels
  * through the driver). Offsets are per-replica emitted-row counts; replay
  * of [start, end) re-runs the (required-deterministic) generator loop and
  * skips — the same replayability contract Spark's own rate source uses.
  *
  * Generators are registered JVM-locally by name
  * ([[GeneratorSource.register]]) and referenced via
  * `.format(classOf[GeneratorSourceProvider].getName).option("generator", name)`.
  * On a multi-node cluster the registration must happen in executor JVM
  * startup (a jar static initializer) — same constraint as any
  * code-carrying source.
  *
  * Emitted schema = user schema + `ts_us` LONG + `event_time` TIMESTAMP:
  * under EVENT policy both carry the generator-supplied timestamp; under
  * INGRESS they carry the read-time wall clock (non-deterministic by
  * design, like the reference).
  */
object GeneratorSource {

  /** A generator definition: `gen(replica, emit)` where the user loop calls
    * `emit(values, tsUs)` once per tuple; `values` must match `schema`
    * (Long/Int/Double/Float/String/Boolean fields). The loop must be
    * deterministic per replica (offset replay re-runs it).
    */
  final case class GenDef(schema: StructType, numReplicas: Int,
      gen: (Int, (Array[Any], Long) => Unit) => Unit)

  private val registry = new ConcurrentHashMap[String, GenDef]()

  def register(name: String, d: GenDef): Unit = registry.put(name, d)

  def get(name: String): GenDef =
    Option(registry.get(name)).getOrElse(
      throw new IllegalArgumentException(s"no generator registered as '$name'"))

  def outputSchema(d: GenDef): StructType =
    StructType(d.schema.fields :+ StructField("ts_us", LongType, nullable = false) :+
      StructField("event_time", TimestampType, nullable = false))

  /** Rows emitted by one replica (runs the loop with a counting emitter). */
  def countRows(d: GenDef, replica: Int): Long = {
    var n = 0L
    d.gen(replica, (_, _) => n += 1)
    n
  }

  /** Max per-replica emission count, memoized per registration IDENTITY:
    * every stream instance (one per query RUN) previously re-ran every
    * replica's full generator loop on the DRIVER just to learn the drain
    * target — pure fixed cost per run, and a full 10⁷-iteration driver
    * pass in the scale batteries. The count is metadata of a
    * required-deterministic loop; the `eq` check means a re-registered
    * (even identical-looking) GenDef recounts, so a changed generator can
    * never serve a stale target.
    */
  private val countMemo = new ConcurrentHashMap[String, (GenDef, Long)]()
  def maxRowCount(name: String): Long = {
    val d = get(name)
    val cached = countMemo.get(name)
    if (cached != null && (cached._1 eq d)) cached._2
    else {
      val m = (0 until d.numReplicas).map(countRows(d, _)).foldLeft(0L)(math.max)
      countMemo.put(name, (d, m))
      m
    }
  }

  /** Test hook: high-water mark of rows buffered by any reader since the
    * last [[resetPeakBuffered]] — lets a spec assert a huge replica
    * streams through in bounded memory instead of materializing.
    */
  private val peak = new java.util.concurrent.atomic.AtomicLong(0L)
  private[sources] def trackPeak(n: Long): Unit =
    peak.getAndAccumulate(n, math.max(_, _))
  def peakBufferedRows: Long = peak.get()
  def resetPeakBuffered(): Unit = peak.set(0L)

  private[sources] def toCatalyst(v: Any): Any = v match {
    case null => null
    case s: String => UTF8String.fromString(s)
    case x @ (_: Long | _: Int | _: Double | _: Float | _: Boolean | _: Short | _: Byte) => x
    case other => throw new IllegalArgumentException(
      s"generator emitted unsupported field type ${other.getClass.getName}")
  }
}

class GeneratorSourceProvider extends TableProvider {
  import GeneratorSource._

  private def genName(options: CaseInsensitiveStringMap): String = {
    val n = options.get("generator")
    require(n != null, "option 'generator' (registered generator name) is required")
    n
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    outputSchema(get(genName(options)))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new GeneratorTable(genName(opts),
      opts.getOrDefault("timepolicy", "event").toLowerCase == "ingress",
      opts.getLong("maxrowsperbatchperreplica", 0L))
  }
}

class GeneratorTable(name: String, ingress: Boolean, maxRowsPerReplica: Long)
    extends Table with SupportsRead {
  import GeneratorSource._

  override def name(): String = s"graft_generator($name)"
  override def schema(): StructType = outputSchema(get(name))
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = schema()
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new GeneratorMicroBatchStream(name, ingress, maxRowsPerReplica)
    }
}

/** Offset = rows released per replica (uniform high-water mark, clamped to
  * each replica's actual count at planning).
  */
case class GenOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

/** `maxRowsPerReplica` > 0 enables ADMISSION CONTROL — the reference
  * sources' bounded-queue pacing (README.md:36) expressed in Spark's
  * native contract (same as the rate/kafka sources' maxOffsetsPerTrigger):
  * each micro-batch advances every replica's offset by at most that many
  * rows, so a 10⁷-row generator streams as a SEQUENCE of micro-batches
  * with the watermark advancing between them — which is what lets the
  * scale-stress spec observe stateful operators' purge bounds mid-stream.
  * 0 (the default) keeps the all-available-now behavior.
  */
class GeneratorMicroBatchStream(name: String, ingress: Boolean,
    maxRowsPerReplica: Long = 0L)
  extends MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import GeneratorSource._
  import org.apache.spark.sql.connector.read.streaming.{ReadLimit, ReadMaxRows}

  private lazy val d = get(name)
  // finite user loop: everything it will ever emit is available now
  // (memoized per registration — see GeneratorSource.maxRowCount)
  private lazy val maxCount: Long = GeneratorSource.maxRowCount(name)

  // Trigger.AvailableNow (SupportsTriggerAvailableNow extends
  // SupportsAdmissionControl): snapshot the drain target at query start.
  // Without this marker interface Spark falls back to a SINGLE batch and
  // silently ignores the admission cap — which defeats the bounded-queue
  // pacing this source exists to model (the reference sources' README:36
  // backpressure). A finite registered generator's target is simply its
  // total emission count; an unbounded/growing generator would snapshot
  // whatever existed at prepare time, like the kafka source.
  private var availableTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableTarget = Some(maxCount)
  private def target: Long = availableTarget.getOrElse(maxCount)

  override def initialOffset(): Offset = GenOffset(0L)
  override def latestOffset(): Offset = GenOffset(target)
  override def getDefaultReadLimit: ReadLimit =
    if (maxRowsPerReplica > 0) ReadLimit.maxRows(maxRowsPerReplica)
    else ReadLimit.allAvailable()
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = limit match {
    case m: ReadMaxRows =>
      // the offset is a per-replica row count, so the cap applies per
      // replica loop (each replica is one partition of the batch)
      GenOffset(math.min(target, start.asInstanceOf[GenOffset].n + m.maxRows()))
    case _ => GenOffset(target)
  }
  override def deserializeOffset(json: String): Offset = GenOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GenOffset].n
    val e = end.asInstanceOf[GenOffset].n
    (0 until d.numReplicas).map(r =>
      GenPartition(name, r, s, e, ingress): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new GenPartitionReader(partition.asInstanceOf[GenPartition])
    }
}

case class GenPartition(name: String, replica: Int, start: Long, end: Long,
    ingress: Boolean) extends InputPartition

/** Runs the replica's generator loop on the executor, keeping rows with
  * per-replica emission index in [start, end).
  *
  * The user loop is push-style (it calls `emit`) but a PartitionReader is
  * pull-style, so the loop runs on a producer thread feeding a BOUNDED
  * chunk queue ([[GenPartitionReader.QueueChunks]] × [[GenPartitionReader.ChunkRows]]
  * rows in flight); `emit` blocks when the reader falls behind — the
  * backpressure contract of the reference's shipper
  * (source_shipper.hpp:171-335 pushes into bounded FastFlow queues). A
  * long-running or unbounded generator therefore streams rows out in O(1)
  * memory instead of materializing the whole [start, end) slice per batch
  * (spec-asserted via [[GeneratorSource.peakBufferedRows]]).
  */
class GenPartitionReader(p: GenPartition) extends PartitionReader[InternalRow] {
  import GeneratorSource._
  import GenPartitionReader._

  private val queue =
    new java.util.concurrent.ArrayBlockingQueue[AnyRef](QueueChunks)
  @volatile private var closed = false
  @volatile private var err: Throwable = _

  private val producer = new Thread(s"graft-gen-${p.name}-r${p.replica}") {
    override def run(): Unit = {
      val chunk = new scala.collection.mutable.ArrayBuffer[InternalRow](ChunkRows)
      def put(x: AnyRef): Unit = {
        var done = false
        while (!done && !closed)
          done = queue.offer(x, 50, java.util.concurrent.TimeUnit.MILLISECONDS)
        if (closed) throw new InterruptedException("reader closed")
      }
      def flush(): Unit = if (chunk.nonEmpty) {
        trackPeak(queue.size().toLong * ChunkRows + chunk.length)
        put(chunk.toArray)
        chunk.clear()
      }
      try {
        val d = GeneratorSource.get(p.name)
        val width = d.schema.length
        var i = 0L
        d.gen(p.replica, (values, tsUs) => {
          if (closed) throw new InterruptedException("reader closed")
          if (i >= p.start && i < p.end) {
            require(values.length == width,
              s"generator emitted ${values.length} fields, schema has $width")
            val ts = if (p.ingress) System.currentTimeMillis() * 1000L else tsUs
            val out = new Array[Any](width + 2)
            var j = 0
            while (j < width) { out(j) = toCatalyst(values(j)); j += 1 }
            out(width) = ts
            out(width + 1) = ts // TimestampType is micros-since-epoch internally
            chunk += new GenericInternalRow(out)
            if (chunk.length >= ChunkRows) flush()
          }
          i += 1L
        })
        flush()
      } catch {
        case _: InterruptedException => ()
        case t: Throwable => err = t
      } finally {
        var done = closed
        while (!done)
          done = queue.offer(Poison, 50, java.util.concurrent.TimeUnit.MILLISECONDS) || closed
      }
    }
  }
  producer.setDaemon(true)
  producer.start()

  private var chunk: Array[InternalRow] = Array.empty
  private var idx = 0
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (idx >= chunk.length) {
      val x = queue.take()
      if (x eq Poison) {
        if (err != null) throw err
        return false
      }
      chunk = x.asInstanceOf[Array[InternalRow]]
      idx = 0
    }
    current = chunk(idx)
    idx += 1
    true
  }
  override def get(): InternalRow = current
  override def close(): Unit = { closed = true; queue.clear() }
}

object GenPartitionReader {
  /** Max chunks in flight; bounded memory = QueueChunks × ChunkRows rows. */
  val QueueChunks = 32
  val ChunkRows = 256
  private val Poison: AnyRef = new Object
}
