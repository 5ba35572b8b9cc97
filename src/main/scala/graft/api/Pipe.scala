package graft.api

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-replica runtime context — the reference's `RuntimeContext`
  * (/root/reference/wf/context.hpp:137-156): replica index + a per-replica
  * key-value scratchpad (`LocalStorage`, wf/local_storage.hpp). In Spark
  * the "replica" is the task partition; the scratchpad lives for the
  * partition's lifetime inside `mapPartitions`.
  */
final class RuntimeCtx(val replicaIndex: Int) {
  private val storage = scala.collection.mutable.HashMap.empty[String, Any]
  def get[A](key: String): Option[A] = storage.get(key).map(_.asInstanceOf[A])
  def put(key: String, value: Any): Unit = storage.update(key, value)
}

/** Fluent pipeline facade — the engine's rendering of the reference's
  * builder + MultiPipe surface (SURVEY §3): `Pipe` wraps a `Dataset[T]`
  * (batch or streaming — transformations are identical), operators compile
  * to Dataset transformations, and Catalyst/whole-stage-codegen supplies
  * what the reference does by hand (chaining ≡ codegen fusion,
  * wf/multipipe.hpp:536-590; KEYBY routing ≡ hash shuffle; merge ≡ union,
  * wf/multipipe.hpp:1174-1204; split ≡ filtered branches with natural
  * multicast, wf/multipipe.hpp:1220-1257).
  */
final case class Pipe[T](ds: Dataset[T]) {

  /** Map (wf/map.hpp:65-68; all 4 variants collapse to 1→1 fn). */
  def map[U: Encoder](f: T => U): Pipe[U] = Pipe(ds.map(f))

  /** "Riched" map with RuntimeContext (wf/map.hpp riched variants). */
  def mapRiched[U: Encoder](f: (T, RuntimeCtx) => U): Pipe[U] =
    Pipe(ds.mapPartitions { it =>
      val ctx = new RuntimeCtx(TaskContext.getPartitionId())
      it.map(f(_, ctx))
    })

  /** Filter (wf/filter.hpp:63-64; watermark continuity is Spark-internal). */
  def filter(p: T => Boolean): Pipe[T] = Pipe(ds.filter(p))

  /** FlatMap — 1→N via returned iterator ≡ Shipper::push
    * (wf/flatmap.hpp:65-66, wf/shipper.hpp:147-164).
    */
  def flatMap[U: Encoder](f: T => IterableOnce[U]): Pipe[U] =
    Pipe(ds.flatMap(f(_).iterator))

  /** merge() — N pipes to one stream, order undefined
    * (wf/multipipe.hpp:1174-1204).
    */
  def merge(others: Pipe[T]*): Pipe[T] = Pipe(others.foldLeft(ds)(_ union _.ds))

  /** split() — content-based routing; overlapping predicates give the
    * reference's vector-of-indexes multicast (wf/splitting_emitter.hpp:56-62).
    * Branches share the upstream plan; `select(i)` is just `(i)`.
    */
  def split(preds: (T => Boolean)*): Seq[Pipe[T]] = preds.map(p => Pipe(ds.filter(p)))

  /** KEYBY routing (wf/builders.hpp:217-240 withKeyBy). */
  def keyBy[K: Encoder](f: T => K): KeyedPipe[K, T] = new KeyedPipe(ds.groupByKey(f))

  /** REBALANCING / round-robin routing (wf/basic.hpp:93) — an explicit
    * physical repartition; normally unnecessary (AQE balances).
    */
  def rebalance(n: Int): Pipe[T] = Pipe(ds.repartition(n))

  def toDF(): DataFrame = ds.toDF()

  /** Terminal foreach sink with closing-function semantics
    * (wf/sink.hpp, wf/builders.hpp:116).
    */
  def sinkForeach(onTuple: T => Unit, onClose: () => Unit = () => ()) =
    graft.streaming.StreamRun.foreachSink(ds)(onTuple, onClose)
}

/** Keyed operators: rolling reduce + custom keyed state.
  * (Time/count windows live on the DataFrame surface —
  * [[graft.operators.TimeWindows]], [[graft.streaming.StatefulOps]].)
  */
final class KeyedPipe[K, T](val kv: org.apache.spark.sql.KeyValueGroupedDataset[K, T]) {

  /** Reference Reduce (wf/reduce.hpp:139-158): fold per key, emit the
    * updated state once per input. `orderKey` fixes the fold order inside
    * a micro-batch (DETERMINISTIC-mode analog,
    * wf/ordering_collector.hpp:24-33).
    */
  def rollingReduce[S: Encoder](init: S)(fold: (S, T) => S)(orderKey: T => (Long, Long))(
      implicit enc: Encoder[(K, S)]): Pipe[(K, S)] =
    Pipe(kv.flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
      (key: K, it: Iterator[T], state: GroupState[S]) =>
        var s = state.getOption.getOrElse(init)
        val out = it.toSeq.sortBy(orderKey).map { t => s = fold(s, t); (key, s) }
        state.update(s)
        out.iterator
    })

  /** Escape hatch: arbitrary per-key state logic (the general form every
    * P_* / windowed reference operator reduces to).
    */
  def statefulFlatMap[S: Encoder, U: Encoder](outputMode: OutputMode)(
      f: (K, Iterator[T], GroupState[S]) => Iterator[U]): Pipe[U] =
    Pipe(kv.flatMapGroupsWithState(outputMode, GroupStateTimeout.NoTimeout)(f))
}

object Pipe {
  /** Entry points — PipeGraph.add_source ≡ wrapping a (streaming or batch)
    * Dataset (wf/pipegraph.hpp:589-601).
    */
  def apply[T](ds: Dataset[T]): Pipe[T] = new Pipe(ds)

  def fromEvents(spark: SparkSession, dir: String): Pipe[org.apache.spark.sql.Row] =
    Pipe(graft.streaming.StreamSources.events(spark, dir))

  /** Custom generator Source entry (wf/source_shipper.hpp user loop):
    * register a [[graft.sources.GeneratorSource.GenDef]] and stream it,
    * one executor partition per replica loop.
    */
  def fromGenerator(spark: SparkSession, name: String,
      policy: String = "event"): Pipe[org.apache.spark.sql.Row] =
    Pipe(graft.streaming.StreamSources.generator(spark, name, policy))

  /** Kafka sink (wf/kafka/kafka_sink.hpp:77-78: tuple → {topic, payload}). */
  def kafkaSink(df: DataFrame, bootstrap: String, topic: String) =
    df.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)

  /** Typed-builder flavor ([[graft.sources.KafkaSinkConfig]], mirroring
    * the reference's KafkaSink_Builder).
    */
  def kafkaSink(df: DataFrame, config: graft.sources.KafkaSinkConfig)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    kafkaSink(df, config, "kafka")

  /** Format-parameterized flavor — the in-repo fake runtime
    * ([[graft.sources.FakeKafkaSourceProvider]]) substitutes here so the
    * sink's option map, routing and epoch semantics EXECUTE without the
    * connector jar; a real deployment passes "kafka" and keeps every
    * call site untouched (the source half's exact pattern).
    */
  def kafkaSink(df: DataFrame, config: graft.sources.KafkaSinkConfig,
      format: String) =
    df.writeStream.format(format).options(config.options)
}
