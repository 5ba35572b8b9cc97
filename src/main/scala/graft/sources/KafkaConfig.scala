package graft.sources

/** Typed Kafka configuration mirroring the reference's builder surface
  * (KafkaSource_Builder, /root/reference/wf/kafka/builders_kafka.hpp:191-258:
  * withBrokers/withTopics/withOffsets/withGroupID/withAssignmentPolicy/
  * withIdleness), rendered to the option map of Spark's `kafka` source.
  *
  * The spark-sql-kafka connector jar is not present in this environment
  * (no network egress, no broker), so `format("kafka").load()` cannot
  * resolve here — the rendering below is the complete, spec-tested mapping
  * a deployment with the connector on the classpath uses as-is via
  * [[graft.streaming.StreamSources.kafka]].
  *
  * Option mapping:
  *  - brokers  → `kafka.bootstrap.servers` (comma-joined)
  *  - topics   → `subscribe`
  *  - offsets  → `startingOffsets` JSON, one starting offset per topic
  *    (aligned with `topics`; -1/-2 mean latest/earliest per Kafka
  *    convention); no offsets → `"earliest"` (the reference's default
  *    `auto.offset.reset` posture for a fresh group). Spark's kafka
  *    source requires specific-offset JSON to cover EVERY partition of a
  *    subscribed topic, so the scalar per-topic form maps to partition 0
  *    and is valid for single-partition topics only (the reference's
  *    per-topic offset model has the same ambiguity); multi-partition
  *    topics must use [[KafkaSourceConfig.withPartitionOffsets]], which
  *    renders the full per-partition map.
  *  - groupId  → `kafka.group.id`
  *  - assignmentPolicy → `kafka.partition.assignment.strategy`
  *  - idleness → `kafka.fetch.max.wait.ms` (max broker poll wait)
  *
  * The reference's deserializing map (kafka_deser_func_t,
  * wf/kafka/kafka_source.hpp:134-135) is the first `.select` over the
  * loaded frame (`CAST(value AS STRING)` etc.); its
  * withKafkaClosingFunction is a StreamingQueryListener.onQueryTerminated
  * hook ([[graft.streaming.Monitoring]]).
  */
final case class KafkaSourceConfig(
    brokers: Seq[String] = Nil,
    topics: Seq[String] = Nil,
    offsets: Seq[Long] = Nil,
    partitionOffsets: Map[String, Map[Int, Long]] = Map.empty,
    groupId: Option[String] = None,
    assignmentPolicy: Option[String] = None,
    idleTimeMs: Option[Long] = None) {

  def withBrokers(bs: String*): KafkaSourceConfig = copy(brokers = brokers ++ bs)
  def withTopics(ts: String*): KafkaSourceConfig = copy(topics = topics ++ ts)
  def withOffsets(os: Long*): KafkaSourceConfig = copy(offsets = offsets ++ os)

  /** Explicit per-partition starting offsets for one topic — required for
    * multi-partition topics (Spark rejects specific-offset JSON that
    * leaves any discovered partition uncovered). Overrides the scalar
    * [[withOffsets]] entry for that topic.
    */
  def withPartitionOffsets(topic: String, po: Map[Int, Long]): KafkaSourceConfig =
    copy(partitionOffsets = partitionOffsets + (topic -> po))
  def withGroupID(g: String): KafkaSourceConfig = copy(groupId = Some(g))
  def withAssignmentPolicy(p: String): KafkaSourceConfig = copy(assignmentPolicy = Some(p))
  def withIdleness(ms: Long): KafkaSourceConfig = copy(idleTimeMs = Some(ms))

  /** Spark `kafka`-source options. Validates the builder the way the
    * reference's build() does: brokers and topics are mandatory, offsets
    * (when given) align 1:1 with topics.
    */
  def options: Map[String, String] = {
    require(brokers.nonEmpty, "Kafka source needs at least one broker (withBrokers)")
    require(topics.nonEmpty, "Kafka source needs at least one topic (withTopics)")
    require(offsets.isEmpty || offsets.length == topics.length,
      s"withOffsets must align with withTopics (${offsets.length} offsets, ${topics.length} topics)")
    require(partitionOffsets.keySet.subsetOf(topics.toSet),
      s"withPartitionOffsets topics ${partitionOffsets.keySet -- topics.toSet} are not subscribed")
    val startingOffsets =
      if (offsets.isEmpty && partitionOffsets.isEmpty) "earliest"
      else {
        val scalar = topics.zip(offsets).toMap
        require(topics.forall(t => scalar.contains(t) || partitionOffsets.contains(t)),
          "specific-offset JSON must cover every subscribed topic: give " +
            "withOffsets for all topics or withPartitionOffsets per topic")
        topics.flatMap { t =>
          partitionOffsets.get(t) match {
            case Some(po) =>
              require(po.nonEmpty, s"empty partition-offset map for topic $t")
              Some(s""""$t":${po.toSeq.sortBy(_._1)
                .map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")}""")
            case None =>
              // scalar per-topic offset = partition 0 (single-partition
              // topics only — see class doc); no entry at all → the topic
              // starts earliest on every partition, which Spark's JSON
              // form can't express partition-free, so it must be omitted
              // only when NO offsets are given (handled above)
              scalar.get(t).map(o => s""""$t":{"0":$o}""")
          }
        }.mkString("{", ",", "}")
      }
    Map(
      "kafka.bootstrap.servers" -> brokers.mkString(","),
      "subscribe" -> topics.mkString(","),
      "startingOffsets" -> startingOffsets) ++
      groupId.map("kafka.group.id" -> _) ++
      assignmentPolicy.map("kafka.partition.assignment.strategy" -> _) ++
      idleTimeMs.map(ms => "kafka.fetch.max.wait.ms" -> ms.toString)
  }
}

/** Sink twin (KafkaSink_Builder, wf/kafka/builders_kafka.hpp sink half):
  * brokers + topic routing. The reference's serializing function returns
  * `wf_kafka_sink_msg{payload, topic}` — every MESSAGE carries its own
  * topic (wf/kafka/kafka_sink.hpp:77-78,178-203) — which in Spark's
  * kafka sink is the topic COLUMN of the written relation; a fixed
  * [[withTopic]] renders the `topic` option, which (Spark's documented
  * rule) overrides any topic column. [[withTopicColumn]] declares the
  * reference's per-message posture explicitly: no `topic` option is
  * rendered and the relation must carry the column.
  */
final case class KafkaSinkConfig(
    brokers: Seq[String] = Nil,
    topic: Option[String] = None,
    topicColumnRouting: Boolean = false) {

  def withBrokers(bs: String*): KafkaSinkConfig = copy(brokers = brokers ++ bs)
  def withTopic(t: String): KafkaSinkConfig = copy(topic = Some(t))

  /** Per-message routing (the reference default): each written row's
    * `topic` column is its destination. */
  def withTopicColumn(): KafkaSinkConfig = copy(topicColumnRouting = true)

  def options: Map[String, String] = {
    require(brokers.nonEmpty, "Kafka sink needs at least one broker (withBrokers)")
    require(topic.nonEmpty || topicColumnRouting,
      "Kafka sink needs a topic (withTopic) or per-message routing (withTopicColumn)")
    require(topic.isEmpty || !topicColumnRouting,
      "withTopic overrides the topic column (Spark's rule) — drop one")
    Map("kafka.bootstrap.servers" -> brokers.mkString(",")) ++
      topic.map("topic" -> _)
  }
}
