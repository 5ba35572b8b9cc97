package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{KafkaSinkConfig, KafkaSourceConfig}

/** Kafka builder surface vs the reference's KafkaSource_Builder /
  * KafkaSink_Builder (/root/reference/wf/kafka/builders_kafka.hpp:191-258).
  * No broker or connector jar exists in this container, so what is
  * verifiable — and pinned here — is the exact option map a connector-
  * equipped deployment consumes.
  */
class KafkaConfigSpec extends AnyFunSuite {

  test("source builder renders the full Spark kafka option map") {
    val opts = KafkaSourceConfig()
      .withBrokers("k1:9092", "k2:9092")
      .withTopics("orders", "clicks")
      .withOffsets(0L, 42L)
      .withGroupID("graft-g1")
      .withAssignmentPolicy("org.apache.kafka.clients.consumer.RoundRobinAssignor")
      .withIdleness(500L)
      .options
    assert(opts("kafka.bootstrap.servers") == "k1:9092,k2:9092")
    assert(opts("subscribe") == "orders,clicks")
    assert(opts("startingOffsets") == """{"orders":{"0":0},"clicks":{"0":42}}""")
    assert(opts("kafka.group.id") == "graft-g1")
    assert(opts("kafka.partition.assignment.strategy")
      == "org.apache.kafka.clients.consumer.RoundRobinAssignor")
    assert(opts("kafka.fetch.max.wait.ms") == "500")
  }

  test("offset-free source defaults to earliest; validation mirrors build()") {
    val opts = KafkaSourceConfig().withBrokers("k:9092").withTopics("t").options
    assert(opts("startingOffsets") == "earliest")
    assert(!opts.contains("kafka.group.id"))
    intercept[IllegalArgumentException](KafkaSourceConfig().withTopics("t").options)
    intercept[IllegalArgumentException](KafkaSourceConfig().withBrokers("k:9092").options)
    intercept[IllegalArgumentException](
      KafkaSourceConfig().withBrokers("k:9092").withTopics("a", "b").withOffsets(1L).options)
  }

  test("multi-partition topics render full per-partition offset maps") {
    val opts = KafkaSourceConfig()
      .withBrokers("k:9092")
      .withTopics("orders", "clicks")
      .withOffsets(7L, 9L) // scalar for both; clicks overridden below
      .withPartitionOffsets("clicks", Map(0 -> 5L, 1 -> -2L, 2 -> 11L))
      .options
    assert(opts("startingOffsets")
      == """{"orders":{"0":7},"clicks":{"0":5,"1":-2,"2":11}}""")
    // specific-offset JSON must cover every subscribed topic
    intercept[IllegalArgumentException](
      KafkaSourceConfig().withBrokers("k:9092").withTopics("a", "b")
        .withPartitionOffsets("a", Map(0 -> 1L)).options)
    // partition offsets for an unsubscribed topic are a builder bug
    intercept[IllegalArgumentException](
      KafkaSourceConfig().withBrokers("k:9092").withTopics("a")
        .withPartitionOffsets("zzz", Map(0 -> 1L)).options)
  }

  test("sink builder renders brokers + topic and validates both") {
    val opts = KafkaSinkConfig().withBrokers("k:9092").withTopic("out").options
    assert(opts == Map("kafka.bootstrap.servers" -> "k:9092", "topic" -> "out"))
    intercept[IllegalArgumentException](KafkaSinkConfig().withTopic("out").options)
    intercept[IllegalArgumentException](KafkaSinkConfig().withBrokers("k:9092").options)
  }
}
