package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Offline smoke checks for the Kafka seam (S2/S3). The build env has
  * no broker and no spark-sql-kafka connector jar, so the source/sink
  * can never EXECUTE here; what this spec pins is everything that can
  * go wrong before a broker is involved:
  *  - the payload projection obeys the Kafka sink contract
  *    (key STRING, value STRING) and round-trips through the shared
  *    `value: STRING` parse chain;
  *  - the option keys/format string match the published connector
  *    names, so a typo cannot survive to a real cluster;
  *  - the sink writer BUILDS without a broker (validation happens at
  *    start()), and the source fails fast with the documented
  *    connector-missing error rather than something unrelated.
  */
class KafkaSeamSpec extends SparkTestBase {
  import spark.implicits._

  private val states = Seq(
    ("ab1", "CALL1", 1700000100L, 2.1, 48.8),
    ("cd2", null, 1700000100L, 13.4, 52.5))
    .toDF("icao24", "callsign", "last_contact", "longitude", "latitude")

  test("kafka payload contract: (key STRING, value STRING), value round-trips the parse chain shape") {
    val payload = Pipelines.kafkaPayload(states)
    assert(payload.schema.map(f => f.name -> f.dataType.simpleString) ==
      Seq("key" -> "string", "value" -> "string"))
    val rows = payload.orderBy($"key").as[(String, String)].collect()
    assert(rows.map(_._1).toSeq == Seq("ab1", "cd2"))
    // value is one JSON document per record; fields are recoverable.
    // EVALUATED extraction — get_json_object(...) itself is a Column
    // object and is never null, so comparing it to null tests nothing
    assert(Seq(rows.head._2).toDF("value")
        .select(get_json_object($"value", "$.icao24"))
        .as[String].head() == "ab1")
    val back = spark.read.json(Seq(rows.head._2).toDS())
    assert(back.columns.toSet == Set("icao24", "callsign", "last_contact", "longitude", "latitude"))
    assert(back.select($"icao24").as[String].head() == "ab1")
  }

  test("option names match the published connector contract") {
    // these literals are the spark-sql-kafka option names; the
    // constants in Pipelines are the single source of truth for the
    // engine, and this spec is the tripwire for typos in either place
    assert(Pipelines.KafkaFormat == "kafka")
    assert(Pipelines.KafkaBootstrapOpt == "kafka.bootstrap.servers")
    assert(Pipelines.KafkaSubscribeOpt == "subscribe")
    assert(Pipelines.KafkaStartingOffsetsOpt == "startingOffsets")
    assert(Pipelines.KafkaTopicOpt == "topic")
    assert(Pipelines.CheckpointOpt == "checkpointLocation")
    assert(Pipelines.kafkaSourceOptions("b:9092", "t") == Map(
      "kafka.bootstrap.servers" -> "b:9092",
      "subscribe" -> "t",
      "startingOffsets" -> "earliest"))
  }

  test("sink writer builds without a broker; source fails with the documented connector-missing error") {
    // building the DataStreamWriter performs the payload projection and
    // option wiring — only start() needs the connector. The input must
    // be a streaming frame; the built-in rate source stands in for the
    // ingest chain.
    val streamStates = spark.readStream.format("rate").load()
      .select(
        concat(lit("ab"), $"value").as("icao24"),
        lit("C1").as("callsign"),
        $"value".as("last_contact"))
    // building must not throw (start() is where the connector is
    // needed); a null-check on the returned writer could never fail
    Pipelines.kafkaSink(streamStates, "b:9092", "t", "/tmp/ckpt_unused")
    // the source resolves the format eagerly at load(); in this env
    // that must fail with the standard missing-data-source error
    // (anything else would mean the wiring itself is broken)
    val err = intercept[Exception](
      Pipelines.kafkaSource(spark, "b:9092", "t"))
    def messages(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ++ messages(t.getCause)
    assert(messages(err).mkString("\n").toLowerCase.contains("kafka"),
      s"unexpected failure: $err")
  }
}
