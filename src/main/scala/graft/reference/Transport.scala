package graft.reference

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable.ArrayBuffer

/** Record transport abstraction over the reference's Kafka hop.
  *
  * The reference hard-wires MSK: producers write (key,value) with
  * `write.format("kafka")` (`temDataRead.py:77-83`), consumers read with
  * `spark.read.format("kafka")` + IAM/SASL options
  * (`temReadFromTopic.py:36-59`). Our engine keeps the exact (key,value)
  * projection semantics but puts the wire behind this trait so the
  * pipelines are testable without a broker (the CI image has no Kafka
  * jars); [[KafkaTransport]] builds the same option set from plain
  * config instead of SSM (`temDataRead.py:85-95`).
  */
trait RecordTransport {

  /** Batch-write a (key STRING, value STRING) DataFrame. */
  def writeBatch(kv: DataFrame): Unit

  /** Send a single record — the incremental producer's per-row emission
    * (`04_temincrementaltem.py:87-94`). */
  def send(key: String, value: String): Unit

  /** Bounded read-back of everything written so far, with the Kafka wire
    * shape: key/value as BINARY (consumers cast back to string —
    * `temReadFromTopic.py:81`). */
  def readBatch(spark: SparkSession): DataFrame
}

/** In-memory transport for tests and local runs; preserves write order
  * like a single-partition topic. */
final class InMemoryTransport extends RecordTransport {
  private val buf = ArrayBuffer.empty[(String, String)]

  override def writeBatch(kv: DataFrame): Unit = {
    val rows = kv.select("key", "value").collect()
    buf.synchronized { rows.foreach(r => buf += ((r.getString(0), r.getString(1)))) }
  }

  override def send(key: String, value: String): Unit =
    buf.synchronized { buf += ((key, value)) }

  override def readBatch(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val snapshot = buf.synchronized { buf.toSeq }
    snapshot.toDF("k", "v")
      .selectExpr("CAST(k AS BINARY) AS key", "CAST(v AS BINARY) AS value")
  }

  def size: Int = buf.synchronized { buf.size }
}

/** Kafka/MSK config — the plain-config replacement for the reference's
  * SSM parameter lookups. `saslIam = true` reproduces the MSK IAM auth
  * option block (`temReadFromTopic.py:44-57`,
  * `03_temStreamEveryMin.py:48-57`, `temDataRead.py:64-74`), including
  * the client truststore path the reference installs on every executor.
  * KafkaContractSpec golden-checks these maps key-for-key against the
  * reference scripts' literal option dicts. */
final case class KafkaConfig(
    bootstrapServers: String,
    topic: String,
    saslIam: Boolean = false,
    truststoreLocation: String = "/tmp/kafka.client.truststore.jks") {

  /** Streaming read options (`03_temStreamEveryMin.py:41-57`); the batch
    * consumer adds `endingOffsets=latest` (`temReadFromTopic.py:41-42`),
    * which [[KafkaTransport.readBatch]] appends. */
  def readOptions: Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrapServers,
    "subscribe" -> topic,
    "startingOffsets" -> "earliest") ++ authOptions

  def writeOptions: Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrapServers,
    "topic" -> topic) ++ authOptions

  private def authOptions: Map[String, String] =
    if (!saslIam) Map.empty
    else Map(
      "kafka.ssl.truststore.location" -> truststoreLocation,
      "kafka.security.protocol" -> "SASL_SSL",
      "kafka.sasl.mechanism" -> "AWS_MSK_IAM",
      "kafka.sasl.jaas.config" ->
        "software.amazon.msk.auth.iam.IAMLoginModule required;",
      "kafka.sasl.client.callback.handler.class" ->
        "software.amazon.msk.auth.iam.IAMClientCallbackHandler")
}

/** Real Kafka transport (integration-gated: requires the
  * spark-sql-kafka connector on the classpath and a reachable broker —
  * neither exists in CI, where [[InMemoryTransport]] substitutes). */
final class KafkaTransport(spark: SparkSession, cfg: KafkaConfig) extends RecordTransport {

  override def writeBatch(kv: DataFrame): Unit =
    kv.write.format("kafka").options(cfg.writeOptions).save()

  override def send(key: String, value: String): Unit = {
    import spark.implicits._
    writeBatch(Seq((key, value)).toDF("key", "value"))
  }

  override def readBatch(spark: SparkSession): DataFrame =
    spark.read.format("kafka")
      .options(cfg.readOptions + ("endingOffsets" -> "latest"))
      .load()
      .select("key", "value")
}
