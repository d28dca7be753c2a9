package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Outbound sinks (SURVEY §2.2 K4–K7) as pluggable emitters. The reference
  * posts to SNS/Slack over HTTP; in this engine those are `foreachBatch`
  * targets behind one interface, so tests and offline runs swap in a
  * collecting emitter.
  */
trait Emitter extends Serializable {
  /** K4: publish a message with attributes to a topic/queue. */
  def publish(topic: String, message: String, attributes: Map[String, String]): Unit
}

/** Collects messages in memory (tests / dry runs). */
final class CollectingEmitter extends Emitter {
  val sent = scala.collection.mutable.ArrayBuffer[(String, String, Map[String, String])]()
  override def publish(topic: String, message: String,
                       attributes: Map[String, String]): Unit =
    sent.synchronized { sent += ((topic, message, attributes)) }
}

/** Logs messages (production default when no HTTP egress is configured). */
final class LogEmitter extends Emitter {
  @transient private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)
  override def publish(topic: String, message: String,
                       attributes: Map[String, String]): Unit =
    log.info(s"publish topic=$topic attrs=$attributes message=$message")
}

/** K6: Slack state-machine status message formatting
  * (tre_slack_alerts.py:8-49): severity icon + environment + execution
  * detail lines. Pure column logic so alerts batch through the engine.
  */
object SlackAlerts {

  def statusIcon(status: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(status === "SUCCEEDED", lit(":white_check_mark:"))
      .when(status.isin("RUNNING", "retry"), lit(":warning:"))
      .otherwise(lit(":x:"))

  /** One formatted alert line per row: `<icon> env `name`: status`. */
  def format(df: DataFrame, env: String): DataFrame =
    df.withColumn("alert",
      concat(statusIcon(col("status")), lit(s" $env `"), col("name"),
        lit("`: "), col("status"),
        when(col("detail").isNotNull, concat(lit(" — "), col("detail")))
          .otherwise(lit(""))))

  /** K7: DLQ alert decode — source queue + topic from the record ARNs
    * (tre_dlq_slack_alerts.py:11-37: resource = arn.split(':')[5]).
    */
  def dlqAlert(df: DataFrame, env: String): DataFrame =
    df.withColumn("queue", split(col("event_source_arn"), ":").getItem(5))
      .withColumn("topic", split(col("topic_arn"), ":").getItem(5))
      .withColumn("alert",
        concat(lit(s":x: $env DLQ `"), col("queue"), lit("` received from `"),
          col("topic"), lit("`")))
}
