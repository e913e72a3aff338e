package graft.elb

import org.apache.spark.sql.types._

/** AWS Classic ELB access-log record (SURVEY.md §1.1-1.2).
  *
  * The reference pins this format by linking the AWS ELB access-log docs
  * (/root/reference/README.md:44-45) and names the one-day sample file
  * (/root/reference/.MISSING_LARGE_BLOBS:1). 15 space-delimited fields per
  * line; fields 12 (`request`) and 13 (`user_agent`) are double-quoted and
  * may contain spaces. `-` / `-1` are the spec's null sentinels.
  */
object LogSchema {

  /** Raw tokenized line: 15 string fields, before typing. Declared
    * explicitly — no inference (SURVEY §1.1). */
  val raw: StructType = StructType(Seq(
    StructField("timestamp_raw", StringType),
    StructField("elb", StringType),
    StructField("client_addr", StringType),
    StructField("backend_addr", StringType),
    StructField("request_processing_time", StringType),
    StructField("backend_processing_time", StringType),
    StructField("response_processing_time", StringType),
    StructField("elb_status_code", StringType),
    StructField("backend_status_code", StringType),
    StructField("received_bytes", StringType),
    StructField("sent_bytes", StringType),
    StructField("request", StringType),
    StructField("user_agent", StringType),
    StructField("ssl_cipher", StringType),
    StructField("ssl_protocol", StringType)))

  /** Fully-typed `requests` relation produced by LogParser.parse. */
  val parsed: StructType = StructType(Seq(
    StructField("ts", TimestampType),
    StructField("elb", StringType),
    StructField("client_ip", StringType),
    StructField("client_port", IntegerType),
    StructField("backend_ip", StringType),
    StructField("backend_port", IntegerType),
    StructField("request_time_sec", DoubleType),
    StructField("backend_time_sec", DoubleType),
    StructField("response_time_sec", DoubleType),
    StructField("elb_status", IntegerType),
    StructField("backend_status", IntegerType),
    StructField("received_bytes", LongType),
    StructField("sent_bytes", LongType),
    StructField("method", StringType),
    StructField("url", StringType),
    StructField("http_version", StringType),
    StructField("user_agent", StringType),
    StructField("ssl_cipher", StringType),
    StructField("ssl_protocol", StringType)))

  /** Typed row for Dataset[Request] use. */
  case class Request(
      ts: java.sql.Timestamp,
      elb: String,
      client_ip: String,
      client_port: Option[Int],
      backend_ip: Option[String],
      backend_port: Option[Int],
      request_time_sec: Option[Double],
      backend_time_sec: Option[Double],
      response_time_sec: Option[Double],
      elb_status: Option[Int],
      backend_status: Option[Int],
      received_bytes: Option[Long],
      sent_bytes: Option[Long],
      method: String,
      url: String,
      http_version: String,
      user_agent: String,
      ssl_cipher: Option[String],
      ssl_protocol: Option[String])
}
