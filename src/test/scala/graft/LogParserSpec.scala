package graft

import graft.elb.{LogParser, Synthetic}

/** Messy-data contract of the ELB layer (README.md:61, FIXTURES.md §B). */
class LogParserSpec extends SparkSpec {
  import spark.implicits._

  private val wellFormed =
    """2015-07-22T09:00:28.019143Z marketpalce-shop 106.51.235.133:54635 10.0.4.227:80 0.000022 0.026109 0.000020 200 200 0 699 "GET https://example.shop:443/shop/authresponse?code=abc HTTP/1.1" "Mozilla/5.0 (Windows NT 6.1; WOW64) AppleWebKit/537.36" ECDHE-RSA-AES128-GCM-SHA256 TLSv1.2"""

  test("well-formed line parses every field") {
    val r = LogParser.requests(Seq(wellFormed).toDF("value")).collect().head
    assert(r.getAs[java.sql.Timestamp]("ts").toInstant.toString
      === "2015-07-22T09:00:28.019143Z")
    assert(r.getAs[String]("client_ip") === "106.51.235.133")
    assert(r.getAs[Int]("client_port") === 54635)
    assert(r.getAs[String]("backend_ip") === "10.0.4.227")
    assert(r.getAs[Double]("backend_time_sec") === 0.026109)
    assert(r.getAs[Int]("elb_status") === 200)
    assert(r.getAs[Long]("sent_bytes") === 699L)
    assert(r.getAs[String]("method") === "GET")
    assert(r.getAs[String]("url") === "https://example.shop:443/shop/authresponse?code=abc")
    assert(r.getAs[String]("http_version") === "HTTP/1.1")
    assert(r.getAs[String]("user_agent").startsWith("Mozilla/5.0 (Windows"))
    assert(r.getAs[String]("ssl_protocol") === "TLSv1.2")
  }

  test("timeout line: -1 timings and - backend become nulls, not crashes") {
    val line = wellFormed
      .replace("10.0.4.227:80", "-")
      .replace("0.000022 0.026109 0.000020", "-1 -1 -1")
      .replace("200 200", "504 -")
    val r = LogParser.requests(Seq(line).toDF("value")).collect().head
    assert(r.getAs[String]("backend_ip") === null)
    assert(r.isNullAt(r.fieldIndex("request_time_sec")))
    assert(r.isNullAt(r.fieldIndex("backend_time_sec")))
    assert(r.getAs[Int]("elb_status") === 504)
    assert(r.isNullAt(r.fieldIndex("backend_status")))
  }

  test("user agent with embedded escaped quotes and spaces survives") {
    val line = wellFormed.replace(
      "\"Mozilla/5.0 (Windows NT 6.1; WOW64) AppleWebKit/537.36\"",
      "\"weird \\\"quoted\\\" agent, with spaces\"")
    val r = LogParser.requests(Seq(line).toDF("value")).collect().head
    assert(r.getAs[String]("user_agent") === "weird \"quoted\" agent, with spaces")
    assert(r.getAs[String]("ssl_protocol") === "TLSv1.2")
  }

  test("malformed lines are quarantined, never dropped silently") {
    val rng = new scala.util.Random(7)
    val bad = Seq.fill(5)(Synthetic.corruptLine(rng))
    val good = Synthetic.generate(seed = 1, nClients = 2,
      sessionsPerClient = 1, hitsPerSession = 3)
    val lines = (bad ++ good).toDF("value")
    assert(LogParser.requests(lines).count() === good.size)
    assert(LogParser.quarantine(lines).count() === bad.size)
    // conservation: every input line lands exactly one side
    assert(LogParser.parse(lines).count() === bad.size + good.size)
  }

  test("real .gz file arrives as ONE partition; repartition restores parallelism") {
    // gzip is non-splittable: however large the file, spark.read.text gives
    // a single input partition — the 100 TB path MUST repartition right
    // after the scan (SURVEY §7.5.3). Observed here on a real gzipped file,
    // not just claimed in scaladoc.
    import java.util.zip.GZIPOutputStream
    val lines = Synthetic.generate(seed = 3, nClients = 20,
      sessionsPerClient = 2, hitsPerSession = 5)
    val dir = java.nio.file.Files.createTempDirectory("graft_gz")
    val gz = dir.resolve("sample.log.gz")
    val out = new GZIPOutputStream(java.nio.file.Files.newOutputStream(gz))
    out.write(lines.mkString("\n").getBytes("UTF-8"))
    out.close()

    val df = spark.read.text(gz.toString)
    assert(df.rdd.getNumPartitions === 1, "gz must be read as one partition")
    assert(df.count() === lines.size)
    val re = df.repartition(4)
    assert(re.rdd.getNumPartitions === 4)
    // and the parse still yields every well-formed line
    assert(LogParser.requests(re).count() === lines.size)
  }

  test("generator yields exactly nClients * sessionsPerClient sessions") {
    import org.apache.spark.sql.functions._
    val lines = Synthetic.generate(seed = 5, nClients = 7,
      sessionsPerClient = 3, hitsPerSession = 4).toDF("value")
    val sessions = graft.ops.Sessionize.sessions(
      LogParser.requests(lines),
      col("client_ip"), col("ts"), col("client_port"), col("url"))
    assert(sessions.count() === 7L * 3)
  }
}
