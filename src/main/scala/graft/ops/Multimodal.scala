package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing (SURVEY.md §2.11): media payloads are opaque
  * `binary` columns with a typed metadata struct riding alongside the
  * relational columns; Parquet round-trips them natively.
  *
  * The actual codec (image/audio decode) is STUBBED — the container ships
  * no media libraries — behind `decodeStub`, a deterministic fake that maps
  * payload bytes → (width, height, n_frames). Everything Spark-side is
  * real and tested: the binary column, the metadata struct schema, the
  * per-partition batch processing shape (`mapPartitions` over a typed
  * Dataset — the Scala analogue of arrow-batched mapInPandas), and the
  * partitioning. Swapping `decodeStub` for a real JNI/codec call changes
  * no plan shape.
  *
  * Scale note: payloads stay columnar until the decode stage; decode is a
  * narrow per-partition map (no shuffle), so it parallelizes per input
  * split and can be pipelined after a repartition sized to codec memory.
  */
object Multimodal {

  /** Typed decode-stage row. */
  case class Media(doc_id: Long, format: String, payload: Array[Byte])
  case class Decoded(doc_id: Long, format: String, n_bytes: Int,
                     width: Int, height: Int, n_frames: Int)

  /** Deterministic fake decode: derives dimensions from payload length.
    * Replace with a real codec behind the same signature. */
  def decodeStub(m: Media): Decoded = {
    val n = m.payload.length
    Decoded(m.doc_id, m.format, n,
      width = 64 + n % 512,
      height = 64 + (n * 7) % 512,
      n_frames = 1 + n % 24)
  }

  /** documents.text bytes masquerade as media payloads: binary column +
    * metadata struct. This is the ingest shape a real pipeline would have
    * after reading (path, bytes) pairs. */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        col("text").cast("binary").as("payload"),
        struct(
          lit("txt").as("format"),
          length(col("text").cast("binary")).as("n_bytes"),
          col("source").as("origin")).as("meta"))

  /** Decode stage: typed Dataset → mapPartitions (per-partition imperative
    * batch, the genuine escape hatch of SURVEY §2.9) → typed result. */
  def decode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .select(col("doc_id"), col("meta.format").as("format"), col("payload"))
      .as[Media]
      .mapPartitions(_.map(decodeStub))
      .toDF()
  }

  /** Oracle-checkable query over the decode output: the stub arithmetic is
    * reproducible in SQL from octet_length(text). */
  def mediaFeatures(s: SparkSession, dir: String): DataFrame =
    decode(s, dir)
      .select(col("doc_id"), col("format"), col("n_bytes"),
        col("width"), col("height"), col("n_frames"))
      .orderBy(col("doc_id"))

  /** Binary-column relational ops without decode: checksums + prefix bytes
    * straight on the payload (stays in codegen). */
  def mediaChecksums(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .select(col("doc_id"),
        col("meta.n_bytes").as("n_bytes"),
        md5(col("payload")).as("checksum"),
        hex(expr("substring(payload, 1, 4)")).as("head_hex"))
      .orderBy(col("doc_id"))

  /** "Frame sampling" on the opaque payload: every 16th byte, first 8
    * samples — demonstrates byte-level slicing staying columnar. */
  def frameSample(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .select(col("doc_id"), expr(
        """transform(sequence(0, least(7, cast(floor((octet_length(payload) - 1) / 16) as int))),
          |  i -> ascii(cast(substring(payload, i * 16 + 1, 1) as string)))""".stripMargin)
        .as("samples"))
      .select(col("doc_id"),
        concat_ws(",", expr("transform(samples, x -> cast(x as string))")).as("sample_csv"))
      .orderBy(col("doc_id"))

  /** "Resize" on the opaque payload: stride-sample bytes down to a target
    * budget (the byte-level stand-in for image downscaling — swap the
    * per-row function for a codec call; the columnar plumbing and the
    * deterministic-size output contract are the real part). */
  def resize(s: SparkSession, dir: String): DataFrame = {
    val target = 64
    val strideSql = s"greatest(1, cast(floor(octet_length(payload) / $target) as int))"
    val nOutSql =
      s"least($target, cast(floor((octet_length(payload) - 1) / $strideSql) as int) + 1)"
    val resizedSql =
      s"""transform(sequence(0, $nOutSql - 1),
         |  i -> ascii(cast(substring(payload, i * $strideSql + 1, 1) as string)))""".stripMargin
    mediaTable(s, dir)
      .select(col("doc_id"), col("meta.n_bytes").as("n_bytes"),
        expr(resizedSql).as("resized"), expr(strideSql).as("stride"))
      .select(col("doc_id"), col("n_bytes"),
        size(col("resized")).as("resized_len"), col("stride"))
      .orderBy(col("doc_id"))
  }

  /** Perceptual-hash near-duplicate pairs over the opaque payloads — the
    * media-dedup stage of a LAION-style multimodal pipeline, on the stub
    * "thumbnail": a 60-bit difference hash (dHash, Krawetz '13 — bit i set
    * iff sample i < sample i+1) over 61 stride-sampled payload bytes, then
    * Hamming-≤3 pairs found via BANDED blocking (4 × 15-bit bands; by
    * pigeonhole any pair within distance 3 collides on ≥ 1 band) and
    * verified exactly with one codegen'd `bit_count(xor)` — never an
    * all-pairs join, the same (band, bucket) equi-join scale shape as the
    * text MinHash/SimHash family. Swapping the byte sampler for a real
    * thumbnail decoder changes no plan shape. `n_candidates` (the banded
    * candidate-pair volume both engines re-derive) rides the hash, so a
    * banding bug that inflates OR starves the candidate set breaks the
    * GATE, not just recall. */
  def mediaPhash(s: SparkSession, dir: String): DataFrame = {
    val hashed = mediaTable(s, dir)
      .filter(expr("octet_length(payload) >= 65"))
      .withColumn("stride", expr("greatest(1, (octet_length(payload) - 1) div 60)"))
      .select(col("doc_id"), expr(
        """aggregate(sequence(0, 59), 0L, (acc, i) -> acc +
          |  IF(ascii(cast(substring(payload, i * stride + 1, 1) as string)) <
          |     ascii(cast(substring(payload, (i + 1) * stride + 1, 1) as string)),
          |     shiftleft(1L, 59 - i), 0L))""".stripMargin).as("h"))
      .persist() // q-cache
    val banded = hashed
      .select(col("doc_id"), col("h"), explode(sequence(lit(0), lit(3))).as("j"))
      .withColumn("b", expr("shiftright(h, 15 * j) & 32767"))
    val cand = banded.as("a")
      .join(banded.as("c"),
        col("a.j") === col("c.j") && col("a.b") === col("c.b") &&
          col("a.doc_id") < col("c.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("c.doc_id").as("doc_b"),
        col("a.h").as("ha"), col("c.h").as("hb"))
      .distinct()
      .persist() // q-cache
    val nCand = cand.agg(count(lit(1)).as("n_candidates"))
    cand
      .withColumn("hamming", expr("cast(bit_count(ha ^ hb) as int)"))
      .filter(col("hamming") <= 3)
      .crossJoin(broadcast(nCand))
      .select(col("doc_a"), col("doc_b"), col("hamming"), col("n_candidates"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_decode" -> (mediaFeatures _),
    "q_media_checksums" -> (mediaChecksums _),
    "q_media_frame_sample" -> (frameSample _),
    "q_media_resize" -> (resize _),
    "q_media_phash" -> (mediaPhash _),
  )

  val oracleSql: Map[String, String] = Map(
    // mirrors decodeStub's arithmetic on strlen (byte length; ASCII corpus)
    "q_media_decode" ->
      """SELECT doc_id, 'txt' AS format,
        |  CAST(strlen(text) AS INTEGER) AS n_bytes,
        |  CAST(64 + strlen(text) % 512 AS INTEGER) AS width,
        |  CAST(64 + (strlen(text) * 7) % 512 AS INTEGER) AS height,
        |  CAST(1 + strlen(text) % 24 AS INTEGER) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_media_checksums" ->
      """SELECT doc_id, CAST(strlen(text) AS INTEGER) AS n_bytes,
        |  md5(text) AS checksum,
        |  upper(hex(substring(text, 1, 4))) AS head_hex
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_media_resize" ->
      """SELECT doc_id, CAST(strlen(text) AS INTEGER) AS n_bytes,
        |  CAST(least(64, CAST(floor((strlen(text) - 1) /
        |    greatest(1, CAST(floor(strlen(text) / 64) AS INTEGER))) AS INTEGER) + 1) AS INTEGER)
        |    AS resized_len,
        |  CAST(greatest(1, CAST(floor(strlen(text) / 64) AS INTEGER)) AS INTEGER) AS stride
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_media_phash" ->
      """WITH med AS (
        |  SELECT doc_id, text AS payload,
        |    octet_length(CAST(text AS BLOB)) AS n
        |  FROM documents WHERE octet_length(CAST(text AS BLOB)) >= 65),
        |hashed AS (
        |  SELECT doc_id,
        |    (SELECT sum(CASE WHEN
        |        ascii(substring(payload, CAST(i * s + 1 AS INTEGER), 1)) <
        |        ascii(substring(payload, CAST((i + 1) * s + 1 AS INTEGER), 1))
        |      THEN (1::BIGINT << CAST(59 - i AS INTEGER)) ELSE 0 END)
        |     FROM (SELECT unnest(range(60)) AS i),
        |          (SELECT greatest(1, (n - 1) // 60) AS s)) AS h
        |  FROM med),
        |bands AS (SELECT doc_id, h, unnest(range(4)) AS j FROM hashed),
        |banded AS (
        |  SELECT doc_id, h, j, (h >> CAST(15 * j AS INTEGER)) & 32767 AS b
        |  FROM bands),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b,
        |    a.h AS ha, c.h AS hb
        |  FROM banded a JOIN banded c
        |    ON a.j = c.j AND a.b = c.b AND a.doc_id < c.doc_id)
        |SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming,
        |  (SELECT count(*) FROM cand) AS n_candidates
        |FROM cand WHERE bit_count(xor(ha, hb)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,

    "q_media_frame_sample" ->
      """SELECT doc_id,
        |  array_to_string(list_transform(
        |    range(0, least(8, CAST(floor((strlen(text) - 1) / 16) AS INTEGER) + 1)),
        |    i -> CAST(ord(substring(text, CAST(i * 16 + 1 AS INTEGER), 1)) AS VARCHAR)), ',')
        |    AS sample_csv
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
