package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Encoding robustness for the events loader: the physical encoding of
  * `ts` is a property of files we don't produce, and it has already
  * flipped once in the corpus's history (TIMESTAMP(NANOS) → INT64 micros
  * `isAdjustedToUTC=0`, i.e. TIMESTAMP_NTZ — the flip that broke six
  * queries in round 5). This spec writes the same three instants under
  * every encoding the loader dispatches on and asserts
  * [[Tables.normalizeEventTs]] lands them on identical `unix_micros`
  * values, so the next flip is caught here instead of by the driver.
  *
  * The nanos fixture is a raw INT64 column: Spark cannot WRITE
  * TIMESTAMP(NANOS), but under `spark.sql.legacy.parquet.nanosAsLong`
  * (construction-time conf — [[graft.GraftSession.configure]] for the
  * mains, TestSpark's builder here) a true nanos file SURFACES as
  * exactly this LongType shape, which is the branch being exercised.
  */
class EventsEncodingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val instantsUs = Seq(
    1704067200000000L, // 2024-01-01 00:00:00 UTC
    1704070859123456L, // sub-second micros survive
    // 2024-03-10 02:30:00 UTC: as an NTZ wall-clock this falls inside
    // America/New_York's spring-forward DST GAP (02:00-03:00 doesn't
    // exist there) — a cast-then-compensate normalization resolves the
    // zone offset at the wall-clock and shifts such instants by the DST
    // delta; the zone-free field-arithmetic path must not
    1710037800000000L,
    1735689599999999L)

  private def writeFixture(encoding: String): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory(s"graft-enc-$encoding").toString
    val base = instantsUs.zipWithIndex
      .map { case (us, i) => (i.toLong, us, i.toLong, "click", 1.0, null: String) }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
    val ts = encoding match {
      case "nanos_long" => (col("us") * 1000).cast(LongType)
      case "ntz_micros" => timestamp_micros(col("us")).cast(TimestampNTZType)
      case "ltz_micros" => timestamp_micros(col("us"))
    }
    base.withColumn("ts", ts)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def readUs(dir: String): Seq[(Long, Long)] =
    Tables.events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  test("all three ts encodings normalize to identical micro instants") {
    val expected = instantsUs.zipWithIndex.map { case (us, i) => (i.toLong, us) }.sorted
    for (enc <- Seq("nanos_long", "ntz_micros", "ltz_micros")) {
      val dir = writeFixture(enc)
      // the fixture must actually carry the encoding it claims
      val raw = spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
      val expectedRaw = enc match {
        case "nanos_long" => LongType
        case "ntz_micros" => TimestampNTZType
        case "ltz_micros" => TimestampType
      }
      assert(raw == expectedRaw, s"$enc fixture surfaced as $raw")
      val normalized = Tables.events(spark, dir).schema("ts").dataType
      assert(normalized == TimestampType, s"$enc normalized to $normalized")
      assert(readUs(dir) == expected, s"$enc values diverge")
    }
  }

  test("NTZ normalization is session-timezone independent") {
    // the naive wall-clock IS the UTC instant (corpus contract; DuckDB's
    // epoch_us assumes it) — a non-UTC session must read the same instants
    val dir = writeFixture("ntz_micros")
    val expected = readUs(dir) // UTC session (TestSpark pins it)
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "America/New_York")
      assert(readUs(dir) == expected, "instants shifted in a non-UTC session")
      spark.conf.set(tzKey, "Asia/Tokyo")
      assert(readUs(dir) == expected, "instants shifted in a non-UTC session")
    } finally spark.conf.set(tzKey, saved)
  }

  test("an unknown ts encoding fails loudly at load time") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-enc-unknown").toString
    // ts as a string column: no normalization branch should accept this
    instantsUs.zipWithIndex
      .map { case (us, i) => (i.toLong, us.toString, i.toLong, "click", 1.0, null: String) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException](Tables.events(spark, dir))
    assert(e.getMessage.contains("unsupported type"))
  }

  test("an explicit schema lets the stream start on an empty landing dir") {
    import org.apache.spark.sql.streaming.OutputMode
    import org.apache.spark.sql.types._
    val landing = Files.createTempDirectory("graft-enc-landing").toString
    val ntzSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampNTZType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // empty dir: the probe would throw; the explicit schema must not
    val stream = graft.streaming.EventsStreaming.readEvents(
      spark, landing, schema = Some(ntzSchema))
    assert(stream.schema("ts").dataType == TimestampType)
    // data lands AFTER the stream is defined; the query then picks it up
    val src = writeFixture("ntz_micros")
    val part = Files.list(java.nio.file.Path.of(s"$src/events.parquet"))
      .filter(_.getFileName.toString.startsWith("part-")).findFirst().get()
    Files.copy(part, java.nio.file.Path.of(landing, "events_1.parquet"))
    graft.streaming.EventsStreaming.runToMemory(
      stream.select(col("event_id"), unix_micros(col("ts")).as("us")),
      "enc_landing", OutputMode.Append())
    val got = spark.table("enc_landing")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got == instantsUs.zipWithIndex.map { case (us, i) => (i.toLong, us) }.sorted)
  }

  test("streaming source normalizes each encoding like the batch loader") {
    import org.apache.spark.sql.streaming.OutputMode
    for (enc <- Seq("nanos_long", "ntz_micros", "ltz_micros")) {
      val dir = writeFixture(enc)
      val stream = graft.streaming.EventsStreaming.readEvents(spark, s"$dir/events.parquet")
      assert(stream.schema("ts").dataType == TimestampType, s"$enc stream ts type")
      graft.streaming.EventsStreaming.runToMemory(
        stream.select(col("event_id"), unix_micros(col("ts")).as("us")),
        s"enc_stream_$enc", OutputMode.Append())
      val streamed = spark.table(s"enc_stream_$enc")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(streamed == readUs(dir), s"$enc stream diverges from batch")
    }
  }
}
