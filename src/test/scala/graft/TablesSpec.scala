package graft

import org.apache.spark.sql.functions._

/** Loader portability: the driver regenerates /root/testdata between rounds
  * and has already shipped events.ts in two physical encodings (int64 nanos in
  * rounds 1-5, TIMESTAMP(MICROS, isAdjustedToUTC=false) since round 6). These
  * specs pin BOTH encodings locally — so a regeneration can never silently
  * break one path again — and run an acceptance canary over every live
  * testdata table so NEW drift fails fast with a named diagnostic instead of
  * scattered downstream errors. */
class TablesSpec extends SparkSpec {

  /** Write `rows` as <dir>/events.parquet with ts produced by `tsCol` applied
    * to the raw µs epoch column, mimicking one driver encoding. */
  private def writeEncoded(tag: String, tsCol: org.apache.spark.sql.Column): String = {
    import spark.implicits._
    val dir = new java.io.File(s"/root/repo/target/test_events_enc_$tag")
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    Seq(
      (1L, 1700000000000000L, 10L, "click", 1.5, "{}"),
      (2L, 1700000123456789L, 11L, "purchase", 2.5, "{}"),
      (3L, 1700003600000001L, 10L, "view", 0.5, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), tsCol.as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite")
      .parquet(new java.io.File(dir, "events.parquet").getAbsolutePath)
    dir.getAbsolutePath
  }

  test("events loader normalizes every shipped ts encoding to the same µs instants") {
    val nanosDir = writeEncoded("nanos", col("us") * 1000L) // plain unannotated int64
    val ntzDir = writeEncoded("ntz", // round 6+: TIMESTAMP_NTZ micros
      timestamp_micros(col("us")).cast("timestamp_ntz"))
    val tsDir = writeEncoded("tz", timestamp_micros(col("us"))) // plain µs TimestampType
    // rounds 1-5's REAL encoding: int64 annotated TIMESTAMP(NANOS,
    // isAdjustedToUTC=false). Spark cannot write that annotation, so the
    // committed fixture was produced once outside Spark
    // (tools/make_nanos_fixture.py) — without it the nanosAsLong branch
    // would only ever be exercised over unannotated int64, and a Spark
    // upgrade breaking annotated-NANOS reads would surface only in the field
    val realNanosDir = new java.io.File(
      getClass.getResource("/nanos_events/events.parquet").toURI)
      .getParentFile.getAbsolutePath
    val want = Seq(1700000000000000L, 1700000123456789L, 1700003600000001L)
    for (dir <- Seq(nanosDir, ntzDir, tsDir, realNanosDir)) {
      val got = Tables.events(spark, dir)
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
        .orderBy(col("event_id")).collect().map(_.getLong(1)).toSeq
      assert(got == want, s"encoding at $dir decoded to $got, want $want")
      assert(Tables.events(spark, dir).schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType,
        s"loader must normalize ts to TimestampType (dir $dir)")
    }
  }

  test("events loader pins the UTC session its NTZ cast depends on") {
    // the NTZ→Timestamp cast reads wall-clock AS the session zone: under a
    // driver-built non-UTC session every instant would shift by the zone
    // offset (moving window/session boundaries vs the oracle). The loader
    // must enforce UTC itself, like it enforces nanosAsLong.
    val dir = writeEncoded("ntz_nonutc",
      timestamp_micros(col("us")).cast("timestamp_ntz"))
    val want = Seq(1700000000000000L, 1700000123456789L, 1700003600000001L)
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val got = Tables.events(spark, dir)
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
        .orderBy(col("event_id")).collect().map(_.getLong(1)).toSeq
      assert(got == want,
        s"NTZ instants shifted under a non-UTC driver session: $got, want $want")
      assert(spark.conf.get("spark.sql.session.timeZone") == "UTC",
        "loader did not pin the session to UTC")
      // the harder ordering: zone changed AFTER the DataFrame is built but
      // BEFORE it executes — a load-time conf pin cannot protect this (the
      // cast resolves its zone at execution), only the session-independent
      // re-zoning expression can
      val df = Tables.events(spark, dir)
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
        .orderBy(col("event_id"))
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val late = df.collect().map(_.getLong(1)).toSeq
      assert(late == want,
        s"NTZ instants shifted when the zone changed between plan and run: $late")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("an unrecognized events.ts type fails fast with a named diagnostic") {
    val dir = writeEncoded("bad", col("us").cast("string"))
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("events.ts"), s"diagnostic must name the column: ${e.getMessage}")
  }

  test("driver-format drift canary: loaders accept every live testdata table") {
    // acceptance check, not a frozen schema: whatever types the current
    // regeneration shipped, every loader must read them and the normalized
    // events.ts must come out as µs TimestampType
    // the raw-footer probe is itself best-effort: if the file is so far gone
    // that Spark can't even infer a schema, the canary's named diagnostic
    // must still surface rather than being replaced by the probe's exception
    def rawSchema(t: String): String =
      scala.util.Try(spark.read.parquet(s"$sfDir/$t.parquet").schema.treeString)
        .getOrElse("<unreadable footer>")
    Tables.all.foreach { t =>
      val df =
        try Tables.load(spark, sfDir, t)
        catch { case e: Throwable => fail(
          s"loader rejected $sfDir/$t.parquet — driver format drift? " +
            s"physical schema: ${rawSchema(t)}", e)
        }
      try df.limit(1).collect()
      catch { case e: Throwable => fail(
        s"reading $sfDir/$t.parquet failed — driver format drift in a column type? " +
          s"loaded schema: ${scala.util.Try(df.schema.treeString).getOrElse(rawSchema(t))}", e)
      }
    }
    assert(Tables.events(spark, sfDir).schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
  }
}
