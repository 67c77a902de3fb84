package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish star schema (TESTDATA.md).
  *
  * Reads go through `spark.read.parquet` so Catalyst predicate pushdown,
  * column pruning and (for partitioned layouts written by
  * [[graft.edfs.GraftCatalog]]) partition pruning all apply — this is the
  * Spark-native analog of the reference's block/partition storage
  * (`/root/reference/combined_flask.py:324` put, :492 readPartition).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Source-data fingerprint (leaf count + bytes + max mtime) for memo
    * invalidation: derived artifacts (digest stores, trained codebooks,
    * benchmark sketches, IVF indexes) key their caches on this so data
    * regenerated in-place under the same dir rebuilds them instead of
    * silently serving artifacts of the old data. */
  def fingerprint(sfDir: String, name: String): String = {
    val root = new java.io.File(sfDir, s"$name.parquet")
    val leaves =
      if (root.isDirectory)
        Option(root.listFiles()).getOrElse(Array.empty[java.io.File]).filter(_.isFile)
      else Array(root)
    s"${leaves.length}:${leaves.map(_.length).sum}:" +
      s"${leaves.map(_.lastModified).foldLeft(0L)(math.max)}"
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** [[load]] with the query's output ORDER established on the raw scan,
    * BEFORE the caller's projection. Spark's range partitioner SAMPLES its
    * child plan to pick sort boundaries — a full extra evaluation — so an
    * entry point shaped `scan → expensive kernel map → orderBy(key)` runs
    * its kernel stage TWICE (once in the sampling job, once for real;
    * measured ~40% of total on the sf1 text/codec lanes). Sorting the bare
    * input first moves the sampling pass onto the cheap scan, and because a
    * deterministic per-row projection preserves row order, the output is
    * bit-identical to projecting first and sorting last (plan-gated: the
    * kernel must sit ABOVE rangepartitioning). Entry points only — composed
    * pipelines keep using [[load]] and sort at their own entry, the
    * no-orderBy-in-builders discipline. */
  def loadSorted(spark: SparkSession, sfDir: String, name: String,
    keys: String*): DataFrame =
    load(spark, sfDir, name)
      .orderBy(keys.map(org.apache.spark.sql.functions.col): _*)

  /** Schema-adaptive events loader. The driver has shipped `ts` in two
    * physical encodings across testdata generations — int64 NANOS (read as
    * LongType under the legacy nanosAsLong conf) and
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as TimestampNTZType) — so
    * the loader branches on the type it actually finds instead of assuming
    * one. Every branch normalizes to microsecond TimestampType under the UTC
    * session, which is the instant DuckDB sees when it reads the same file
    * (NANOS truncate to µs; NTZ wall-clock == UTC instant), so oracle
    * comparisons agree for every encoding. An unrecognized type fails fast
    * with a named diagnostic rather than 11 scattered downstream errors. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // set BEFORE the read so a NANOS footer maps to LongType instead of
    // throwing; a no-op for µs-encoded files
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // session-zone pin: the NTZ instant below is session-independent by
    // construction, but downstream RENDERING (date_format in window labels,
    // oracle string dumps) still reads the session zone — keep driver-built
    // sessions on the same UTC footing GraftConf-built ones get.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val tsNorm = raw.schema("ts").dataType match {
      case LongType         => expr("timestamp_micros(ts div 1000)") // raw nanos
      // NTZ wall-clock == UTC instant, enforced IN THE EXPRESSION: a bare
      // cast interprets the wall-clock in whatever session zone holds at
      // EXECUTION time (a conf pin at load time doesn't survive a later
      // session-zone change before the plan runs). Both types carry the same
      // µs-since-epoch long under this contract, so the native kernel
      // (functions.NtzAsUtcInstant) reinterprets the physical value as a UTC
      // instant — zone-independent by construction, zero per-row cost.
      case TimestampNTZType =>
        graft.functions.GraftFunctions.ntzUtc(spark, col("ts"))
      case TimestampType    => col("ts")
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other in $sfDir/events.parquet — " +
          "extend Tables.events (expected int64 nanos, TIMESTAMP_NTZ, or TIMESTAMP)")
    }
    raw.withColumn("ts", tsNorm)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"))
  }
}
