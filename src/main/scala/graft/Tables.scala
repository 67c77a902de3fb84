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

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to map to its
    * microsecond TimestampType. Read the raw int64 nanos (legacy conf, set at
    * runtime so it works under any driver-built session) and truncate to micros
    * — the same truncation DuckDB applies when it reads NANOS into its µs
    * timestamps, so oracle comparisons agree. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{col, expr}
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"))
  }
}
