package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.edfs.{GraftCatalog, HashPartition}
import graft.operators.Pmr

/** JSON document storage backend for the catalog — the analog of the
  * reference's second EDFS backend (Firebase realtime DB stores blocks as JSON
  * documents; proj-firebase-flask.py:371 firebase_put). Same catalog API, same
  * partition pruning; only the leaf file format changes. Parquet remains the
  * 100 TB default (columnar, predicate pushdown); JSON is the interchange path.
  */
object JsonBackend {

  /** A-json — ingest into a JSON-backed catalog table and read it back
    * losslessly (schema re-asserted on read since JSON infers widened types). */
  def edfsPutJson(spark: SparkSession, sfDir: String): DataFrame = {
    val cat = new GraftCatalog(spark, Pmr.catalogRoot(sfDir), format = "json")
    cat.put(Tables.load(spark, sfDir, "nation"),
      "warehouse/nation_json", HashPartition("n_regionkey"))
    cat.cat("warehouse/nation_json")
      .select(col("n_nationkey").cast("int"), col("n_name"),
        col("n_regionkey").cast("int"))
      .orderBy(col("n_nationkey"))
  }

  val edfsPutJsonSql: String =
    """SELECT n_nationkey, n_name, n_regionkey
      |FROM nation ORDER BY n_nationkey""".stripMargin

  /** A-orc — same catalog, ORC leaf files: the other columnar format large
    * Hive estates standardize on. Identical pruning/pushdown path through
    * Spark's native ORC reader; the oracle is storage-format-independent
    * (read-back equals the source table). */
  def edfsPutOrc(spark: SparkSession, sfDir: String): DataFrame = {
    val cat = new GraftCatalog(spark, Pmr.catalogRoot(sfDir), format = "orc")
    cat.put(Tables.load(spark, sfDir, "region"),
      "warehouse/region_orc", HashPartition("r_regionkey"))
    cat.cat("warehouse/region_orc")
      .select(col("r_regionkey").cast("int"), col("r_name"))
      .orderBy(col("r_regionkey"))
  }

  val edfsPutOrcSql: String =
    """SELECT r_regionkey, r_name
      |FROM region ORDER BY r_regionkey""".stripMargin

  /** A-csv — CSV leaf files: the reference's actual interchange format (its
    * put ingests CSVs, combined_flask.py:324). CSV is not self-describing, so
    * reads are typed by the sidecar schema (the namenode-metadata analog
    * doing real work) rather than all-strings inference; headers are written
    * and skipped on read. Positional format — schema-evolving appends are a
    * parquet/orc feature, not a CSV one. */
  def edfsPutCsv(spark: SparkSession, sfDir: String): DataFrame = {
    val cat = new GraftCatalog(spark, Pmr.catalogRoot(sfDir), format = "csv")
    cat.put(Tables.load(spark, sfDir, "supplier"),
      "warehouse/supplier_csv", HashPartition("s_nationkey"))
    cat.cat("warehouse/supplier_csv")
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey").cast("int"),
        col("s_acctbal"))
      .orderBy(col("s_suppkey"))
  }

  val edfsPutCsvSql: String =
    """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
      |FROM supplier ORDER BY s_suppkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "edfs_put_json" -> (edfsPutJson _),
    "edfs_put_orc" -> (edfsPutOrc _),
    "edfs_put_csv" -> (edfsPutCsv _))

  val oracles: Map[String, String] = Map(
    "edfs_put_json" -> edfsPutJsonSql,
    "edfs_put_orc" -> edfsPutOrcSql,
    "edfs_put_csv" -> edfsPutCsvSql)
}
