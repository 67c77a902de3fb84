package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Join strategies for skewed data (SURVEY §2 B11 and §4).
  *
  * AQE's skew-join splitting (on in GraftConf) is the default defense. Explicit
  * salting is the manual fallback for the case AQE can't fix: a single hot key
  * whose rows must still meet every row of the dim side. Salting fans the hot
  * key's fact rows across `saltFactor` sub-keys and replicates the (small) dim
  * side once per sub-key — turning one straggler task into `saltFactor`
  * balanced tasks. The join RESULT is identical to the unsalted join, which is
  * exactly what the oracle checks.
  */
object Joins {

  /** Salted inner equi-join: `fact ⋈ dim ON fact(factKey) = dim(dimKey)`.
    * `dim` is replicated ×saltFactor, so it must be the small side. The salt is
    * derived from a uniformly-distributing hash of the fact row id — any value
    * works; it only controls task placement, never the result. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
    saltFactor: Int): DataFrame = {
    val salted = fact.withColumn("__graft_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor.toLong)).cast("int"))
    val expandedDim = dim.crossJoin(
      dim.sparkSession.range(0, saltFactor).select(col("id").cast("int").as("__graft_salt_d")))
    salted.join(expandedDim,
        salted(factKey) === expandedDim(dimKey) &&
        salted("__graft_salt") === expandedDim("__graft_salt_d"))
      .drop("__graft_salt", "__graft_salt_d")
  }

  /** B11b — salted join demo query: same aggregate as a plain join would give
    * (the oracle proves salting is result-invariant). */
  def qSaltedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val l = Tables.load(spark, sfDir, "lineitem")
    val o = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"))
    saltedJoin(l, o, "l_orderkey", "o_orderkey", 8)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"))
      .orderBy(col("o_orderstatus"))
  }

  val qSaltedJoinSql: String =
    """SELECT o_orderstatus, COUNT(*) AS n_rows,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_salted_join" -> (qSaltedJoin _))

  val oracles: Map[String, String] = Map(
    "q_salted_join" -> qSaltedJoinSql)
}
