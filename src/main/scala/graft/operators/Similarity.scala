package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Similarity search over the `embeddings` table (SURVEY §2 C6-C7).
  *
  * The probe vector is broadcast (a 64-float literal-sized side), so both
  * variants are single-scan, shuffle-free up to the final top-k, which Spark
  * executes as per-partition top-k + driver merge of k·partitions rows
  * (TakeOrderedAndProject) — no full sort, no collect of the data.
  *
  * Dot products use `zip_with` + a sequential `aggregate` fold in DOUBLE, which
  * both Spark and DuckDB evaluate left-to-right — cosine scores are
  * bit-identical across engines, making even float math oracle-checkable.
  */
object Similarity {

  private def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  private def dotSeq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, z) => acc + z)

  private def norm(v: Column): Column =
    sqrt(aggregate(transform(v, x => x * x), lit(0.0), (acc, z) => acc + z))

  /** C6 — brute-force cosine top-k vs the probe vector (vec_id 0): the exact
    * baseline every ANN variant is judged against. */
  def simTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val probe = e.filter(col("vec_id") === 0).select(col("v").as("p"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"),
        graft.functions.GraftFunctions.cosine(spark, col("v"), col("p")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10)
      .select(col("vec_id"), round(col("sim"), 6).as("sim_r"))
  }

  /** DuckDB oracle with explicit sequential double math (list_reduce folds
    * left-to-right like Spark's aggregate). */
  val simTopkSql: String =
    """WITH e AS (
      | SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      | FROM embeddings),
      |p AS (SELECT v AS pv FROM e WHERE vec_id = 0),
      |sims AS (
      | SELECT vec_id,
      |  list_reduce(list_transform(range(1, 65), i -> v[i] * pv[i]), (a, b) -> a + b)
      |   / (sqrt(list_reduce(list_transform(range(1, 65), i -> v[i] * v[i]), (a, b) -> a + b))
      |      * sqrt(list_reduce(list_transform(range(1, 65), i -> pv[i] * pv[i]), (a, b) -> a + b))) AS sim
      | FROM e, p WHERE vec_id <> 0)
      |SELECT vec_id, ROUND(sim, 6) AS sim_r FROM sims
      |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin

  /** C7 — LSH-bucketed ANN: 8 deterministic hyperplanes give a 256-bucket sign
    * key; the probe searches its own bucket plus all Hamming-1 neighbors (9 of
    * 256 buckets ≈ 3.5% of the data at scale). Recall vs C6 is asserted in
    * SimilaritySpec. At 100 TB the bucket key doubles as the layout partition
    * key, so a probe is a partition-pruned scan. */
  def simAnn(spark: SparkSession, sfDir: String): DataFrame = {
    val planes = Dedup.hyperplanes(8, 64)
    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val bucket = planes.zipWithIndex.map { case (p, i) =>
      when(aggregate(zip_with(col("v"), lit(p), (a, b) => a * b), lit(0.0),
        (acc, z) => acc + z) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
    val withBucket = e.select(col("vec_id"), col("v"), bucket.as("bucket"))
    val probe = withBucket.filter(col("vec_id") === 0)
      .select(col("v").as("p"), col("bucket").as("pbucket"))
    val nearBuckets = udfFreeNeighborSet(col("pbucket"))
    withBucket.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .filter(array_contains(nearBuckets, col("bucket")))
      .select(col("vec_id"), col("bucket"),
        graft.functions.GraftFunctions.cosine(spark, col("v"), col("p")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10)
      .select(col("vec_id"), col("bucket"), round(col("sim"), 6).as("sim_r"))
  }

  /** The probe bucket and its 8 Hamming-1 neighbors, as a column expression
    * (no UDF — stays in codegen). */
  private def udfFreeNeighborSet(pbucket: Column): Column =
    array(pbucket +: (0 until 8).map(i => pbucket.bitwiseXOR(lit(1 << i))): _*)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_topk" -> (simTopk _),
    "sim_ann" -> (simAnn _))

  val oracles: Map[String, String] = Map(
    "sim_topk" -> simTopkSql)
}
